"""Fused Pallas CN time-loop kernel for the barrier scenario sweep.

The XLA path (``stepper.cn_solve`` under ``vmap``) materialises the value
grid to HBM between the ~20 fused stages of every time step. This kernel
keeps the whole march in VMEM: one pallas program owns a block of TB
trades (lanes) x N nodes (sublanes) and runs all ``n_steps`` CN steps —
rhs build, closed-form constant-diagonal Thomas via two Hillis-Steele
affine scans, Dirichlet boundaries, and the KO monitor projection — with
zero HBM round-trips inside the loop.

Scope (the batched sweep workload of ``batch.price_barrier_batch``):
uniform dt per trade, Rannacher theta=1 on the first ``rannacher_steps``,
European exercise, no discrete dividends. The forward/backward solver
coefficients depend only on (theta, trade), so both theta-sets are
precomputed outside the kernel as (2, N, B) tensors — no transcendentals
inside the loop.

Numerical note: identical math to ``ops.tridiag.thomas_solve_const`` +
``stepper.cn_solve``; cross-checked in tests (interpret mode on CPU f64)
and against the XLA path on TPU (2e-5 rel in f32).

Measured on the single v5e-class chip (1024x512 grids, batch 1024, f32,
price-only). "kernel-only" nets out the ~26 ms tunnel materialization
floor by repeating 10 sigma-perturbed solves inside one jit:

    XLA cn_solve (default scan)        76.3 ms kernel-only -> 13.4k grids/s
    Pallas Hillis-Steele (this, TB=128) ~108 ms             ->  7.6k
    XLA with hoisted solver tensors    ~183 ms  (per-step gathers dominate)
    Pallas SPIKE (below, P=8)          22.0 ms kernel-only -> 46.7k grids/s

The Hillis-Steele variant loses to XLA (its O(N log N) roll passes cost
more than HBM round-trips save) and is kept as a tested stepping stone;
the SPIKE variant below is the production TPU-f32 path — 3.5x the XLA
scan (price_barrier_batch routes to it via solver='auto').
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solver_vectors(a_l, a_c, a_u, n_int: int, dtype):
    """Closed-form constant-diagonal Thomas vectors over the interior rows.

    a_l, a_c, a_u: (B,) per-trade constant diagonals. Returns w (n_int, B)
    with w_i = 1/D_i (tridiag.thomas_solve_const math).
    """
    disc = a_c * a_c - 4.0 * a_l * a_u
    sq = jnp.sqrt(disc)
    l1 = 0.5 * (a_c + jnp.sign(a_c) * sq)
    rho = (a_l * a_u) / (l1 * l1)

    i = jnp.arange(n_int, dtype=dtype)[:, None]
    k = i + 1.0
    mag = jnp.abs(rho)[None, :] ** k
    odd = jnp.mod(k, 2.0) > 0.5
    sgn = jnp.where(odd, jnp.sign(rho)[None, :], 1.0)
    rp1 = sgn * mag
    rp2 = rho[None, :] * rp1
    denom = l1[None, :] * (1.0 - rp2) / (1.0 - rp1)
    return 1.0 / denom  # (n_int, B)


def _kernel(
    # per-trade rows (1, TB)
    strike_ref, is_call_ref, r_ref, growth_rate_ref,
    b_l_sets_ref, b_c_sets_ref, b_u_sets_ref,  # (2, TB) explicit coeffs
    a_l_sets_ref, a_u_sets_ref,                # (2, TB) implicit off-diagonals
    rebate_ref, rebate_at_hit_ref, rebate_rate_ref,
    s_min_ref, s_max_ref,
    # (2, N, TB) solver tensors
    w_sets_ref, alpha_fwd_sets_ref, alpha_bwd_sets_ref,
    # (N, TB)
    v0_ref, out_mask_ref,
    # (n_steps, TB)
    tau_next_ref, monitor_ref,
    # output (N, TB)
    v_out_ref,
    *, n_steps: int, rannacher_steps: int, n_nodes: int,
):
    N = n_nodes
    row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    is_interior = (row >= 1) & (row <= N - 2)
    is_row0 = row == 0
    is_rowN = row == N - 1
    is_row1 = row == 1
    is_rowN2 = row == N - 2

    out_mask = out_mask_ref[:] != 0.0

    n_stages = max(1, (N - 1).bit_length())

    def affine_scan(alpha, beta, reverse: bool):
        """y_i = alpha_i y_{i-s} + beta_i prefix via Hillis-Steele."""
        A, B = alpha, beta
        for st in range(n_stages):
            s = 1 << st
            if s >= N:
                break
            if not reverse:
                A_sh = pltpu.roll(A, np.int32(s), 0)
                B_sh = pltpu.roll(B, np.int32(s), 0)
                pad = row < s
            else:
                A_sh = pltpu.roll(A, np.int32(N - s), 0)
                B_sh = pltpu.roll(B, np.int32(N - s), 0)
                pad = row >= N - s
            A_sh = jnp.where(pad, 0.0, A_sh)
            B_sh = jnp.where(pad, 0.0, B_sh)
            B = A * B_sh + B
            A = A * A_sh
        return B

    def step(k, v):
        rann = k < rannacher_steps
        idx = jnp.where(rann, 0, 1)
        b_l = b_l_sets_ref[idx, :][None, :]
        b_c = b_c_sets_ref[idx, :][None, :]
        b_u = b_u_sets_ref[idx, :][None, :]
        a_l = a_l_sets_ref[idx, :][None, :]
        a_u = a_u_sets_ref[idx, :][None, :]
        w = w_sets_ref[idx]
        alpha_fwd = alpha_fwd_sets_ref[idx]
        alpha_bwd = alpha_bwd_sets_ref[idx]

        tau = tau_next_ref[k, :][None, :]
        is_call = is_call_ref[:] != 0.0
        growth = jnp.exp(growth_rate_ref[:] * tau)
        disc = jnp.exp(-r_ref[:] * tau)
        v_max_call = s_max_ref[:] * growth - strike_ref[:] * disc
        v_min_put = strike_ref[:] * disc - s_min_ref[:] * growth
        v_min = jnp.where(is_call, 0.0, v_min_put)
        v_max = jnp.where(is_call, v_max_call, 0.0)

        v_up = pltpu.roll(v, np.int32(N - 1), 0)  # v[i+1] (circular; boundary rows fixed below)
        v_dn = pltpu.roll(v, np.int32(1), 0)    # v[i-1]
        rhs = b_l * v_dn + b_c * v + b_u * v_up
        rhs = rhs - jnp.where(is_row1, a_l * v_min, 0.0)
        rhs = rhs - jnp.where(is_rowN2, a_u * v_max, 0.0)
        rhs = jnp.where(is_interior, rhs, 0.0)

        # forward sweep: d'_i = alpha_fwd_i d'_{i-1} + w_i rhs_i
        d_prime = affine_scan(alpha_fwd, w * rhs, reverse=False)
        # backward sweep: x_i = alpha_bwd_i x_{i+1} + d'_i
        x = affine_scan(alpha_bwd, d_prime, reverse=True)

        v_new = jnp.where(is_row0, v_min, jnp.where(is_rowN, v_max, x))

        mon = monitor_ref[k, :][None, :] != 0.0
        rebate_pv = jnp.where(
            rebate_at_hit_ref[:] != 0.0,
            rebate_ref[:],
            rebate_ref[:] * jnp.exp(-rebate_rate_ref[:] * tau),
        )
        v_new = jnp.where(mon & out_mask, rebate_pv, v_new)
        return v_new

    v_out_ref[:] = jax.lax.fori_loop(0, n_steps, step, v0_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("n_nodes", "n_steps", "rannacher_steps", "trade_block", "interpret"),
)
def cn_barrier_solve_pallas(
    batch,
    sigma,
    n_nodes: int,
    n_steps: int,
    rannacher_steps: int = 2,
    trade_block: int = 128,
    interpret: bool = False,
):
    """Fused solve of a BarrierTradeBatch: returns (V, s_nodes), both (B, N).

    ``sigma`` may be the batch's sigma or a bumped copy (vega). Assumes the
    batched-sweep schedule family (uniform dt; theta encoded by step index;
    monitor flags from the schedule; no dividends; European exercise).
    """
    dtype = jnp.asarray(batch.x_min).dtype
    B = batch.x_min.shape[0]
    N = n_nodes
    TB = min(trade_block, B)
    if B % TB != 0:
        raise ValueError(f"batch size {B} not divisible by trade block {TB}")

    x_min = jnp.asarray(batch.x_min)
    dx = jnp.asarray(batch.dx)
    sigma = jnp.asarray(sigma, dtype)
    r = jnp.asarray(batch.r, dtype)
    b = jnp.asarray(batch.b, dtype)
    q = jnp.asarray(batch.q, dtype)
    dt = jnp.asarray(batch.dt[:, 0], dtype)  # uniform per trade

    i = jnp.arange(N, dtype=dtype)
    x = x_min[:, None] + i[None, :] * dx[:, None]
    s = jnp.exp(x)  # (B, N)
    s_min = s[:, 0]
    s_max = s[:, -1]

    payoff = jnp.where(
        jnp.asarray(batch.is_call)[:, None],
        jnp.maximum(s - jnp.asarray(batch.strike, dtype)[:, None], 0.0),
        jnp.maximum(jnp.asarray(batch.strike, dtype)[:, None] - s, 0.0),
    )

    sig2 = sigma * sigma
    mu_x = (b - q) - 0.5 * sig2
    alpha_c = 0.5 * sig2 / (dx * dx)
    beta_adv = mu_x / (2.0 * dx)
    a_coef = alpha_c - beta_adv
    c_coef = alpha_c + beta_adv
    b_coef = -2.0 * alpha_c - r

    n_int = N - 2
    sets = {"w": [], "af": [], "ab": [], "bl": [], "bc": [], "bu": [], "al": [], "au": []}
    row_full = jnp.arange(N)
    for theta in (1.0, 0.5):
        a_l = -theta * dt * a_coef
        a_c_diag = 1.0 - theta * dt * b_coef
        a_u = -theta * dt * c_coef
        w_int = _solver_vectors(a_l, a_c_diag, a_u, n_int, dtype)  # (n_int, B)
        w_full = jnp.zeros((N, B), dtype).at[1 : N - 1].set(w_int)
        alpha_fwd = -a_l[None, :] * w_full
        alpha_fwd = jnp.where(
            (row_full[:, None] <= 1) | (row_full[:, None] >= N - 1), 0.0, alpha_fwd
        )
        c_prime = a_u[None, :] * w_full
        alpha_bwd = -c_prime
        alpha_bwd = jnp.where(
            (row_full[:, None] == 0) | (row_full[:, None] >= N - 2), 0.0, alpha_bwd
        )
        sets["w"].append(w_full)
        sets["af"].append(alpha_fwd)
        sets["ab"].append(alpha_bwd)
        sets["bl"].append((1.0 - theta) * dt * a_coef)
        sets["bc"].append(1.0 + (1.0 - theta) * dt * b_coef)
        sets["bu"].append((1.0 - theta) * dt * c_coef)
        sets["al"].append(a_l)
        sets["au"].append(a_u)

    # (2, N, B) and (2, B) stacks, transposed so lanes = trades
    w_sets = jnp.stack(sets["w"])
    af_sets = jnp.stack(sets["af"])
    ab_sets = jnp.stack(sets["ab"])
    bl_sets = jnp.stack(sets["bl"])
    bc_sets = jnp.stack(sets["bc"])
    bu_sets = jnp.stack(sets["bu"])
    al_sets = jnp.stack(sets["al"])
    au_sets = jnp.stack(sets["au"])

    out_mask = (
        (jnp.asarray(batch.has_lower)[:, None] & (s <= jnp.asarray(batch.lower, dtype)[:, None]))
        | (jnp.asarray(batch.has_upper)[:, None] & (s >= jnp.asarray(batch.upper, dtype)[:, None]))
    ).astype(dtype)

    row1 = lambda a: jnp.asarray(a, dtype)[None, :]  # (1, B)
    kernel = functools.partial(
        _kernel, n_steps=n_steps, rannacher_steps=rannacher_steps, n_nodes=N
    )

    trade_spec = lambda: pl.BlockSpec((1, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)
    set_spec = lambda: pl.BlockSpec((2, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)
    field_spec = lambda: pl.BlockSpec((2, N, TB), lambda j: (_Z, _Z, j), memory_space=pltpu.VMEM)
    grid_spec = lambda: pl.BlockSpec((N, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)
    sched_spec = lambda: pl.BlockSpec((n_steps, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)

    v = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        # trade blocks are independent: on megacore parts (v5p+) the grid
        # dimension splits across TensorCores; no-op on single-core v5e
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            trade_spec(),  # strike
            trade_spec(),  # is_call
            trade_spec(),  # r
            trade_spec(),  # growth rate (b - q - r)
            set_spec(), set_spec(), set_spec(),  # b_l, b_c, b_u
            set_spec(), set_spec(),              # a_l, a_u
            trade_spec(), trade_spec(), trade_spec(),  # rebate, at_hit, rate
            trade_spec(), trade_spec(),  # s_min, s_max
            field_spec(), field_spec(), field_spec(),  # w, alpha_fwd, alpha_bwd
            grid_spec(), grid_spec(),  # v0, out_mask
            sched_spec(), sched_spec(),  # tau_next, monitor
        ],
        out_specs=grid_spec(),
        out_shape=jax.ShapeDtypeStruct((N, B), dtype),
        interpret=interpret,
    )(
        row1(batch.strike),
        row1(jnp.asarray(batch.is_call).astype(dtype)),
        row1(r),
        row1(b - q - r),
        bl_sets, bc_sets, bu_sets,
        al_sets, au_sets,
        row1(batch.rebate),
        row1(jnp.asarray(batch.rebate_at_hit).astype(dtype)),
        row1(batch.rebate_rate),
        row1(s_min), row1(s_max),
        w_sets, af_sets, ab_sets,
        payoff.T, out_mask.T,
        jnp.asarray(batch.tau_next, dtype).T,
        jnp.asarray(batch.monitor).astype(dtype).T,
    )
    return v.T, s  # (B, N) each


@functools.partial(
    jax.jit, static_argnames=("n_nodes", "n_steps", "rannacher_steps")
)
def cn_barrier_solve_hoisted(
    batch, sigma, n_nodes: int, n_steps: int, rannacher_steps: int = 2
):
    """XLA twin of the Pallas kernel: same hoisted two-theta solver vectors,
    ``lax.scan`` + ``associative_scan`` instead of an in-VMEM program.

    Removes the per-step closed-form denominator transcendentals that
    ``cn_solve`` recomputes inside its scan. Same restricted schedule family
    as the Pallas path (uniform dt, no dividends, European)."""
    from jax import lax

    dtype = jnp.asarray(batch.x_min).dtype
    B = batch.x_min.shape[0]
    N = n_nodes

    x_min = jnp.asarray(batch.x_min)
    dx = jnp.asarray(batch.dx)
    sigma = jnp.asarray(sigma, dtype)
    r = jnp.asarray(batch.r, dtype)
    b = jnp.asarray(batch.b, dtype)
    q = jnp.asarray(batch.q, dtype)
    dt = jnp.asarray(batch.dt[:, 0], dtype)

    i = jnp.arange(N, dtype=dtype)
    s = jnp.exp(x_min[:, None] + i[None, :] * dx[:, None])  # (B, N)
    s_min, s_max = s[:, 0], s[:, -1]
    strike = jnp.asarray(batch.strike, dtype)
    is_call = jnp.asarray(batch.is_call)

    payoff = jnp.where(
        is_call[:, None],
        jnp.maximum(s - strike[:, None], 0.0),
        jnp.maximum(strike[:, None] - s, 0.0),
    )

    sig2 = sigma * sigma
    mu_x = (b - q) - 0.5 * sig2
    alpha_c = 0.5 * sig2 / (dx * dx)
    beta_adv = mu_x / (2.0 * dx)
    a_coef = alpha_c - beta_adv
    c_coef = alpha_c + beta_adv
    b_coef = -2.0 * alpha_c - r

    n_int = N - 2
    col = jnp.arange(N)[None, :]
    sets = []
    for theta in (1.0, 0.5):
        a_l = -theta * dt * a_coef
        a_c_diag = 1.0 - theta * dt * b_coef
        a_u = -theta * dt * c_coef
        w_int = _solver_vectors(a_l, a_c_diag, a_u, n_int, dtype).T  # (B, n_int)
        w_full = jnp.zeros((B, N), dtype).at[:, 1 : N - 1].set(w_int)
        alpha_fwd = jnp.where((col <= 1) | (col >= N - 1), 0.0, -a_l[:, None] * w_full)
        alpha_bwd = jnp.where(
            (col == 0) | (col >= N - 2), 0.0, -(a_u[:, None] * w_full)
        )
        sets.append(
            dict(
                w=w_full, af=alpha_fwd, ab=alpha_bwd,
                bl=(1.0 - theta) * dt * a_coef,
                bc=1.0 + (1.0 - theta) * dt * b_coef,
                bu=(1.0 - theta) * dt * c_coef,
                al=a_l, au=a_u,
            )
        )
    stacked = {k: jnp.stack([sets[0][k], sets[1][k]]) for k in sets[0]}

    out_mask = (
        jnp.asarray(batch.has_lower)[:, None]
        & (s <= jnp.asarray(batch.lower, dtype)[:, None])
    ) | (
        jnp.asarray(batch.has_upper)[:, None]
        & (s >= jnp.asarray(batch.upper, dtype)[:, None])
    )
    rebate = jnp.asarray(batch.rebate, dtype)
    rebate_at_hit = jnp.asarray(batch.rebate_at_hit)
    rebate_rate = jnp.asarray(batch.rebate_rate, dtype)
    growth_rate = b - q - r

    is_interior = ((col >= 1) & (col <= N - 2))[0]
    row1_mask = (col == 1)[0]
    rowN2_mask = (col == N - 2)[0]

    def comb(l, rr):
        a_l_, b_l_ = l
        a_r_, b_r_ = rr
        return a_r_ * a_l_, a_r_ * b_l_ + b_r_

    def step(v, inputs):
        k, tau, mon = inputs
        idx = jnp.where(k < rannacher_steps, 0, 1)
        bl = stacked["bl"][idx][:, None]
        bc = stacked["bc"][idx][:, None]
        bu = stacked["bu"][idx][:, None]
        al = stacked["al"][idx][:, None]
        au = stacked["au"][idx][:, None]
        w = stacked["w"][idx]
        af = stacked["af"][idx]
        ab = stacked["ab"][idx]

        growth = jnp.exp(growth_rate * tau)
        disc = jnp.exp(-r * tau)
        v_min = jnp.where(is_call, 0.0, strike * disc - s_min * growth)
        v_max = jnp.where(is_call, s_max * growth - strike * disc, 0.0)

        rhs = bc * v
        rhs = rhs.at[:, 1:].add(bl[:, 0:1] * v[:, :-1])
        rhs = rhs.at[:, :-1].add(bu[:, 0:1] * v[:, 1:])
        rhs = rhs - jnp.where(row1_mask[None, :], al * v_min[:, None], 0.0)
        rhs = rhs - jnp.where(rowN2_mask[None, :], au * v_max[:, None], 0.0)
        rhs = jnp.where(is_interior[None, :], rhs, 0.0)

        _, d_prime = lax.associative_scan(comb, (af, w * rhs), axis=1)
        _, x_sol = lax.associative_scan(comb, (ab, d_prime), axis=1, reverse=True)

        v_new = jnp.where(
            (col == 0), v_min[:, None], jnp.where((col == N - 1), v_max[:, None], x_sol)
        )
        rebate_pv = jnp.where(rebate_at_hit, rebate, rebate * jnp.exp(-rebate_rate * tau))
        v_new = jnp.where(mon[:, None] & out_mask, rebate_pv[:, None], v_new)
        return v_new, None

    ks = jnp.arange(n_steps)
    taus = jnp.asarray(batch.tau_next, dtype).T  # (n_steps, B)
    mons = jnp.asarray(batch.monitor).T
    v_final, _ = lax.scan(step, payoff, (ks, taus, mons))
    return v_final, s


# --------------------------------------------------------------------------- #
# SPIKE (partitioned Thomas) variant                                           #
# --------------------------------------------------------------------------- #
# The Hillis-Steele kernel above does O(N log N) work per step in ~20
# full-(N, TB) roll passes; measured slower than XLA (module docstring).
# This variant partitions the interior rows into P=8 chunks held on the
# VPU's 8 SUBLANES and runs O(N) sequential Thomas chains at full vector
# width: each chain iteration is ONE (P, TB) FMA covering all chunks of
# all lane-trades. Cross-chunk coupling is the SPIKE reduced system —
# 2P=16 interface unknowns whose (constant!) matrix inverse is
# precomputed per trade per theta-set, so the per-step reduced solve is a
# static 16x16 matvec. A chip micro-benchmark measured the marginal cost
# of dependent (8,128) FMA chains at <7 cycles/iteration (the earlier
# ~3000-cycle reading was the ~26 ms tunnel dispatch floor), which is
# what makes the chain approach viable.
#
# Memory layout: interior rows live TRANSPOSED, r = ii*P + j (ii =
# in-chunk row, j = chunk). Then the in-chunk neighbor (ii+-1, j) is a
# roll by +-P on the row axis, the ii=0 / ii=m-1 bands needing
# cross-chunk values are single (P, TB) tile fixups, and a chain
# iteration is the static row-slice [ii*P:(ii+1)*P] — exactly one
# (8, TB) register. The last chunk carries the pad rows (identity
# equations, value pinned 0), so the global-last row's in-chunk upper
# neighbor is always a zero pad and the boundary coupling is folded into
# the RHS exactly like the scan path.

P_CHUNKS = 8

# BlockSpec index-map constant: a bare python 0 becomes an i64 under x64
# sessions, which Mosaic fails to legalize (func.return (i64, i32)); a
# strongly-typed i32 zero works in both modes.
_Z = np.int32(0)


def _per_row_thomas(l, c, u):
    """(w, af, ab) for per-row tridiagonal chunks; all (m, P, B)."""

    def fwd(carry, inputs):
        w_prev, u_prev = carry
        l_i, c_i, u_i = inputs
        d = c_i - l_i * u_prev * w_prev
        w_i = 1.0 / d
        return (w_i, u_i), w_i

    init = (jnp.zeros_like(l[0]), jnp.zeros_like(l[0]))
    _, w = jax.lax.scan(fwd, init, (l, c, u))
    return w, -l * w, -u * w


def _chunk_solve(w, af, ab, rhs):
    """Solve the per-chunk tridiagonals for (m, P, B) rhs via two scans."""

    def fwd(d_prev, inputs):
        w_i, af_i, r_i = inputs
        d = w_i * r_i + af_i * d_prev
        return d, d

    _, dp = jax.lax.scan(fwd, jnp.zeros_like(rhs[0]), (w, af, rhs))

    def bwd(x_next, inputs):
        dp_i, ab_i = inputs
        x = dp_i + ab_i * x_next
        return x, x

    _, y = jax.lax.scan(
        bwd, jnp.zeros_like(rhs[0]), (dp, ab), reverse=True
    )
    return y


def _build_solver_set(
    theta, dt, a_coef, b_coef, c_coef, has_l, has_u, real,
    m: int, P: int, n_pad: int, dtype,
):
    """One (theta, dt-column) SPIKE solver-tensor set: per-chunk Thomas
    vectors, spike coupling vectors, the precomputed 2Px2P reduced-system
    inverse, and the explicit/implicit CN coefficients. Shared by the f32
    kernel host and the df64 rung host (which calls it at f64)."""
    B = dt.shape[0]
    a_l = -theta * dt * a_coef
    a_c_diag = 1.0 - theta * dt * b_coef
    a_u = -theta * dt * c_coef
    l = jnp.where(has_l, a_l[None, None, :], 0.0)    # (m, P, B)
    c = jnp.where(real, a_c_diag[None, None, :], 1.0)
    u = jnp.where(has_u, a_u[None, None, :], 0.0)
    w, af, ab = _per_row_thomas(l, c, u)
    # spike vectors: vsp_j = a_l * A_j^{-1} e_0 (coupling to
    # b_{j-1}), wsp_j = a_u * A_j^{-1} e_{m-1} (coupling to t_{j+1});
    # chunk 0 has no left coupling, chunk P-1 no right coupling
    e0 = jnp.zeros((m, P, B), dtype).at[0].set(1.0)
    em = jnp.zeros((m, P, B), dtype).at[m - 1].set(1.0)
    vsp = a_l[None, None, :] * _chunk_solve(w, af, ab, e0)
    vsp = vsp.at[:, 0, :].set(0.0)
    wsp = a_u[None, None, :] * _chunk_solve(w, af, ab, em)
    wsp = wsp.at[:, P - 1, :].set(0.0)
    # reduced interface system R u = ytips in block ordering
    # (u = [t_0..t_{P-1}, b_0..b_{P-1}], ytips = [y_j[0], y_j[m-1]]):
    #   t_j + vsp_j[0]   b_{j-1} + wsp_j[0]   t_{j+1} = y_j[0]
    #   b_j + vsp_j[m-1] b_{j-1} + wsp_j[m-1] t_{j+1} = y_j[m-1]
    eye2p = jnp.eye(2 * P, dtype=dtype)
    R = jnp.tile(eye2p[None], (B, 1, 1))
    for j in range(1, P):
        R = R.at[:, j, P + j - 1].set(vsp[0, j])
        R = R.at[:, P + j, P + j - 1].set(vsp[m - 1, j])
    for j in range(P - 1):
        R = R.at[:, j, j + 1].set(wsp[0, j])
        R = R.at[:, P + j, j + 1].set(wsp[m - 1, j])
    if jnp.dtype(dtype) == jnp.float64:
        # TPU's LuDecomposition expander is f32-only, so a straight
        # jnp.linalg.inv(R) fails to compile at f64 on device. Start from
        # the f32 LU inverse and Newton-refine in (x64-emulated) f64:
        # X <- X(2I - RX) squares the residual, so three steps take the
        # ~1e-7 f32 seed to f64 machine precision (R is near-identity —
        # unit diagonal plus small spike couplings — so the iteration is
        # safely convergent; parity vs the scan is pinned in
        # test_pallas_kernel.py::TestDf64Spike).
        x = jnp.linalg.inv(R.astype(jnp.float32)).astype(dtype)
        eye2 = 2.0 * jnp.eye(2 * P, dtype=dtype)
        for _ in range(3):
            rx = jnp.einsum("bij,bjk->bik", R, x)
            x = jnp.einsum("bij,bjk->bik", x, eye2[None] - rx)
        rinv = x
    else:
        rinv = jnp.linalg.inv(R)
    return {
        "rinv": rinv.transpose(1, 2, 0),
        "w": w.reshape(n_pad, B),
        "af": af.reshape(n_pad, B),
        "ab": ab.reshape(n_pad, B),
        "vsp": vsp.reshape(n_pad, B),
        "wsp": wsp.reshape(n_pad, B),
        "bl": (1.0 - theta) * dt * a_coef,
        "bc": 1.0 + (1.0 - theta) * dt * b_coef,
        "bu": (1.0 - theta) * dt * c_coef,
        "al": a_l,
        "au": a_u,
        "dt": dt,
    }


def _kernel_spike(
    # per-trade rows (1, TB)
    strike_ref, is_call_ref, r_ref, growth_rate_ref,
    rebate_ref, rebate_at_hit_ref, rebate_rate_ref,
    s_min_ref, s_max_ref,
    omask_lo_ref, omask_hi_ref,
    # (1, TB) theta scalars — ONE theta set per pallas_call; the host
    # runs the Rannacher steps as a separate segment call
    bl_ref, bc_ref, bu_ref, al_ref, au_ref,
    # (n_pad, TB) solver row tensors (transposed layout)
    w_ref, af_ref, ab_ref, vsp_ref, wsp_ref,
    # (2P, 2P, TB) reduced-system inverse
    rinv_ref,
    # (n_pad, TB)
    v0_ref, out_mask_ref,
    # (2, TB) initial boundary values (payoff edges)
    edge0_ref,
    # (n_steps, TB)
    tau_next_ref, monitor_ref,
    # american=True only: dt_ref (1, TB), payoff_ref/lam0_ref (n_pad, TB)
    # inputs, then outputs v_out/edge_out/lam_out, then dp scratch;
    # american=False: outputs v_out/edge_out, then dp scratch
    *rest,
    n_steps: int, m: int, P: int, r_glast: int,
    american: bool = False, euro_put_lower: bool = True,
):
    if american:
        (dt_ref, payoff_ref, lam0_ref,
         v_out_ref, edge_out_ref, lam_out_ref, dp_ref) = rest
    else:
        v_out_ref, edge_out_ref, dp_ref = rest
    n_pad = m * P
    band = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    padslot = band == P - 1
    il = r_glast // P  # band holding the global-last interior row
    sl = lambda ii: slice(ii * P, (ii + 1) * P)

    out_mask = out_mask_ref[:] != 0.0
    is_call = is_call_ref[:] != 0.0
    at_hit = rebate_at_hit_ref[:] != 0.0
    omask_lo = omask_lo_ref[:] != 0.0
    omask_hi = omask_hi_ref[:] != 0.0

    v_out_ref[:] = v0_ref[:]
    if american:
        lam_out_ref[:] = lam0_ref[:]

    def step(k, carry):
        # one theta set per call: every solver-tensor access below is a
        # static slice, so the chain loops compile to pure dependent
        # (P, TB) FMAs with no per-iteration indexing math
        v_lo, v_hi = carry
        bl = bl_ref[:]
        bc = bc_ref[:]
        bu = bu_ref[:]
        al = al_ref[:]
        au = au_ref[:]

        tau = tau_next_ref[k][None, :]
        growth = jnp.exp(growth_rate_ref[:] * tau)
        disc = jnp.exp(-r_ref[:] * tau)
        # American pricer convention (fd_american_equity.py:474-478):
        # put lower boundary K e^{-r tau} without the S_min asymptote
        v_min_put = strike_ref[:] * disc
        if euro_put_lower:
            v_min_put = v_min_put - s_min_ref[:] * growth
        v_min_n = jnp.where(is_call, 0.0, v_min_put)
        v_max_n = jnp.where(
            is_call, s_max_ref[:] * growth - strike_ref[:] * disc, 0.0
        )

        # band-streamed rhs + forward chain: per band, the in-chunk
        # neighbors (ii +- 1, j) are just the previous/next band tiles,
        # so the explicit matvec fuses into the Thomas forward sweep with
        # no full-grid pass. Cross-chunk couplings appear only at the
        # first/last band (single-tile roll fixups); the global-last
        # row's boundary terms land in band il at slot j = P-1.
        first_band = v_out_ref[sl(0)]
        last_band = v_out_ref[sl(m - 1)]
        dn_fix = jnp.where(band == 0, v_lo, pltpu.roll(last_band, np.int32(1), 0))
        up_fix = pltpu.roll(first_band, np.int32(P - 1), 0)

        v_prev = dn_fix
        v_cur = first_band
        d = None
        for ii in range(m):
            v_next = v_out_ref[sl(ii + 1)] if ii < m - 1 else up_fix
            rhs = bc * v_cur + bl * v_prev + bu * v_next
            if american:
                # Ikonen-Toivanen source term (stepper.py:176); lam is 0
                # on pad rows so the pad equations stay untouched
                rhs = rhs + dt_ref[:] * lam_out_ref[sl(ii)]
            if ii == 0:
                # global row 0: implicit lower-boundary coupling
                rhs = rhs - jnp.where(band == 0, al * v_min_n, 0.0)
            if ii == il:
                # global-last row: explicit neighbor was a zero pad, add
                # the boundary term; implicit coupling moves to the rhs
                rhs = rhs + jnp.where(
                    padslot, bu * v_hi - au * v_max_n, 0.0
                )
            elif ii > il:
                rhs = jnp.where(padslot, 0.0, rhs)  # pad rows
            if ii == 0:
                d = w_ref[sl(0)] * rhs
            else:
                d = w_ref[sl(ii)] * rhs + af_ref[sl(ii)] * d
            dp_ref[sl(ii)] = d
            v_prev, v_cur = v_cur, v_next
        # backward chain: y_ii = d'_ii + ab*y_{ii+1}; dp becomes y
        y_bot = d                      # (P, TB) tips at ii = m-1
        x = d
        for ii in range(m - 2, -1, -1):
            x = dp_ref[sl(ii)] + ab_ref[sl(ii)] * x
            dp_ref[sl(ii)] = x
        y_top = x                      # (P, TB) tips at ii = 0

        # reduced 2P x 2P solve with the precomputed inverse. Block
        # ordering (u = [t_0..t_{P-1}, b_0..b_{P-1}], same for the rhs
        # tips) keeps every slice contiguous: P iterations of one
        # (2P, TB) FMA against a sublane-broadcast tip row.
        u = rinv_ref[:, 0] * y_top[0][None, :]
        u = u + rinv_ref[:, P] * y_bot[0][None, :]
        for j in range(1, P):
            u = u + rinv_ref[:, j] * y_top[j][None, :]
            u = u + rinv_ref[:, P + j] * y_bot[j][None, :]
        # bprev[j] = b_{j-1} (0 for j=0); tnext[j] = t_{j+1} (0 for P-1)
        bprev = jnp.where(band == 0, 0.0, pltpu.roll(u[P:], np.int32(1), 0))
        tnext = jnp.where(
            band == P - 1, 0.0, pltpu.roll(u[:P], np.int32(P - 1), 0)
        )                              # (P, TB) each

        # correction + KO projection, chunk-row at a time
        mon = monitor_ref[k][None, :] != 0.0
        rebate_pv = jnp.where(
            at_hit,
            rebate_ref[:],
            rebate_ref[:] * jnp.exp(-rebate_rate_ref[:] * tau),
        )
        for ii in range(m):
            xr = (
                dp_ref[sl(ii)]
                - bprev * vsp_ref[sl(ii)]
                - tnext * wsp_ref[sl(ii)]
            )
            if american:
                # v = max(payoff, tilde - dt*lam_old);
                # lam_new = max(0, lam_old + (payoff - tilde)/dt)
                # (stepper.py:182-187; pads: payoff=lam=tilde=0 -> 0)
                lam_old = lam_out_ref[sl(ii)]
                pay = payoff_ref[sl(ii)]
                dt_row = dt_ref[:]
                v_am = jnp.maximum(pay, xr - dt_row * lam_old)
                lam_out_ref[sl(ii)] = jnp.maximum(
                    lam_old + (pay - xr) / dt_row, 0.0
                )
                xr = v_am
            v_out_ref[sl(ii)] = jnp.where(
                mon & out_mask[sl(ii)], rebate_pv, xr
            )
        v_lo_new = jnp.where(mon & omask_lo, rebate_pv, v_min_n)
        v_hi_new = jnp.where(mon & omask_hi, rebate_pv, v_max_n)
        return (v_lo_new, v_hi_new)

    carry = (edge0_ref[0][None, :], edge0_ref[1][None, :])
    v_lo_f, v_hi_f = jax.lax.fori_loop(0, n_steps, step, carry)
    edge_out_ref[0] = v_lo_f[0]
    edge_out_ref[1] = v_hi_f[0]


def cn_barrier_solve_spike(
    batch,
    sigma,
    n_nodes: int,
    n_steps: int,
    rannacher_steps: int = 2,
    trade_block: int = 128,
    p_chunks: int = P_CHUNKS,
    interpret: bool = False,
    segments=None,
    set_defs=None,
    american: bool = False,
    div_steps=(),
    reset_steps=(),
    df64: bool = False,
):
    """Public entry: validates the segments=None contract on concrete
    schedules (inside the jit everything is traced and unverifiable),
    then runs :func:`_cn_barrier_solve_spike_jit` (or its df64 twin when
    ``df64=True`` — the on-chip <=1e-6 accuracy rung; requires x64 and
    returns f64). See those functions for the solver description."""
    if (
        (segments is None or set_defs is None)
        and not isinstance(batch.dt, jax.core.Tracer)
    ):
        # the default layout assumes globally-uniform dt with an
        # n_rann-step theta=1 prefix and no dividend/reset events;
        # silently applying it to a monitor-aligned or dividend batch
        # would price with dt[:, 0] everywhere and skip the jumps
        n_rann = min(rannacher_steps, n_steps)
        dt_np = np.asarray(batch.dt, dtype=float)
        th_np = np.asarray(batch.theta, dtype=float)
        expect_th = np.where(np.arange(n_steps) < n_rann, 1.0, 0.5)
        if not (
            np.all(dt_np[:, :n_steps] == dt_np[:, :1])
            and np.all(th_np[:, :n_steps] == expect_th[None, :])
            and not np.asarray(batch.div_amount).any()
        ):
            raise ValueError(
                "segments=None assumes globally-uniform dt with a "
                f"{n_rann}-step Rannacher prefix and no dividends; pass "
                "the host-derived (segments, set_defs, div_steps, "
                "reset_steps) from models.pde.batch._spike_schedule for "
                "piecewise-constant/dividend schedules"
            )
    impl = (
        _cn_barrier_solve_spike_df64_jit if df64
        else _cn_barrier_solve_spike_jit
    )
    if df64 and not jax.config.jax_enable_x64:
        raise ValueError(
            "df64=True needs x64 enabled (host-side prep runs in true "
            "f64 before splitting into double-float pairs)"
        )
    return impl(
        batch, sigma, n_nodes=n_nodes, n_steps=n_steps,
        rannacher_steps=rannacher_steps, trade_block=trade_block,
        p_chunks=p_chunks, interpret=interpret, segments=segments,
        set_defs=set_defs, american=american,
        div_steps=tuple(div_steps), reset_steps=tuple(reset_steps),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_nodes", "n_steps", "rannacher_steps", "trade_block",
        "p_chunks", "interpret", "segments", "set_defs", "american",
        "div_steps", "reset_steps",
    ),
)
def _cn_barrier_solve_spike_jit(
    batch,
    sigma,
    n_nodes: int,
    n_steps: int,
    rannacher_steps: int = 2,
    trade_block: int = 128,
    p_chunks: int = P_CHUNKS,
    interpret: bool = False,
    segments=None,
    set_defs=None,
    american: bool = False,
    div_steps=(),
    reset_steps=(),
):
    """SPIKE-partitioned fused CN solve: returns (V, s_nodes), both (B, N).

    Piecewise-constant schedule family (no dividends); same
    outputs as ``cn_barrier_solve_pallas``. ``american=True`` fuses the
    Ikonen-Toivanen early-exercise projection into the step (the lambda
    multiplier rides VMEM alongside the value grid and threads across
    pallas segments; lower put boundary switches to the American pricer's
    K e^{-r tau} convention, stepper.py:174-187 semantics). The implicit
    solve runs as P
    parallel Thomas chains on the sublanes plus a precomputed
    2P-interface SPIKE correction — O(N) work per step instead of the
    Hillis-Steele kernel's O(N log N), with chain LATENCY N/P serial
    FMAs. Each run of steps sharing one (theta, dt) pair runs as its own
    pallas segment so a call carries exactly one solver-tensor set in
    VMEM:

    - default (``segments=None``): globally uniform dt with the
      ``rannacher_steps``-step theta=1 prefix — two segments, the
      original schedule family.
    - ``segments``/``set_defs`` (static tuples, host-derived — see
      ``batch._spike_schedule``): ``set_defs`` is ``((theta, k_col),
      ...)`` — one solver-tensor set per unique (theta, dt-column)
      signature, dt read from ``batch.dt[:, k_col]``; ``segments`` is
      ``((k0, k1, set_idx), ...)`` step ranges covering [0, n_steps).
      This admits monitor-aligned layouts (per-interval dt,
      grid.monitor_aligned_schedule) without leaving the kernel.
    - ``div_steps``/``reset_steps`` (static, American only): discrete
      cash dividends ride BETWEEN pallas launches — after the segment
      ending at a ``div_steps`` index, the (B, N) grid is reassembled
      and the natural-cubic-spline jump V(t-, S) = V(t+, S - D) (plus
      the American-call ex-div exercise check) is applied as plain XLA
      ops on device-resident state, matching stepper.cn_solve's
      with_dividends step exactly (fd_american_equity.py:732-827
      semantics); at a ``reset_steps`` segment start the IT multiplier
      is zeroed per-trade (batch.reset_lambda). The in-step spline
      machinery — which crashed the TPU worker at the 1024x512 f32
      production shape inside the scan — never enters the kernel.
    """
    dtype = jnp.asarray(batch.x_min).dtype
    B = batch.x_min.shape[0]
    N = n_nodes
    P = p_chunks
    if P % 8 != 0:
        raise ValueError("p_chunks must be a multiple of the 8 sublanes")
    n_int = N - 2
    m = -(-(n_int + 1) // P)   # >=1 pad row after the last interior row
    n_pad = m * P
    TB = min(trade_block, B)
    if B % TB != 0:
        raise ValueError(f"batch size {B} not divisible by trade block {TB}")
    if (P - 1) * m >= n_int:
        raise ValueError(f"grid too small for SPIKE partitioning: N={N}")
    if n_pad - n_int > m:
        raise ValueError("pad rows spill outside the last chunk")

    if segments is None or set_defs is None:
        n_rann = min(rannacher_steps, n_steps)
        set_defs, segments = [], []
        if n_rann > 0:
            set_defs.append((1.0, 0))
            segments.append((0, n_rann, 0))
        if n_steps > n_rann:
            set_defs.append((0.5, 0))
            segments.append((n_rann, n_steps, len(set_defs) - 1))
        set_defs, segments = tuple(set_defs), tuple(segments)
    if segments[0][0] != 0 or segments[-1][1] != n_steps or any(
        s1[1] != s2[0] for s1, s2 in zip(segments[:-1], segments[1:])
    ):
        raise ValueError(f"segments must tile [0, {n_steps}): {segments}")

    x_min = jnp.asarray(batch.x_min)
    dx = jnp.asarray(batch.dx)
    sigma = jnp.asarray(sigma, dtype)
    r = jnp.asarray(batch.r, dtype)
    b = jnp.asarray(batch.b, dtype)
    q = jnp.asarray(batch.q, dtype)

    i = jnp.arange(N, dtype=dtype)
    s = jnp.exp(x_min[:, None] + i[None, :] * dx[:, None])  # (B, N)
    s_min, s_max = s[:, 0], s[:, -1]
    strike = jnp.asarray(batch.strike, dtype)
    is_call = jnp.asarray(batch.is_call)

    payoff = jnp.where(
        is_call[:, None],
        jnp.maximum(s - strike[:, None], 0.0),
        jnp.maximum(strike[:, None] - s, 0.0),
    )

    sig2 = sigma * sigma
    mu_x = (b - q) - 0.5 * sig2
    alpha_c = 0.5 * sig2 / (dx * dx)
    beta_adv = mu_x / (2.0 * dx)
    a_coef = alpha_c - beta_adv
    c_coef = alpha_c + beta_adv
    b_coef = -2.0 * alpha_c - r

    # chunk layout: global interior row g = j*m + ii lives at transposed
    # position r = ii*P + j; rows g >= n_int are identity pads (all in
    # the tail of chunk P-1)
    ii_np = np.arange(m)[:, None]
    jj_np = np.arange(P)[None, :]
    g_np = jj_np * m + ii_np                     # (m, P)
    real_np = g_np < n_int
    has_l_np = real_np & (ii_np > 0)
    has_u_np = real_np & (ii_np < m - 1) & (g_np < n_int - 1)
    real = jnp.asarray(real_np)[..., None]       # (m, P, 1)
    has_l = jnp.asarray(has_l_np)[..., None]
    has_u = jnp.asarray(has_u_np)[..., None]

    sets = {k: [] for k in (
        "w", "af", "ab", "vsp", "wsp", "rinv", "bl", "bc", "bu", "al",
        "au", "dt"
    )}
    for theta, k_col in set_defs:
        dt = jnp.asarray(batch.dt[:, k_col], dtype)
        one = _build_solver_set(
            theta, dt, a_coef, b_coef, c_coef,
            has_l, has_u, real, m, P, n_pad, dtype,
        )
        for k in sets:
            sets[k].append(one[k])

    # interior fields in transposed layout (pads -> 0)
    g_flat = np.minimum(g_np, n_int - 1).reshape(-1)     # (n_pad,)
    real_flat = jnp.asarray(real_np.reshape(-1, 1))
    out_mask_full = (
        jnp.asarray(batch.has_lower)[:, None]
        & (s <= jnp.asarray(batch.lower, dtype)[:, None])
    ) | (
        jnp.asarray(batch.has_upper)[:, None]
        & (s >= jnp.asarray(batch.upper, dtype)[:, None])
    )
    v0_t = jnp.where(real_flat, payoff.T[1 : N - 1][g_flat], 0.0)
    omask_t = jnp.where(
        real_flat, out_mask_full.T[1 : N - 1][g_flat], False
    ).astype(dtype)
    edge0 = jnp.stack([payoff[:, 0], payoff[:, -1]])      # (2, B)

    g_last = n_int - 1
    r_glast = (g_last % m) * P + g_last // m

    row1 = lambda a: jnp.asarray(a, dtype)[None, :]
    tau_T = jnp.asarray(batch.tau_next, dtype).T       # (n_steps, B)
    mon_T = jnp.asarray(batch.monitor).astype(dtype).T

    trade_spec = lambda: pl.BlockSpec((1, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)
    pair_spec = lambda: pl.BlockSpec((2, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)
    field_spec = lambda: pl.BlockSpec((n_pad, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)
    rinv_spec = pl.BlockSpec(
        (2 * P, 2 * P, TB), lambda j: (_Z, _Z, j), memory_space=pltpu.VMEM
    )

    def run_segment(t, v0_seg, edge_seg, lam_seg, k0, k1):
        ns = k1 - k0
        kernel = functools.partial(
            _kernel_spike, n_steps=ns, m=m, P=P, r_glast=r_glast,
            american=american, euro_put_lower=not american,
        )
        sched_spec = lambda: pl.BlockSpec(
            (ns, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM
        )
        in_specs = [
            trade_spec(),  # strike
            trade_spec(),  # is_call
            trade_spec(),  # r
            trade_spec(),  # growth rate (b - q - r)
            trade_spec(), trade_spec(), trade_spec(),  # rebate set
            trade_spec(), trade_spec(),  # s_min, s_max
            trade_spec(), trade_spec(),  # omask_lo, omask_hi
            trade_spec(), trade_spec(), trade_spec(),  # bl, bc, bu
            trade_spec(), trade_spec(),                # al, au
            field_spec(), field_spec(), field_spec(),  # w, af, ab
            field_spec(), field_spec(),                # vsp, wsp
            rinv_spec,
            field_spec(), field_spec(),  # v0, out_mask
            pair_spec(),                 # edge0
            sched_spec(), sched_spec(),  # tau_next, monitor
        ]
        operands = [
            row1(strike),
            row1(is_call.astype(dtype)),
            row1(r),
            row1(b - q - r),
            row1(batch.rebate),
            row1(jnp.asarray(batch.rebate_at_hit).astype(dtype)),
            row1(batch.rebate_rate),
            row1(s_min), row1(s_max),
            row1(out_mask_full[:, 0].astype(dtype)),
            row1(out_mask_full[:, -1].astype(dtype)),
            row1(sets["bl"][t]), row1(sets["bc"][t]), row1(sets["bu"][t]),
            row1(sets["al"][t]), row1(sets["au"][t]),
            sets["w"][t], sets["af"][t], sets["ab"][t],
            sets["vsp"][t], sets["wsp"][t],
            sets["rinv"][t],
            v0_seg, omask_t,
            edge_seg,
            tau_T[k0:k1], mon_T[k0:k1],
        ]
        out_specs = [field_spec(), pair_spec()]
        out_shape = [
            jax.ShapeDtypeStruct((n_pad, B), dtype),
            jax.ShapeDtypeStruct((2, B), dtype),
        ]
        if american:
            in_specs += [trade_spec(), field_spec(), field_spec()]
            operands += [row1(sets["dt"][t]), payoff_t, lam_seg]
            out_specs.append(field_spec())
            out_shape.append(jax.ShapeDtypeStruct((n_pad, B), dtype))
        res = pl.pallas_call(
            kernel,
            grid=(B // TB,),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((n_pad, TB), dtype)],
            interpret=interpret,
        )(*operands)
        return res if american else (*res, None)

    payoff_t = v0_t  # terminal values ARE the payoff (exercise target)
    lam_t = jnp.zeros((n_pad, B), dtype) if american else None
    v_t, edges = v0_t, edge0

    # untranspose map: v_full[:, 1+g] = v_t[(g % m)*P + g//m]. The row
    # permutation r = ii*P + j <-> g = j*m + ii is exactly the (m, P)
    # transpose, which XLA lowers far faster than the equivalent gather.
    def assemble(vt, ed):
        interior = (
            vt.reshape(m, P, B).transpose(1, 0, 2).reshape(n_pad, B)[:n_int]
        )
        return jnp.concatenate(
            [ed[0][:, None], interior.T, ed[1][:, None]], axis=1
        )
    div_set, reset_set = frozenset(div_steps), frozenset(reset_steps)

    for k0, k1, t in segments:
        if american and k0 in reset_set:
            # stepper.py:175 — lam zeroed per-trade before this step
            keep = 1.0 - jnp.asarray(batch.reset_lambda)[:, k0].astype(dtype)
            lam_t = lam_t * keep[None, :]
        v_t, edges, lam_t = run_segment(t, v_t, edges, lam_t, k0, k1)
        if american and (k1 - 1) in div_set:
            # dividend jump between pallas launches (stepper.py:201-212):
            # reassemble the grid, one batched spline shift, retranspose
            from ...ops.interp import cubic_spline_eval, natural_cubic_spline

            v_full = assemble(v_t, edges)
            d = jnp.asarray(batch.div_amount, dtype)[:, k1 - 1]
            xq = s - d[:, None]
            # the grid is uniform in log(S), so the bracketing interval
            # is closed-form — no searchsorted (the jump's dominant cost)
            j_idx = jnp.floor(
                (jnp.log(jnp.maximum(xq, s[:, :1])) - x_min[:, None])
                / dx[:, None]
            ).astype(jnp.int32)
            spline = jax.vmap(natural_cubic_spline)(s, v_full)
            v_shift = jax.vmap(cubic_spline_eval)(spline, xq, j_idx)
            # American calls may exercise just before ex-div
            v_shift = jnp.where(
                is_call[:, None], jnp.maximum(v_shift, payoff), v_shift
            )
            v_full = jnp.where((d != 0.0)[:, None], v_shift, v_full)
            v_int = v_full.T[1 : N - 1]  # (n_int, B)
            v_t = jnp.concatenate(
                [v_int, jnp.zeros((n_pad - n_int, B), dtype)], axis=0
            ).reshape(P, m, B).transpose(1, 0, 2).reshape(n_pad, B)
            edges = jnp.stack([v_full[:, 0], v_full[:, -1]])

    return assemble(v_t, edges), s


# --------------------------------------------------------------------------- #
# df64 (double-float) SPIKE variant — the on-chip <=1e-6 accuracy rung         #
# --------------------------------------------------------------------------- #
# Mosaic rejects f64 and XLA's x64 emulation exists only OUTSIDE pallas,
# so the accuracy rung previously fell back to the XLA scan (~600
# grids/s/chip for the American greeks workload). This variant carries
# every state/coefficient tensor as an f32 (hi, lo) double-float pair
# (ops/df64.py) inside the SAME SPIKE partitioning as _kernel_spike: the
# step math is ~20x the f32 flop count but stays VMEM-resident at full
# vector width. Requirements validated on-chip (test_pallas_kernel.py::
# TestVpuRounding): VPU f32 + - * are correctly rounded and the
# TwoSum/TwoProd/Dekker-split error terms are bit-exact (div and sqrt
# are NOT correctly rounded — the kernel uses neither: reciprocals
# (1/dt) and exponentials (boundary/rebate discount terms) are
# precomputed per (step, trade) OUTSIDE the kernel in XLA x64 and fed in
# as split pairs).


def _kernel_spike_df64(
    # masks (1, TB)
    omask_lo_ref, omask_hi_ref,
    # df trade rows (2, TB): [0]=hi, [1]=lo
    bl_ref, bc_ref, bu_ref, al_ref, au_ref,
    # df solver fields (2, n_pad, TB)
    w_ref, af_ref, ab_ref, vsp_ref, wsp_ref,
    # (2, 2P, 2P, TB) reduced-system inverse
    rinv_ref,
    # state (2, n_pad, TB) and KO mask (n_pad, TB)
    v0_ref, out_mask_ref,
    # (2, 2, TB) boundary edges [hi/lo, lo-edge/hi-edge, trade]
    edge0_ref,
    # per-step precomputed boundary values (2, ns, TB) + monitor (ns, TB)
    vmin_ref, vmax_ref, rebpv_ref, monitor_ref,
    *rest,
    n_steps: int, m: int, P: int, r_glast: int,
    american: bool = False,
):
    from ...ops import df64 as dfo

    if american:
        (dt_ref, dtinv_ref, payoff_ref, lam0_ref,
         v_out_ref, edge_out_ref, lam_out_ref, dp_hi, dp_lo) = rest
    else:
        v_out_ref, edge_out_ref, dp_hi, dp_lo = rest
    DF = dfo.DF
    add, sub, mul = dfo.add2, dfo.sub2, dfo.mul2
    band = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    padslot = band == P - 1
    il = r_glast // P
    sl = lambda ii: slice(ii * P, (ii + 1) * P)

    def rdf(ref, sli):
        return DF(ref[0, sli], ref[1, sli])

    def wdf(ref, sli, val):
        ref[0, sli] = val.hi
        ref[1, sli] = val.lo

    def rrow(ref):
        return DF(ref[0][None, :], ref[1][None, :])

    def roll_df(x, k):
        # the shift must be i32: this kernel runs in x64 sessions, where
        # a bare python int lowers to an i64 constant that Mosaic's
        # tpu.dynamic_rotate rejects (np.int32 keeps it a weak-typed i32
        # constant; wrapping a traced value would crash, so convert the
        # python int directly)
        k = np.int32(k)
        return DF(pltpu.roll(x.hi, k, 0), pltpu.roll(x.lo, k, 0))

    out_mask = out_mask_ref[:] != 0.0
    omask_lo = omask_lo_ref[:] != 0.0
    omask_hi = omask_hi_ref[:] != 0.0
    zero_p = DF(jnp.zeros((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32))

    v_out_ref[:] = v0_ref[:]
    if american:
        lam_out_ref[:] = lam0_ref[:]
        dt_row = rrow(dt_ref)
        dtinv_row = rrow(dtinv_ref)

    bl = rrow(bl_ref)
    bc = rrow(bc_ref)
    bu = rrow(bu_ref)
    al = rrow(al_ref)
    au = rrow(au_ref)

    def step(k, carry):
        v_lo, v_hi = carry  # DF rows (1, TB)
        v_min_n = DF(vmin_ref[0, k][None, :], vmin_ref[1, k][None, :])
        v_max_n = DF(vmax_ref[0, k][None, :], vmax_ref[1, k][None, :])
        rebate_pv = DF(rebpv_ref[0, k][None, :], rebpv_ref[1, k][None, :])

        first_band = rdf(v_out_ref, sl(0))
        last_band = rdf(v_out_ref, sl(m - 1))
        dn_fix = dfo.where2(band == 0, v_lo, roll_df(last_band, 1))
        up_fix = roll_df(first_band, P - 1)

        v_prev = dn_fix
        v_cur = first_band
        d = None
        for ii in range(m):
            v_next = rdf(v_out_ref, sl(ii + 1)) if ii < m - 1 else up_fix
            rhs = add(add(mul(bc, v_cur), mul(bl, v_prev)), mul(bu, v_next))
            if american:
                rhs = add(rhs, mul(dt_row, rdf(lam_out_ref, sl(ii))))
            if ii == 0:
                rhs = sub(
                    rhs, dfo.where2(band == 0, mul(al, v_min_n), zero_p)
                )
            if ii == il:
                rhs = add(
                    rhs,
                    dfo.where2(
                        padslot,
                        sub(mul(bu, v_hi), mul(au, v_max_n)),
                        zero_p,
                    ),
                )
            elif ii > il:
                rhs = dfo.where2(padslot, zero_p, rhs)
            if ii == 0:
                d = mul(rdf(w_ref, sl(0)), rhs)
            else:
                d = add(mul(rdf(w_ref, sl(ii)), rhs),
                        mul(rdf(af_ref, sl(ii)), d))
            dp_hi[sl(ii)] = d.hi
            dp_lo[sl(ii)] = d.lo
            v_prev, v_cur = v_cur, v_next
        y_bot = d
        x = d
        for ii in range(m - 2, -1, -1):
            x = add(DF(dp_hi[sl(ii)], dp_lo[sl(ii)]),
                    mul(rdf(ab_ref, sl(ii)), x))
            dp_hi[sl(ii)] = x.hi
            dp_lo[sl(ii)] = x.lo
        y_top = x

        def rcol(j):
            return DF(rinv_ref[0, :, j], rinv_ref[1, :, j])

        def brow(t, j):
            return DF(t.hi[j][None, :], t.lo[j][None, :])

        u = mul(rcol(0), brow(y_top, 0))
        u = add(u, mul(rcol(P), brow(y_bot, 0)))
        for j in range(1, P):
            u = add(u, mul(rcol(j), brow(y_top, j)))
            u = add(u, mul(rcol(P + j), brow(y_bot, j)))
        u_t = DF(u.hi[:P], u.lo[:P])
        u_b = DF(u.hi[P:], u.lo[P:])
        zero_pb = DF(jnp.zeros_like(u_b.hi), jnp.zeros_like(u_b.lo))
        bprev = dfo.where2(band == 0, zero_pb, roll_df(u_b, 1))
        tnext = dfo.where2(band == P - 1, zero_pb, roll_df(u_t, P - 1))

        mon = monitor_ref[k][None, :] != 0.0
        for ii in range(m):
            xr = sub(
                DF(dp_hi[sl(ii)], dp_lo[sl(ii)]),
                add(mul(bprev, rdf(vsp_ref, sl(ii))),
                    mul(tnext, rdf(wsp_ref, sl(ii)))),
            )
            if american:
                lam_old = rdf(lam_out_ref, sl(ii))
                pay = rdf(payoff_ref, sl(ii))
                v_am = dfo.max2(pay, sub(xr, mul(dt_row, lam_old)))
                lam_new = dfo.max2(
                    add(lam_old, mul(sub(pay, xr), dtinv_row)),
                    dfo.zeros_like2(lam_old),
                )
                wdf(lam_out_ref, sl(ii), lam_new)
                xr = v_am
            wdf(
                v_out_ref, sl(ii),
                dfo.where2(mon & out_mask[sl(ii)], rebate_pv, xr),
            )
        v_lo_new = dfo.where2(mon & omask_lo, rebate_pv, v_min_n)
        v_hi_new = dfo.where2(mon & omask_hi, rebate_pv, v_max_n)
        return (v_lo_new, v_hi_new)

    e_lo = DF(edge0_ref[0, 0][None, :], edge0_ref[1, 0][None, :])
    e_hi = DF(edge0_ref[0, 1][None, :], edge0_ref[1, 1][None, :])
    # i32 loop bounds: under x64 bare python ints make an i64 induction
    # variable, which Mosaic cannot legalize
    v_lo_f, v_hi_f = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_steps), step, (e_lo, e_hi)
    )
    edge_out_ref[0, 0] = v_lo_f.hi[0]
    edge_out_ref[1, 0] = v_lo_f.lo[0]
    edge_out_ref[0, 1] = v_hi_f.hi[0]
    edge_out_ref[1, 1] = v_hi_f.lo[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_nodes", "n_steps", "rannacher_steps", "trade_block",
        "p_chunks", "interpret", "segments", "set_defs", "american",
        "div_steps", "reset_steps",
    ),
)
def _cn_barrier_solve_spike_df64_jit(
    batch,
    sigma,
    n_nodes: int,
    n_steps: int,
    rannacher_steps: int = 2,
    trade_block: int = 128,
    p_chunks: int = P_CHUNKS,
    interpret: bool = False,
    segments=None,
    set_defs=None,
    american: bool = False,
    div_steps=(),
    reset_steps=(),
):
    """df64 twin of :func:`_cn_barrier_solve_spike_jit` — the <=1e-6
    accuracy rung on-chip. All host-side preparation (solver tensors,
    reduced-system inverse, per-step boundary/rebate values, dividend
    jumps between segments) runs in TRUE f64 under XLA x64 and is split
    into (hi, lo) pairs at the kernel boundary; inside the kernel every
    value is a double-float. Returns (V, s_nodes) in f64, matching the
    scan path (parity pinned in tests at ~1e-10). Requires x64 enabled.
    """
    from ...ops import df64 as dfo

    f64 = jnp.float64
    B = batch.x_min.shape[0]
    N = n_nodes
    P = p_chunks
    if P % 8 != 0:
        raise ValueError("p_chunks must be a multiple of the 8 sublanes")
    n_int = N - 2
    m = -(-(n_int + 1) // P)
    n_pad = m * P
    TB = min(trade_block, B)
    if B % TB != 0:
        raise ValueError(f"batch size {B} not divisible by trade block {TB}")
    if (P - 1) * m >= n_int:
        raise ValueError(f"grid too small for SPIKE partitioning: N={N}")
    if n_pad - n_int > m:
        raise ValueError("pad rows spill outside the last chunk")

    if segments is None or set_defs is None:
        n_rann = min(rannacher_steps, n_steps)
        set_defs, segments = [], []
        if n_rann > 0:
            set_defs.append((1.0, 0))
            segments.append((0, n_rann, 0))
        if n_steps > n_rann:
            set_defs.append((0.5, 0))
            segments.append((n_rann, n_steps, len(set_defs) - 1))
        set_defs, segments = tuple(set_defs), tuple(segments)
    if segments[0][0] != 0 or segments[-1][1] != n_steps or any(
        s1[1] != s2[0] for s1, s2 in zip(segments[:-1], segments[1:])
    ):
        raise ValueError(f"segments must tile [0, {n_steps}): {segments}")

    x_min = jnp.asarray(batch.x_min, f64)
    dx = jnp.asarray(batch.dx, f64)
    sigma = jnp.asarray(sigma, f64)
    r = jnp.asarray(batch.r, f64)
    b = jnp.asarray(batch.b, f64)
    q = jnp.asarray(batch.q, f64)

    i = jnp.arange(N, dtype=f64)
    s = jnp.exp(x_min[:, None] + i[None, :] * dx[:, None])  # (B, N)
    s_min, s_max = s[:, 0], s[:, -1]
    strike = jnp.asarray(batch.strike, f64)
    is_call = jnp.asarray(batch.is_call)

    payoff = jnp.where(
        is_call[:, None],
        jnp.maximum(s - strike[:, None], 0.0),
        jnp.maximum(strike[:, None] - s, 0.0),
    )

    sig2 = sigma * sigma
    mu_x = (b - q) - 0.5 * sig2
    alpha_c = 0.5 * sig2 / (dx * dx)
    beta_adv = mu_x / (2.0 * dx)
    a_coef = alpha_c - beta_adv
    c_coef = alpha_c + beta_adv
    b_coef = -2.0 * alpha_c - r

    ii_np = np.arange(m)[:, None]
    jj_np = np.arange(P)[None, :]
    g_np = jj_np * m + ii_np
    real_np = g_np < n_int
    has_l_np = real_np & (ii_np > 0)
    has_u_np = real_np & (ii_np < m - 1) & (g_np < n_int - 1)
    real = jnp.asarray(real_np)[..., None]
    has_l = jnp.asarray(has_l_np)[..., None]
    has_u = jnp.asarray(has_u_np)[..., None]

    def split2(x64):
        d = dfo.from_f64(jnp.asarray(x64, f64))
        return jnp.stack([d.hi, d.lo])

    sets = []
    for theta, k_col in set_defs:
        dt = jnp.asarray(batch.dt[:, k_col], f64)
        one = _build_solver_set(
            theta, dt, a_coef, b_coef, c_coef,
            has_l, has_u, real, m, P, n_pad, f64,
        )
        one["dtinv"] = 1.0 / dt
        sets.append({k: split2(v) for k, v in one.items()})

    g_flat = np.minimum(g_np, n_int - 1).reshape(-1)
    real_flat = jnp.asarray(real_np.reshape(-1, 1))
    out_mask_full = (
        jnp.asarray(batch.has_lower)[:, None]
        & (s <= jnp.asarray(batch.lower, f64)[:, None])
    ) | (
        jnp.asarray(batch.has_upper)[:, None]
        & (s >= jnp.asarray(batch.upper, f64)[:, None])
    )
    v0_t64 = jnp.where(real_flat, payoff.T[1 : N - 1][g_flat], 0.0)
    omask_t = jnp.where(
        real_flat, out_mask_full.T[1 : N - 1][g_flat], False
    ).astype(jnp.float32)
    edge0_64 = jnp.stack([payoff[:, 0], payoff[:, -1]])  # (2, B)

    g_last = n_int - 1
    r_glast = (g_last % m) * P + g_last // m

    # per-(step, trade) boundary values and rebate PV in TRUE f64 (the
    # scan path computes these inside the step from tau; precomputing
    # keeps exp/division out of the double-float kernel entirely)
    tau_T = jnp.asarray(batch.tau_next, f64).T          # (n_steps, B)
    growth = jnp.exp((b - q - r)[None, :] * tau_T)
    disc = jnp.exp(-r[None, :] * tau_T)
    v_min_put = strike[None, :] * disc
    if not american:
        # barrier kernel convention (euro_put_lower): subtract the
        # forward asymptote at the lower edge
        v_min_put = v_min_put - s_min[None, :] * growth
    vmin_64 = jnp.where(is_call[None, :], 0.0, v_min_put)
    vmax_64 = jnp.where(
        is_call[None, :],
        s_max[None, :] * growth - strike[None, :] * disc,
        0.0,
    )
    rebpv_64 = jnp.where(
        jnp.asarray(batch.rebate_at_hit)[None, :],
        jnp.asarray(batch.rebate, f64)[None, :],
        jnp.asarray(batch.rebate, f64)[None, :]
        * jnp.exp(-jnp.asarray(batch.rebate_rate, f64)[None, :] * tau_T),
    )
    mon_T = jnp.asarray(batch.monitor).astype(jnp.float32).T

    frow = lambda a: jnp.asarray(a, jnp.float32)[None, :]
    pair_trade_spec = lambda: pl.BlockSpec(
        (2, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM
    )
    mask_spec = lambda: pl.BlockSpec(
        (1, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM
    )
    pair_field_spec = lambda: pl.BlockSpec(
        (2, n_pad, TB), lambda j: (_Z, _Z, j), memory_space=pltpu.VMEM
    )
    field_spec = lambda: pl.BlockSpec(
        (n_pad, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM
    )
    edge_spec = lambda: pl.BlockSpec(
        (2, 2, TB), lambda j: (_Z, _Z, j), memory_space=pltpu.VMEM
    )
    rinv_spec = pl.BlockSpec(
        (2, 2 * P, 2 * P, TB), lambda j: (_Z, _Z, _Z, j),
        memory_space=pltpu.VMEM,
    )

    def run_segment(t, v0_seg, edge_seg, lam_seg, k0, k1):
        ns = k1 - k0
        kernel = functools.partial(
            _kernel_spike_df64, n_steps=ns, m=m, P=P, r_glast=r_glast,
            american=american,
        )
        pair_sched_spec = lambda: pl.BlockSpec(
            (2, ns, TB), lambda j: (_Z, _Z, j), memory_space=pltpu.VMEM
        )
        sched_spec = lambda: pl.BlockSpec(
            (ns, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM
        )
        in_specs = [
            mask_spec(), mask_spec(),                    # omask_lo/hi
            pair_trade_spec(), pair_trade_spec(), pair_trade_spec(),
            pair_trade_spec(), pair_trade_spec(),        # bl bc bu al au
            pair_field_spec(), pair_field_spec(), pair_field_spec(),
            pair_field_spec(), pair_field_spec(),        # w af ab vsp wsp
            rinv_spec,
            pair_field_spec(), field_spec(),             # v0, out_mask
            edge_spec(),                                 # edge0
            pair_sched_spec(), pair_sched_spec(), pair_sched_spec(),
            sched_spec(),                                # vmin vmax reb mon
        ]
        st = sets[t]
        operands = [
            frow(out_mask_full[:, 0]), frow(out_mask_full[:, -1]),
            st["bl"], st["bc"], st["bu"], st["al"], st["au"],
            st["w"], st["af"], st["ab"], st["vsp"], st["wsp"],
            st["rinv"],
            v0_seg, omask_t,
            edge_seg,
            split2(vmin_64[k0:k1]), split2(vmax_64[k0:k1]),
            split2(rebpv_64[k0:k1]), mon_T[k0:k1],
        ]
        out_specs = [pair_field_spec(), edge_spec()]
        out_shape = [
            jax.ShapeDtypeStruct((2, n_pad, B), jnp.float32),
            jax.ShapeDtypeStruct((2, 2, B), jnp.float32),
        ]
        if american:
            in_specs += [
                pair_trade_spec(), pair_trade_spec(),
                pair_field_spec(), pair_field_spec(),
            ]
            operands += [st["dt"], st["dtinv"], payoff_t, lam_seg]
            out_specs.append(pair_field_spec())
            out_shape.append(
                jax.ShapeDtypeStruct((2, n_pad, B), jnp.float32)
            )
        res = pl.pallas_call(
            kernel,
            grid=(B // TB,),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                # the double-float working set is ~2x the f32 kernel's:
                # ~14.5 MiB single-buffered at the 1024x512xTB=128
                # production shape, over the 16 MiB DEFAULT scoped limit
                # once Mosaic double-buffers the per-block inputs. v5e
                # has 128 MiB physical VMEM — raise the cap instead of
                # shrinking the trade block (TB<128 wastes vector lanes)
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((n_pad, TB), jnp.float32),
                pltpu.VMEM((n_pad, TB), jnp.float32),
            ],
            interpret=interpret,
        )(*operands)
        return res if american else (*res, None)

    payoff_t = split2(v0_t64)  # terminal values ARE the payoff
    lam_t = (
        jnp.zeros((2, n_pad, B), jnp.float32) if american else None
    )
    v_t, edges = split2(v0_t64), split2(edge0_64)

    def to64(stacked):
        return dfo.to_f64(dfo.DF(stacked[0], stacked[1]))

    def assemble(vt, ed):
        v64 = to64(vt)
        interior = (
            v64.reshape(m, P, B).transpose(1, 0, 2).reshape(n_pad, B)[:n_int]
        )
        e64 = to64(ed)
        return jnp.concatenate(
            [e64[0][:, None], interior.T, e64[1][:, None]], axis=1
        )
    div_set, reset_set = frozenset(div_steps), frozenset(reset_steps)

    for k0, k1, t in segments:
        if american and k0 in reset_set:
            keep = 1.0 - jnp.asarray(batch.reset_lambda)[:, k0].astype(f64)
            lam_t = split2(to64(lam_t) * keep[None, :])
        v_t, edges, lam_t = run_segment(t, v_t, edges, lam_t, k0, k1)
        if american and (k1 - 1) in div_set:
            # dividend jump between pallas launches, in true f64
            from ...ops.interp import cubic_spline_eval, natural_cubic_spline

            v_full = assemble(v_t, edges)
            d = jnp.asarray(batch.div_amount, f64)[:, k1 - 1]
            xq = s - d[:, None]
            j_idx = jnp.floor(
                (jnp.log(jnp.maximum(xq, s[:, :1])) - x_min[:, None])
                / dx[:, None]
            ).astype(jnp.int32)
            spline = jax.vmap(natural_cubic_spline)(s, v_full)
            v_shift = jax.vmap(cubic_spline_eval)(spline, xq, j_idx)
            v_shift = jnp.where(
                is_call[:, None], jnp.maximum(v_shift, payoff), v_shift
            )
            v_full = jnp.where((d != 0.0)[:, None], v_shift, v_full)
            v_int = v_full.T[1 : N - 1]
            v_t64 = jnp.concatenate(
                [v_int, jnp.zeros((n_pad - n_int, B), f64)], axis=0
            ).reshape(P, m, B).transpose(1, 0, 2).reshape(n_pad, B)
            v_t = split2(v_t64)
            edges = split2(jnp.stack([v_full[:, 0], v_full[:, -1]]))

    return assemble(v_t, edges), s


def price_barrier_batch_pallas(
    batch,
    n_nodes: int,
    dv_sigma=None,
    with_greeks: bool = True,
    trade_block: int = 128,
    interpret: bool = False,
):
    """Drop-in fast path for ``batch.price_barrier_batch`` on TPU.

    Same outputs (price/delta/gamma/vega/theta per trade); the solve runs in
    the fused Pallas kernel. ``dv_sigma=None`` resolves the dtype-aware
    vega bump (batch._resolve_dv_sigma — 1e-4 at f64, one vol point at
    f32 where the solve's own noise floor dominates a smaller step).
    """
    from ...ops.stencils import nonuniform_central
    from .batch import _resolve_dv_sigma

    dev = jax.tree.map(jnp.asarray, batch)
    dv_sigma = _resolve_dv_sigma(dv_sigma, dev.sigma)
    n_steps = int(np.asarray(batch.dt).shape[1])

    v, s = cn_barrier_solve_pallas(
        dev, dev.sigma, n_nodes=n_nodes, n_steps=n_steps,
        trade_block=trade_block, interpret=interpret,
    )
    price = jax.vmap(jnp.interp)(dev.s_eff, s, v)
    out = {"price": np.asarray(price)}
    if not with_greeks:
        return out

    v_up, _ = cn_barrier_solve_pallas(
        dev, dev.sigma + dv_sigma, n_nodes=n_nodes, n_steps=n_steps,
        trade_block=trade_block, interpret=interpret,
    )
    price_up = jax.vmap(jnp.interp)(dev.s_eff, s, v_up)
    out["vega"] = np.asarray((price_up - price) / (dv_sigma * 100.0))

    def dg(s_i, v_i, spot_i):
        idx = jnp.clip(jnp.argmin(jnp.abs(s_i - spot_i)), 1, s_i.shape[0] - 2)
        return nonuniform_central(s_i, v_i, idx)

    delta, gamma = jax.vmap(dg)(s, v, dev.spot)
    out["delta"] = np.asarray(delta)
    out["gamma"] = np.asarray(gamma)
    out["theta"] = np.asarray(
        -(
            0.5 * dev.sigma**2 * dev.spot**2 * gamma
            + (dev.b - dev.q) * dev.spot * delta
            - dev.r * jnp.asarray(out["price"])
        )
    )
    return out
