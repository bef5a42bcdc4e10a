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
price-only, host-materialized timing):

    XLA cn_solve (default)            ~98 ms  -> 10.3k grids/s
    Pallas fused (this kernel, TB=128) ~134 ms ->  7.6k grids/s
    XLA with hoisted solver tensors   ~209 ms  (per-step gathers dominate)
    2x-stacked vega-fused solve       ~408 ms  (working-set cliff > B=1024)

The default XLA path wins: recomputing the closed-form denominators
in-register each step fuses better than either VMEM residency (per-core
program serialization) or memoized tensors (HBM gather traffic). The
kernel is kept as a tested alternative path and as the starting point for
a cyclic-reduction variant (O(N) work vs the scans' O(N log N)).
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
                A_sh = pltpu.roll(A, s, 0)
                B_sh = pltpu.roll(B, s, 0)
                pad = row < s
            else:
                A_sh = pltpu.roll(A, N - s, 0)
                B_sh = pltpu.roll(B, N - s, 0)
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

        v_up = pltpu.roll(v, N - 1, 0)  # v[i+1] (circular; boundary rows fixed below)
        v_dn = pltpu.roll(v, 1, 0)    # v[i-1]
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

    trade_spec = lambda: pl.BlockSpec((1, TB), lambda j: (0, j), memory_space=pltpu.VMEM)
    set_spec = lambda: pl.BlockSpec((2, TB), lambda j: (0, j), memory_space=pltpu.VMEM)
    field_spec = lambda: pl.BlockSpec((2, N, TB), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    grid_spec = lambda: pl.BlockSpec((N, TB), lambda j: (0, j), memory_space=pltpu.VMEM)
    sched_spec = lambda: pl.BlockSpec((n_steps, TB), lambda j: (0, j), memory_space=pltpu.VMEM)

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


def price_barrier_batch_pallas(
    batch,
    n_nodes: int,
    dv_sigma: float = 0.0001,
    with_greeks: bool = True,
    trade_block: int = 128,
    interpret: bool = False,
):
    """Drop-in fast path for ``batch.price_barrier_batch`` on TPU.

    Same outputs (price/delta/gamma/vega/theta per trade); the solve runs in
    the fused Pallas kernel.
    """
    from ...ops.stencils import nonuniform_central

    dev = jax.tree.map(jnp.asarray, batch)
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
