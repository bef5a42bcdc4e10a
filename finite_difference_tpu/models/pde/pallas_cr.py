"""Fused Pallas CN kernel with constant-coefficient CYCLIC REDUCTION.

Second-generation fused time-loop kernel (see pallas_kernel.py for the
first): the tridiagonal solve uses cyclic reduction instead of
Hillis-Steele affine scans — O(N) work per solve instead of O(N log N),
with all level coefficients reduced to per-(trade, level) SCALARS.

Key structural facts (validated to machine precision in tests):
- the interior CN system is Toeplitz tridiagonal; under CR with
  zero-extended phantom unknowns every reduction level stays Toeplitz
  except the FIRST and LAST active rows, so each level is described by
  <= 3 scalar classes per coefficient;
- those scalars depend only on (theta, trade) — precomputed outside the
  kernel for the two Rannacher/CN theta sets as a packed
  (2, n_levels, 16, B) tensor (tiny);
- in-kernel per level: one even/odd sublane reshape split, one roll, ~6
  fused mul/adds on a halved array; per-level evens stored in a scratch
  stack for back-substitution.

Scope matches pallas_kernel.cn_barrier_solve_pallas (uniform dt, two theta
sets, European, no dividends); interior size must be a power of two, so the
wrapper uses n_nodes = 2^k + 2.

Measured on the single TPU chip (1026x512, batch 1024, f32, price-only):

    XLA cn_solve (default)   ~97 ms  -> 10.6k grids/s
    Pallas scans (TB=128)    ~134 ms ->  7.6k grids/s
    Pallas CR (this, TB=128) ~158 ms ->  6.5k grids/s

Despite ~5x less arithmetic than the scans, CR loses: the per-level
even/odd splits and interleaves are strided sublane RELAYOUTS, and on this
toolchain data movement — not FLOPs — is the binding cost (the deepest
levels also leave sublanes mostly idle). The contiguous-shift scans, and
above both the XLA pipeline with its in-register recompute, win. Kept as a
correct (2e-13 vs the production path) reference implementation of the
classic parallel-tridiagonal alternative.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# slot layout inside the packed per-level coefficient tensor
_SLOTS = dict(
    alpha_f=0, alpha_i=1, alpha_l=2,
    gamma_f=3, gamma_i=4, gamma_l=5,
    ae_f=6, ae_i=7, ae_l=8,
    be_f=9, be_i=10, be_l=11,
    ce_f=12, ce_i=13, ce_l=14,
    b_final=15,  # only meaningful at level 0 row (scalar per trade)
)
# i32 index-map zero: python ints become i64 under x64, which
# Mosaic fails to legalize
_Z = np.int32(0)

N_SLOTS = 16


def cr_level_coeffs(a_l, a_c, a_u, n: int):
    """Packed (n_levels, 16, B) CR level scalars for per-trade constant
    diagonals (a_l, a_c, a_u); n must be a power of two."""
    if n & (n - 1) != 0:
        raise ValueError("interior size must be a power of two")
    B = a_l.shape[0]
    dtype = a_l.dtype
    n_levels = int(np.log2(n))

    av = jnp.broadcast_to(a_l[None, :], (n, B)).at[0].set(0.0)
    bv = jnp.broadcast_to(a_c[None, :], (n, B))
    cv = jnp.broadcast_to(a_u[None, :], (n, B)).at[n - 1].set(0.0)

    out = []
    m = n
    for _ in range(n_levels):
        half = m // 2
        a_e, b_e, c_e = av[0::2], bv[0::2], cv[0::2]  # even rows (half, B)
        a_o, b_o, c_o = av[1::2], bv[1::2], cv[1::2]  # odd rows
        alpha = a_o / b_e
        # upper neighbor of odd k is even k+1; the last odd row (p = m-1,
        # m always even here) has none -> gamma = 0
        b_e_up = jnp.concatenate([b_e[1:], jnp.ones((1, B), dtype)])
        a_e_up = jnp.concatenate([a_e[1:], jnp.zeros((1, B), dtype)])
        c_e_up = jnp.concatenate([c_e[1:], jnp.zeros((1, B), dtype)])
        gamma = (c_o / b_e_up).at[-1].set(0.0)
        lvl = jnp.zeros((N_SLOTS, B), dtype)
        mid = half // 2
        lvl = lvl.at[_SLOTS["alpha_f"]].set(alpha[0])
        lvl = lvl.at[_SLOTS["alpha_i"]].set(alpha[mid])
        lvl = lvl.at[_SLOTS["alpha_l"]].set(alpha[-1])
        lvl = lvl.at[_SLOTS["gamma_f"]].set(gamma[0])
        lvl = lvl.at[_SLOTS["gamma_i"]].set(gamma[mid] if half > 1 else gamma[0])
        lvl = lvl.at[_SLOTS["gamma_l"]].set(gamma[-1])
        lvl = lvl.at[_SLOTS["ae_f"]].set(a_e[0])
        lvl = lvl.at[_SLOTS["ae_i"]].set(a_e[mid])
        lvl = lvl.at[_SLOTS["ae_l"]].set(a_e[-1])
        lvl = lvl.at[_SLOTS["be_f"]].set(b_e[0])
        lvl = lvl.at[_SLOTS["be_i"]].set(b_e[mid])
        lvl = lvl.at[_SLOTS["be_l"]].set(b_e[-1])
        lvl = lvl.at[_SLOTS["ce_f"]].set(c_e[0])
        lvl = lvl.at[_SLOTS["ce_i"]].set(c_e[mid])
        lvl = lvl.at[_SLOTS["ce_l"]].set(c_e[-1])
        out.append(lvl)

        av = -alpha * a_e
        cv = -gamma * c_e_up
        bv = b_o - alpha * c_e - gamma * a_e_up
        m = half

    # final 1x1 system pivot goes into level-0's b_final slot
    out[0] = out[0].at[_SLOTS["b_final"]].set(bv[0])
    return jnp.stack(out)  # (n_levels, 16, B)


def _class_vec(rows: int, first, interior, last, dtype):
    """(rows, 1)-indexed class vector from three (1, TB) scalars."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    v = jnp.broadcast_to(interior, (rows, interior.shape[1]))
    v = jnp.where(idx == 0, first, v)
    v = jnp.where(idx == rows - 1, last, v)
    return v


def _cr_kernel(
    strike_ref, is_call_ref, r_ref, growth_rate_ref,
    b_l_sets_ref, b_c_sets_ref, b_u_sets_ref,
    a_l_sets_ref, a_u_sets_ref,
    rebate_ref, rebate_at_hit_ref, rebate_rate_ref,
    s_min_ref, s_max_ref,
    lvl_sets_ref,  # (2, n_levels, 16, TB)
    v0_ref, out_mask_ref,
    tau_next_ref, monitor_ref,
    v_out_ref,
    evens_scratch,  # (n, TB) scratch stack
    *, n_steps: int, rannacher_steps: int, n_nodes: int,
):
    N = n_nodes
    n = N - 2
    n_levels = int(np.log2(n))
    TB = v0_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    is_interior = (row >= 1) & (row <= N - 2)
    is_row1 = row == 1
    is_rowN2 = row == N - 2

    out_mask = out_mask_ref[:] != 0.0

    def step(k, v):
        idx = jnp.where(k < rannacher_steps, 0, 1)
        b_l = b_l_sets_ref[idx, :][None, :]
        b_c = b_c_sets_ref[idx, :][None, :]
        b_u = b_u_sets_ref[idx, :][None, :]
        a_l = a_l_sets_ref[idx, :][None, :]
        a_u = a_u_sets_ref[idx, :][None, :]
        lvls = lvl_sets_ref[idx]  # (n_levels, 16, TB)

        tau = tau_next_ref[k, :][None, :]
        is_call = is_call_ref[:] != 0.0
        growth = jnp.exp(growth_rate_ref[:] * tau)
        disc = jnp.exp(-r_ref[:] * tau)
        v_min = jnp.where(is_call, 0.0, strike_ref[:] * disc - s_min_ref[:] * growth)
        v_max = jnp.where(is_call, s_max_ref[:] * growth - strike_ref[:] * disc, 0.0)

        v_up = pltpu.roll(v, np.int32(N - 1), 0)
        v_dn = pltpu.roll(v, np.int32(1), 0)
        rhs = b_l * v_dn + b_c * v + b_u * v_up
        rhs = rhs - jnp.where(is_row1, a_l * v_min, 0.0)
        rhs = rhs - jnp.where(is_rowN2, a_u * v_max, 0.0)
        rhs = jnp.where(is_interior, rhs, 0.0)

        d = rhs[1 : N - 1, :]  # (n, TB)

        # ---- CR forward reduction (unrolled; static shapes per level) ----
        offset = 0
        m = n
        for lev in range(n_levels):
            half = m // 2
            pairs = d.reshape(half, 2, TB)
            evens = pairs[:, 0, :]
            odds = pairs[:, 1, :]
            evens_scratch[offset : offset + half, :] = evens
            ev_up = pltpu.roll(evens, np.int32(half - 1), 0) if half > 1 else evens
            lidx = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
            ev_up = jnp.where(lidx == half - 1, 0.0, ev_up)
            alpha = _class_vec(
                half,
                lvls[lev, _SLOTS["alpha_f"]][None, :],
                lvls[lev, _SLOTS["alpha_i"]][None, :],
                lvls[lev, _SLOTS["alpha_l"]][None, :],
                d.dtype,
            )
            gamma = _class_vec(
                half,
                lvls[lev, _SLOTS["gamma_f"]][None, :],
                lvls[lev, _SLOTS["gamma_i"]][None, :],
                lvls[lev, _SLOTS["gamma_l"]][None, :],
                d.dtype,
            )
            d = odds - alpha * evens - gamma * ev_up
            offset += half
            m = half

        # ---- final 1x1 + back substitution ----
        x = d / lvls[0, _SLOTS["b_final"]][None, :]  # (1, TB)
        m = 1
        for lev in range(n_levels - 1, -1, -1):
            half = m
            offset -= half
            evens = evens_scratch[offset : offset + half, :]
            x_lo = pltpu.roll(x, np.int32(1), 0) if half > 1 else x
            lidx = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
            x_lo = jnp.where(lidx == 0, 0.0, x_lo)
            ae = _class_vec(
                half,
                lvls[lev, _SLOTS["ae_f"]][None, :],
                lvls[lev, _SLOTS["ae_i"]][None, :],
                lvls[lev, _SLOTS["ae_l"]][None, :],
                d.dtype,
            )
            be = _class_vec(
                half,
                lvls[lev, _SLOTS["be_f"]][None, :],
                lvls[lev, _SLOTS["be_i"]][None, :],
                lvls[lev, _SLOTS["be_l"]][None, :],
                d.dtype,
            )
            ce = _class_vec(
                half,
                lvls[lev, _SLOTS["ce_f"]][None, :],
                lvls[lev, _SLOTS["ce_i"]][None, :],
                lvls[lev, _SLOTS["ce_l"]][None, :],
                d.dtype,
            )
            x_even = (evens - ae * x_lo - ce * x) / be
            x = jnp.stack([x_even, x], axis=1).reshape(2 * half, TB)
            m = 2 * half

        v_new = jnp.concatenate([v_min, x, v_max], axis=0)

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
def cn_barrier_solve_pallas_cr(
    batch,
    sigma,
    n_nodes: int,
    n_steps: int,
    rannacher_steps: int = 2,
    trade_block: int = 128,
    interpret: bool = False,
):
    """CR-kernel solve of a BarrierTradeBatch: (V, s_nodes), both (B, N).

    ``n_nodes - 2`` must be a power of two (e.g. n_nodes = 1026).
    """
    n = n_nodes - 2
    if n & (n - 1) != 0:
        raise ValueError("n_nodes - 2 must be a power of two for the CR kernel")
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
    dt = jnp.asarray(batch.dt[:, 0], dtype)

    i = jnp.arange(N, dtype=dtype)
    s = jnp.exp(x_min[:, None] + i[None, :] * dx[:, None])
    s_min, s_max = s[:, 0], s[:, -1]

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

    lvl_sets, bl_sets, bc_sets, bu_sets, al_sets, au_sets = [], [], [], [], [], []
    for theta in (1.0, 0.5):
        a_l = -theta * dt * a_coef
        a_c_diag = 1.0 - theta * dt * b_coef
        a_u = -theta * dt * c_coef
        lvl_sets.append(cr_level_coeffs(a_l, a_c_diag, a_u, n))
        bl_sets.append((1.0 - theta) * dt * a_coef)
        bc_sets.append(1.0 + (1.0 - theta) * dt * b_coef)
        bu_sets.append((1.0 - theta) * dt * c_coef)
        al_sets.append(a_l)
        au_sets.append(a_u)

    lvl_sets = jnp.stack(lvl_sets)  # (2, n_levels, 16, B)
    bl_sets = jnp.stack(bl_sets)
    bc_sets = jnp.stack(bc_sets)
    bu_sets = jnp.stack(bu_sets)
    al_sets = jnp.stack(al_sets)
    au_sets = jnp.stack(au_sets)

    out_mask = (
        (jnp.asarray(batch.has_lower)[:, None] & (s <= jnp.asarray(batch.lower, dtype)[:, None]))
        | (jnp.asarray(batch.has_upper)[:, None] & (s >= jnp.asarray(batch.upper, dtype)[:, None]))
    ).astype(dtype)

    n_levels = int(np.log2(n))
    row1 = lambda a: jnp.asarray(a, dtype)[None, :]
    kernel = functools.partial(
        _cr_kernel, n_steps=n_steps, rannacher_steps=rannacher_steps, n_nodes=N
    )

    trade_spec = lambda: pl.BlockSpec((1, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)
    set_spec = lambda: pl.BlockSpec((2, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)
    lvl_spec = pl.BlockSpec(
        (2, n_levels, N_SLOTS, TB), lambda j: (_Z, _Z, _Z, j), memory_space=pltpu.VMEM
    )
    grid_spec = lambda: pl.BlockSpec((N, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)
    sched_spec = lambda: pl.BlockSpec((n_steps, TB), lambda j: (_Z, j), memory_space=pltpu.VMEM)

    v = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        # independent trade blocks: parallel across TensorCores on megacore
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        in_specs=[
            trade_spec(), trade_spec(), trade_spec(), trade_spec(),
            set_spec(), set_spec(), set_spec(),
            set_spec(), set_spec(),
            trade_spec(), trade_spec(), trade_spec(),
            trade_spec(), trade_spec(),
            lvl_spec,
            grid_spec(), grid_spec(),
            sched_spec(), sched_spec(),
        ],
        out_specs=grid_spec(),
        out_shape=jax.ShapeDtypeStruct((N, B), dtype),
        scratch_shapes=[pltpu.VMEM((n, TB), dtype)],
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
        lvl_sets,
        payoff.T, out_mask.T,
        jnp.asarray(batch.tau_next, dtype).T,
        jnp.asarray(batch.monitor).astype(dtype).T,
    )
    return v.T, s
