"""Batched Crank–Nicolson / Rannacher theta-stepper in log-S (pure JAX).

This is the device-side engine behind every PDE pricer in the framework —
the TPU-native redesign of the reference's scalar time loops
(`_solve_segment` fd_american_equity.py:559-726, `_solve_grid`
discrete_barrier_fdm_pricer.py:442-547):

- One ``lax.scan`` over time steps; per-step behavior (theta for Rannacher
  smoothing, segment dt, KO-monitor flags, dividend jumps, lambda resets) is
  data, precomputed host-side into a fixed-shape :class:`CNSchedule` — so a
  single compiled kernel serves every trade/scenario in a batch via ``vmap``.
- The tridiagonal solve uses the O(log N)-depth constant-diagonal Thomas
  (`ops.tridiag.thomas_solve_const`).
- American early exercise is Ikonen–Toivanen operator splitting fused into
  the step (λ-update semantics match fd_american_equity.py:701-723).
- Discrete-barrier knock-out is a masked projection applied on monitor steps
  only (discrete_barrier_fdm_pricer.py:413-440), with rebate PV.
- Discrete cash dividends apply the natural-cubic-spline jump
  V(t-, S) = V(t+, S - D) (fd_american_equity.py:732-776), with the
  American-call exercise check at ex-div.

Everything is shape-static: n_nodes and n_steps are Python ints; optional
features (American projection, dividend jumps) are static flags so XLA only
compiles what a pricer actually uses.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ...ops.interp import cubic_spline_eval, natural_cubic_spline
from ...ops.tridiag import thomas_solve_const


class CNGrid(NamedTuple):
    """Uniform log-S grid: x_i = x_min + i*dx, i = 0..n_nodes-1."""

    x_min: jnp.ndarray  # scalar
    dx: jnp.ndarray  # scalar


class CNDynamics(NamedTuple):
    """Black–Scholes dynamics + payoff for one trade (scalars; vmap to batch)."""

    strike: jnp.ndarray
    is_call: jnp.ndarray  # bool
    sigma: jnp.ndarray
    r: jnp.ndarray  # discount NACC
    b: jnp.ndarray  # cost of carry NACC
    q: jnp.ndarray  # continuous dividend yield NACC (escrowed model)


class BarrierSpec(NamedTuple):
    """Knock-out barrier description (scalars; vmap to batch).

    Absent barriers are encoded by has_lower/has_upper = False (levels are
    then ignored). Knock-INs are priced by parity at the pricer layer.
    """

    lower: jnp.ndarray
    upper: jnp.ndarray
    has_lower: jnp.ndarray  # bool
    has_upper: jnp.ndarray  # bool
    rebate: jnp.ndarray
    rebate_at_hit: jnp.ndarray  # bool
    # rate used to PV a maturity-paid rebate back from expiry; the
    # reference discounts this at the CARRY rate, not the discount rate
    # (discrete_barrier_fdm_pricer.py:424) — preserved for parity
    rebate_rate: jnp.ndarray

    @staticmethod
    def none(dtype=jnp.float64):
        z = jnp.zeros((), dtype)
        f = jnp.zeros((), jnp.bool_)
        return BarrierSpec(z, z, f, f, z, f, z)


class CNSchedule(NamedTuple):
    """Per-time-step controls, shape (n_steps,); build host-side."""

    dt: jnp.ndarray  # step size in tau
    theta: jnp.ndarray  # 1.0 = fully implicit (Rannacher), 0.5 = CN
    tau_next: jnp.ndarray  # time-to-maturity after the step
    monitor: jnp.ndarray  # bool: apply KO projection after the step
    div_amount: jnp.ndarray  # cash dividend jump applied after the step (0 = none)
    reset_lambda: jnp.ndarray  # bool: zero the IT multiplier before the step


def _payoff(s, strike, is_call):
    return jnp.where(is_call, jnp.maximum(s - strike, 0.0), jnp.maximum(strike - s, 0.0))


def _boundary_values(tau, s_min, s_max, dyn: CNDynamics, euro_put_lower: bool):
    """Dirichlet far-field values at time-to-maturity tau.

    Calls: V_max = S_max e^{(b-q-r) tau} - K e^{-r tau}; V_min = 0.
    Puts:  V_max = 0; V_min = K e^{-r tau} (American pricer convention,
    fd_american_equity.py:474-478) or K e^{-r tau} - S_min e^{(b-q-r) tau}
    (full European asymptotic used by the barrier stepper).
    """
    growth = jnp.exp((dyn.b - dyn.q - dyn.r) * tau)
    disc = jnp.exp(-dyn.r * tau)
    v_max_call = s_max * growth - dyn.strike * disc
    v_min_put = dyn.strike * disc - (s_min * growth if euro_put_lower else 0.0)
    v_min = jnp.where(dyn.is_call, 0.0, v_min_put)
    v_max = jnp.where(dyn.is_call, v_max_call, 0.0)
    return v_min, v_max


def cn_solve(
    grid: CNGrid,
    dyn: CNDynamics,
    schedule: CNSchedule,
    n_nodes: int,
    barrier: Optional[BarrierSpec] = None,
    american: bool = False,
    with_dividends: bool = False,
    exercise_call_at_div: bool = True,
    euro_put_lower_boundary: bool = True,
    terminal_values: Optional[jnp.ndarray] = None,
):
    """March the value grid from expiry (tau=0) to valuation (tau=T).

    Returns ``(V, s_nodes)``: the value vector over the grid at valuation
    and the S-space node locations, both shape (n_nodes,).

    All array arguments are per-trade scalars/vectors — batch with
    ``jax.vmap`` over leading axes (schedules included, so different trades
    may have different monitor/dividend/Rannacher layouts within one batch).
    """
    dtype = jnp.result_type(grid.x_min, grid.dx, dyn.sigma)
    i = lax.iota(dtype, n_nodes)
    x = grid.x_min + i * grid.dx
    s = jnp.exp(x)
    s_min, s_max = s[0], s[-1]

    payoff = _payoff(s, dyn.strike, dyn.is_call)
    v0 = payoff if terminal_values is None else terminal_values

    sig2 = dyn.sigma * dyn.sigma
    mu_x = (dyn.b - dyn.q) - 0.5 * sig2
    alpha = 0.5 * sig2 / (grid.dx * grid.dx)
    beta_adv = mu_x / (2.0 * grid.dx)
    a_coef = alpha - beta_adv
    c_coef = alpha + beta_adv
    b_coef = -2.0 * alpha - dyn.r

    payoff_int = payoff[1:-1]

    if barrier is not None:
        out_mask = (barrier.has_lower & (s <= barrier.lower)) | (
            barrier.has_upper & (s >= barrier.upper)
        )

    def step(carry, sch):
        v, lam = carry
        dt, theta = sch.dt, sch.theta

        a_l = -theta * dt * a_coef
        a_c = 1.0 - theta * dt * b_coef
        a_u = -theta * dt * c_coef
        b_l = (1.0 - theta) * dt * a_coef
        b_c = 1.0 + (1.0 - theta) * dt * b_coef
        b_u = (1.0 - theta) * dt * c_coef

        v_min, v_max = _boundary_values(
            sch.tau_next, s_min, s_max, dyn, euro_put_lower_boundary
        )

        rhs = b_l * v[:-2] + b_c * v[1:-1] + b_u * v[2:]
        if american:
            lam = jnp.where(sch.reset_lambda, jnp.zeros_like(lam), lam)
            rhs = rhs + dt * lam
        rhs = rhs.at[0].add(-a_l * v_min)
        rhs = rhs.at[-1].add(-a_u * v_max)

        tilde = thomas_solve_const(a_l, a_c, a_u, rhs)

        if american:
            # Ikonen–Toivanen: v = max(payoff, tilde - dt*lam_old);
            # lam_new = max(0, lam_old + (payoff - tilde)/dt).
            v_cand = tilde - dt * lam
            v_int = jnp.maximum(payoff_int, v_cand)
            lam = jnp.maximum(lam + (payoff_int - tilde) / dt, 0.0)
        else:
            v_int = tilde

        v_new = jnp.concatenate([v_min[None], v_int, v_max[None]])

        if barrier is not None:
            rebate_pv = jnp.where(
                barrier.rebate_at_hit,
                barrier.rebate,
                barrier.rebate * jnp.exp(-barrier.rebate_rate * sch.tau_next),
            )
            v_new = jnp.where(sch.monitor & out_mask, rebate_pv, v_new)

        if with_dividends:
            spline = natural_cubic_spline(s, v_new)
            v_shift = cubic_spline_eval(spline, s - sch.div_amount)
            if exercise_call_at_div:
                # American calls may exercise just before ex-div
                v_shift_c = jnp.where(
                    dyn.is_call, jnp.maximum(v_shift, payoff), v_shift
                )
            else:
                v_shift_c = v_shift
            has_div = sch.div_amount != 0.0
            v_new = jnp.where(has_div, v_shift_c, v_new)

        return (v_new, lam), None

    lam0 = jnp.zeros(n_nodes - 2, dtype)
    (v_final, _), _ = lax.scan(step, (v0, lam0), schedule)
    return v_final, s
