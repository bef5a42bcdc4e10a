"""Curve-driven discrete-barrier Monte Carlo pricer (JAX device path).

Capability parity with the reference's vectorised MC
(mc_discrete_barrier_option.py:160-425 and the twin in
class_yield.py:82-230):

- event grid = valuation ∪ dividend dates ∪ monitor dates ∪ maturity, with
  maturity always monitored when ``include_maturity_monitor``;
- per-interval drift from the forward curve's forward NACC,
  drift = (carry - sigma^2/2) tau, diffusion sigma sqrt(tau);
- barrier tolerance band max(abs_tol, |H| * tol_bps * 1e-4); down breaches
  at s <= H + band, up at s >= H - band;
- dividend-before/after-monitor ordering flag, spot floored after drops;
- KO alive-mask with rebate at hit (PV at the hit step's grid date) or at
  expiry; KI hit-mask; antithetic pair averaging; price/stderr/CI95.

TPU-first: the host resolves dates/curves into per-step arrays; the path
engine is one ``lax.scan`` over events with all paths vectorized, threefry
counter RNG (chunk-free — memory permitting the full batch runs at once),
and pair-averaged Welford statistics reduced on device.
"""
from __future__ import annotations

import datetime as dt
import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...utils.curves import DailyNacaCurve

OptionType = str  # "call" | "put"


@dataclass(frozen=True)
class BarrierSpec:
    barrier_type: str  # none | down-and-out | up-and-out | down-and-in | up-and-in
    level: Optional[float] = None
    tol_bps: float = 0.0
    abs_tol: float = 0.0


@dataclass(frozen=True)
class RebateSpec:
    amount: float = 0.0
    rebate_at_hit: bool = False


@dataclass(frozen=True)
class MCConfig:
    n_paths: int = 200_000
    seed: int = 42
    antithetic: bool = True
    chunk_size: int = 50_000  # kept for API parity; device path is chunk-free
    dividend_before_monitor: bool = True
    spot_floor: float = 1e-12


def _barrier_band(level: float, tol_bps: float, abs_tol: float) -> float:
    return max(abs_tol, abs(level) * (tol_bps * 1e-4))


def build_event_grid(
    valuation: dt.date,
    maturity: dt.date,
    dividends: Sequence[Tuple[dt.date, float]],
    monitor_dates: Sequence[dt.date],
    include_maturity_monitor: bool = True,
):
    if maturity <= valuation:
        raise ValueError("maturity must be after valuation.")
    div_map: Dict[dt.date, float] = {}
    for d, amt in dividends:
        if valuation < d <= maturity and float(amt) != 0.0:
            div_map[d] = div_map.get(d, 0.0) + float(amt)
    monitor_set = {d for d in monitor_dates if valuation < d <= maturity}
    if include_maturity_monitor:
        monitor_set.add(maturity)
    grid = sorted({valuation, maturity, *div_map.keys(), *monitor_set})
    return grid, div_map, monitor_set


@partial(
    jax.jit,
    static_argnames=(
        "n_obs", "is_call", "barrier_kind", "antithetic", "dividend_before_monitor",
        "rebate_at_hit",
    ),
)
def _simulate_kernel(
    key,
    n_obs: int,
    spot,
    strike,
    drift,  # (n_steps,)
    diff,  # (n_steps,)
    div_amt,  # (n_steps,)
    is_mon,  # (n_steps,) bool
    step_df,  # (n_steps,) discount factor at each step's grid date
    level,
    band,
    df_t,
    rebate_amount,
    spot_floor,
    is_call: bool,
    barrier_kind: str,  # "none"|"down-out"|"up-out"|"down-in"|"up-in"
    antithetic: bool,
    dividend_before_monitor: bool,
    rebate_at_hit: bool,
):
    n_steps = drift.shape[0]
    z = jax.random.normal(key, (n_obs, n_steps), dtype=drift.dtype)

    def run(z_signed):
        def body(carry, idx):
            s, alive, hit, hit_df = carry
            s = s * jnp.exp(drift[idx] + diff[idx] * z_signed[:, idx])
            if dividend_before_monitor:
                s = jnp.where(div_amt[idx] != 0.0, jnp.maximum(s - div_amt[idx], spot_floor), s)
            if barrier_kind != "none":
                if barrier_kind.startswith("down"):
                    breached = s <= (level + band)
                else:
                    breached = s >= (level - band)
                breached = breached & is_mon[idx]
                if barrier_kind.endswith("out"):
                    newly = alive & breached
                    hit_df = jnp.where(newly, step_df[idx], hit_df)
                    alive = alive & ~breached
                else:
                    hit = hit | breached
            if not dividend_before_monitor:
                s = jnp.where(div_amt[idx] != 0.0, jnp.maximum(s - div_amt[idx], spot_floor), s)
            return (s, alive, hit, hit_df), None

        s0 = jnp.full((n_obs,), spot, dtype=drift.dtype)
        alive0 = jnp.ones((n_obs,), bool)
        hit0 = jnp.zeros((n_obs,), bool)
        hit_df0 = jnp.zeros((n_obs,), drift.dtype)
        (s_t, alive, hit, hit_df), _ = lax.scan(
            body, (s0, alive0, hit0, hit_df0), jnp.arange(n_steps)
        )

        vanilla = jnp.where(is_call, jnp.maximum(s_t - strike, 0.0), jnp.maximum(strike - s_t, 0.0))
        if barrier_kind == "none":
            return df_t * vanilla
        if barrier_kind.endswith("out"):
            out = jnp.where(alive, df_t * vanilla, 0.0)
            if rebate_at_hit:
                out = jnp.where(~alive, rebate_amount * hit_df, out)
            else:
                out = jnp.where(~alive, rebate_amount * df_t, out)
            return out
        # knock-in: vanilla iff hit, plus the RR-convention rebate paid at
        # expiry iff the barrier is NEVER hit (reiner_rubinstein term E /
        # equity_barrier semantics). The reference MC drops this leg
        # (mc_discrete_barrier_option.py:386-387 — rebate is KO-only
        # there), which made MC-vs-analytic cross-checks of rebated KI
        # options report a false discrepancy of R*DF*P(no hit).
        hitf = hit.astype(vanilla.dtype)
        return df_t * vanilla * hitf + rebate_amount * df_t * (1.0 - hitf)

    p = run(z)
    if antithetic:
        p = 0.5 * (p + run(-z))
    mean = jnp.mean(p)
    stderr = jnp.std(p, ddof=1) / jnp.sqrt(n_obs)
    return mean, stderr


def price_discrete_barrier_mc(
    *,
    spot: float,
    strike: float,
    vol: float,
    option_type: OptionType,
    valuation: dt.date,
    maturity: dt.date,
    discount_curve,
    forward_curve=None,
    dividends: Sequence[Tuple[dt.date, float]] = (),
    monitor_dates: Sequence[dt.date] = (),
    barrier: BarrierSpec = BarrierSpec("none"),
    rebate: RebateSpec = RebateSpec(),
    cfg: MCConfig = MCConfig(),
    include_maturity_monitor: bool = True,
) -> Dict[str, object]:
    """Price a discretely-monitored barrier option by MC on device.

    Returns {"price", "stderr", "ci95"/"ci_95", "n_obs"/"n_observations",
    "steps", "barrier_type", "barrier_band", "antithetic", "grid_points"}
    — a superset of the reference's result dict
    (mc_discrete_barrier_option.py:407-425), with both its key spellings
    and this module's shorter aliases.
    """
    if not isinstance(discount_curve, DailyNacaCurve):
        discount_curve = DailyNacaCurve(discount_curve, valuation)
    fwd = forward_curve
    if fwd is not None and not isinstance(fwd, DailyNacaCurve):
        fwd = DailyNacaCurve(fwd, valuation)
    fwd = fwd or discount_curve

    grid, div_map, mon_set = build_event_grid(
        valuation, maturity, dividends, monitor_dates, include_maturity_monitor
    )
    n_steps = len(grid) - 1
    drift = np.empty(n_steps)
    diff = np.empty(n_steps)
    div_amt = np.zeros(n_steps)
    is_mon = np.zeros(n_steps, bool)
    step_df = np.empty(n_steps)
    for i in range(n_steps):
        d0, d1 = grid[i], grid[i + 1]
        tau = discount_curve.year_fraction(d0, d1)
        carry = fwd.get_forward_nacc_rate(d0, d1)
        drift[i] = (carry - 0.5 * vol * vol) * tau
        diff[i] = vol * math.sqrt(max(tau, 0.0))
        div_amt[i] = div_map.get(d1, 0.0)
        is_mon[i] = d1 in mon_set
        step_df[i] = discount_curve.get_discount_factor(d1)
    df_t = discount_curve.get_discount_factor(maturity)

    bt = barrier.barrier_type
    if bt != "none":
        if barrier.level is None:
            raise ValueError("Barrier level required.")
        band = _barrier_band(barrier.level, barrier.tol_bps, barrier.abs_tol)
        level = float(barrier.level)
        kind = {"down-and-out": "down-out", "up-and-out": "up-out",
                "down-and-in": "down-in", "up-and-in": "up-in"}[bt]
    else:
        band, level, kind = 0.0, 0.0, "none"

    n_obs = cfg.n_paths // 2 if cfg.antithetic else cfg.n_paths
    key = jax.random.PRNGKey(cfg.seed)
    f = jnp.asarray
    mean, stderr = _simulate_kernel(
        key, n_obs, f(float(spot)), f(float(strike)), f(drift), f(diff),
        f(div_amt), f(is_mon), f(step_df), f(level), f(band), f(df_t),
        f(float(rebate.amount)), f(cfg.spot_floor),
        option_type == "call", kind, cfg.antithetic,
        cfg.dividend_before_monitor, rebate.rebate_at_hit,
    )
    price, se = float(mean), float(stderr)
    ci = (price - 1.96 * se, price + 1.96 * se)
    return {
        "price": price,
        "stderr": se,
        "ci95": ci,
        "ci_95": ci,  # the reference's key (mc_discrete_barrier_option.py)
        "n_obs": int(n_obs),
        "n_observations": int(n_obs),  # reference key
        "steps": int(n_steps),  # reference key (event-grid steps)
        "barrier_type": bt,
        "barrier_band": float(band),
        "antithetic": cfg.antithetic,
        "grid_points": len(grid),
    }
