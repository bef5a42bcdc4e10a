"""Batched (jit + elementwise) analytic sweep APIs — the SURVEY §2.2 ⚡
batch targets.

The reference prices its analytic engines one trade at a time in Python
loops (barrier_engine.py:17-193 per-__init__ factor computation;
discrete_barrier_bgk.py:99-1136 per-instance routing). Every formula in
this package is already elementwise jnp; this module adds the first-class
struct-of-arrays sweep layer on top:

- :func:`continuous_barrier_sweep` — Reiner-Rubinstein singles, image-series
  doubles and vanillas in ONE device program, selected per-trade by masks
  (mixed tables price in one launch; the unselected branch lanes are
  sanitized so no NaNs leak through ``jnp.where``).
- :func:`continuous_barrier_sweep_greeks` — batched bump greeks (the
  reference's convention: central spot bumps, one-sided vol bump per
  vol-POINT to match the PDE driver's vega scale).
- :func:`bgk_discrete_sweep` — BGK/Hörfelt discretely-monitored barrier
  prices (single + double OUT closed forms, IN via Black-76 parity,
  ``already_hit`` short-circuits, rebate legs incl. the per-monitor hazard
  PV) over trade arrays (discrete_barrier_bgk.py:248-336, 929-1016).
- :func:`bs93_sweep` / :func:`bs2002_sweep` — American-approximation sweeps.
- :func:`monitoring_decision` — the host-side FIS n_lim rule
  (discrete_barrier_analytic_pricer.py:278-342) vectorised over trades, so
  runners can route continuous-regime trades here and the rest to the CN
  batch engine (models.pde.batch).

All functions accept numpy or jax arrays (broadcast elementwise) and jit
on first call per output-structure.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bgk_horfelt import (
    BETA_BGK,
    bgk_shift_mag,
    double_barrier_out_price,
    hazard_rebate_pv,
    single_barrier_out_price,
)
from .bjerksund_stensland import american_price_bs93
from .bjerksund_stensland_2002 import american_call_two_step_2002
from .black_scholes import generalized_bs_price
from .double_barrier import double_barrier_ko_price
from .reiner_rubinstein import barrier_price
from ...ops.special import norm_cdf as N


def _one_side(side, B):
    if side is None:
        return np.full(B, np.nan)
    arr = np.asarray(side)
    if arr.dtype == object or arr.dtype.kind not in "fiu":
        # None-padded python list: replace None lane-wise (slow path)
        arr = np.asarray(
            [np.nan if x is None else x for x in np.atleast_1d(arr)],
            dtype=np.float64,
        )
    return np.atleast_1d(arr.astype(np.float64, copy=False))


def _mask_arrays(lower, upper, B=None):
    """(lower, upper, has_lower, has_upper) from optional/NaN-padded input.

    Numeric arrays (NaN marking absent barriers) take a zero-copy fast
    path; Python lists with ``None`` entries are converted lane-wise."""
    lo = _one_side(lower, B)
    up = _one_side(upper, B)
    has_lo = np.isfinite(lo)
    has_up = np.isfinite(up)
    return np.where(has_lo, lo, 0.0), np.where(has_up, up, 0.0), has_lo, has_up


@partial(jax.jit, static_argnames=("rebate_timing_in", "rebate_timing_out", "double_m"))
def _continuous_sweep_kernel(
    s, k, t, r, b, sigma, lower, upper, has_lower, has_upper,
    is_call, is_in, rebate, crossed,
    rebate_timing_in: str, rebate_timing_out: str, double_m: int,
):
    s, k, t, r, b, sigma, lower, upper, rebate = jnp.broadcast_arrays(
        *map(jnp.asarray, (s, k, t, r, b, sigma, lower, upper, rebate))
    )
    has_lower, has_upper, is_call, is_in, crossed = (
        jnp.broadcast_to(jnp.asarray(v), s.shape)
        for v in (has_lower, has_upper, is_call, is_in, crossed)
    )
    single = has_lower ^ has_upper
    double = has_lower & has_upper

    # single barrier: sanitize unselected lanes to h=s (finite logs)
    h = jnp.where(has_upper, upper, lower)
    h_safe = jnp.where(single, h, s)
    p_single = barrier_price(
        s, k, h_safe, t, r, b, sigma, is_call,
        is_up=has_upper, is_in=is_in, rebate=rebate,
        rebate_timing_in=rebate_timing_in,
        rebate_timing_out=rebate_timing_out,
        crossed=crossed,
    )

    lo_safe = jnp.where(double, lower, 0.5 * s)
    up_safe = jnp.where(double, upper, 2.0 * s)
    ko_double = double_barrier_ko_price(
        s, k, lo_safe, up_safe, t, r, b, sigma, is_call, m=double_m
    )
    vanilla = generalized_bs_price(s, k, sigma, t, r, b, is_call)
    p_double = jnp.where(is_in, vanilla - ko_double, ko_double)
    # crossed double: IN -> vanilla, OUT -> 0 (+rebate at expiry if timed so)
    p_double = jnp.where(
        crossed,
        jnp.where(is_in, vanilla, 0.0),
        p_double,
    )

    return jnp.where(single, p_single, jnp.where(double, p_double, vanilla))


def continuous_barrier_sweep(
    s, k, t, r, b, sigma,
    lower=None, upper=None,
    is_call=True, is_in=False, rebate=0.0, crossed=False,
    rebate_timing_in: str = "expiry", rebate_timing_out: str = "hit",
    double_m: int = 5,
):
    """Continuous-barrier prices for a mixed trade table in one launch.

    ``lower``/``upper``: arrays with None/NaN marking absent barriers —
    exactly one set => Reiner-Rubinstein single (up if ``upper``); both =>
    image-series double KO (KI via parity; rebates not supported on
    doubles, matching the reference's DoubleBarrier); neither => vanilla.
    """
    B = np.shape(np.atleast_1d(np.asarray(s, dtype=np.float64)))[0]
    lo, up, has_lo, has_up = _mask_arrays(lower, upper, B)
    return _continuous_sweep_kernel(
        s, k, t, r, b, sigma, lo, up, has_lo, has_up,
        np.asarray(is_call), np.asarray(is_in),
        np.asarray(rebate, dtype=np.float64), np.asarray(crossed),
        rebate_timing_in=rebate_timing_in,
        rebate_timing_out=rebate_timing_out,
        double_m=double_m,
    )


@partial(
    jax.jit,
    static_argnames=(
        "rebate_timing_in", "rebate_timing_out", "double_m", "greeks_mode"
    ),
)
def _continuous_greeks_kernel(
    s, k, t, r, b, sigma, lower, upper, has_lower, has_upper,
    is_call, is_in, rebate, crossed,
    rebate_timing_in: str, rebate_timing_out: str, double_m: int,
    rel_spot_bump, abs_vol_bump, greeks_mode: str = "bump",
):
    px = lambda s_, sig_: _continuous_sweep_kernel(
        s_, k, t, r, b, sig_, lower, upper, has_lower, has_upper,
        is_call, is_in, rebate, crossed,
        rebate_timing_in, rebate_timing_out, double_m,
    )
    s = jnp.asarray(s)
    if greeks_mode == "ad":
        # Exact derivatives of the closed forms. The kernel is elementwise
        # over trades, so grad-of-sum is the per-trade derivative: one
        # reverse pass yields delta AND vega together; gamma is the Hessian
        # diagonal via forward-over-reverse with a ones tangent.
        sig = jnp.broadcast_to(jnp.asarray(sigma, s.dtype), jnp.broadcast_shapes(
            s.shape, jnp.shape(jnp.asarray(sigma))
        ))
        s_b = jnp.broadcast_to(s, sig.shape)
        psum = lambda s_, sig_: jnp.sum(px(s_, sig_))
        base = px(s_b, sig)
        delta, dvdsig = jax.grad(psum, argnums=(0, 1))(s_b, sig)
        delta_fn = lambda s_: jax.grad(lambda ss: jnp.sum(px(ss, sig)))(s_)
        gamma = jax.jvp(delta_fn, (s_b,), (jnp.ones_like(s_b),))[1]
        return {
            "price": base,
            "delta": delta,
            "gamma": gamma,
            # per vol-POINT, matching the PDE driver's vega scale
            "vega": dvdsig / 100.0,
        }
    ds = jnp.maximum(1e-8, rel_spot_bump * s)
    base = px(s, sigma)
    up_px = px(s + ds, sigma)
    dn_px = px(s - ds, sigma)
    v_up = px(s, jnp.asarray(sigma) + abs_vol_bump)
    return {
        "price": base,
        "delta": (up_px - dn_px) / (2.0 * ds),
        "gamma": (up_px - 2.0 * base + dn_px) / (ds * ds),
        # one-sided bump per vol-POINT: the PDE batch driver's convention
        # (discrete_barrier_fdm_pricer.py:896)
        "vega": (v_up - base) / (abs_vol_bump * 100.0),
    }


def continuous_barrier_sweep_greeks(
    s, k, t, r, b, sigma,
    lower=None, upper=None,
    is_call=True, is_in=False, rebate=0.0, crossed=False,
    rebate_timing_in: str = "expiry", rebate_timing_out: str = "hit",
    double_m: int = 5,
    rel_spot_bump: float = 1e-4, abs_vol_bump: float = 1e-4,
    greeks_mode: str = "bump",
) -> Dict[str, jnp.ndarray]:
    """Batched price+delta+gamma+vega for the continuous sweep.

    ``greeks_mode``: 'bump' (default — the reference's central-spot /
    one-sided-vol convention) or 'ad' (exact jax derivatives of the closed
    forms in one reverse pass + one Hessian-diagonal jvp: no bump-h
    truncation at the same measured cost as the bumps; see
    docs/PERF_NOTES.md "Batched analytic sweep").
    """
    B = np.shape(np.atleast_1d(np.asarray(s, dtype=np.float64)))[0]
    lo, up, has_lo, has_up = _mask_arrays(lower, upper, B)
    return _continuous_greeks_kernel(
        s, k, t, r, b, sigma, lo, up, has_lo, has_up,
        np.asarray(is_call), np.asarray(is_in),
        np.asarray(rebate, dtype=np.float64), np.asarray(crossed),
        rebate_timing_in, rebate_timing_out, double_m,
        rel_spot_bump, abs_vol_bump, greeks_mode=greeks_mode,
    )


@partial(jax.jit, static_argnames=("series_terms",))
def _bgk_sweep_kernel(
    s_eff, spot, strike, forward, mu, sigma, t, df, m,
    lower, upper, has_lower, has_upper, is_call, is_in,
    already_hit, rebate, rebate_at_hit,
    monitor_cum_t, monitor_dfs,
    series_terms: int,
):
    arrs = jnp.broadcast_arrays(
        *map(
            jnp.asarray,
            (s_eff, spot, strike, forward, mu, sigma, t, df, m, lower, upper, rebate),
        )
    )
    s_eff, spot, strike, forward, mu, sigma, t, df, m, lower, upper, rebate = arrs
    has_lower, has_upper, is_call, is_in, already_hit, rebate_at_hit = (
        jnp.broadcast_to(jnp.asarray(v), s_eff.shape)
        for v in (has_lower, has_upper, is_call, is_in, already_hit, rebate_at_hit)
    )
    single = has_lower ^ has_upper
    double = has_lower & has_upper
    is_up = has_upper & ~double

    shift = bgk_shift_mag(jnp.maximum(m, 1.0))

    h = jnp.where(is_up, upper, lower)
    h_safe = jnp.where(single, h, jnp.where(is_up, 2.0 * s_eff, 0.5 * s_eff))
    out_single = single_barrier_out_price(
        s_eff, strike, h_safe, forward, mu, sigma, t, df, m,
        is_call, is_up, spot=spot, shift_mag=shift,
    )
    lo_safe = jnp.where(double, lower, 0.5 * s_eff)
    up_safe = jnp.where(double, upper, 2.0 * s_eff)
    out_double = double_barrier_out_price(
        s_eff, strike, lo_safe, up_safe, forward, mu, sigma, t, df, m,
        is_call, series_terms=series_terms, shift_mag=shift,
    )

    vol = jnp.maximum(sigma * jnp.sqrt(t), 1e-12)
    d1 = (jnp.log(jnp.maximum(forward, 1e-300) / jnp.maximum(strike, 1e-300)) + 0.5 * vol**2) / vol

    vanilla = df * jnp.where(
        is_call,
        forward * N(d1) - strike * N(d1 - vol),
        strike * N(-(d1 - vol)) - forward * N(-d1),
    )

    out_px = jnp.where(double, out_double, jnp.where(single, out_single, vanilla))
    out_px = jnp.where(m <= 0, vanilla, out_px)  # no monitors => vanilla

    # rebate leg, OUT only (discrete_barrier_bgk.py:1107-1130 semantics):
    # at hit -> per-monitor hazard PV sum_k rebate*DF_k*p_k (singles only —
    # the scalar's hit metrics return empty for doubles) on the (B, M)
    # padded monitor grid. Padding rows by repeating the last horizon with
    # df 0 is exact: spurious hazard increments multiply df=0.
    # at expiry -> rebate * df UNCONDITIONALLY (the reference's convention).
    # already_hit -> rebate * df(hit ~ now) = rebate.
    # one implementation of the survival/hazard leg: vmap the scalar
    # pricer's hazard_rebate_pv (bgk_horfelt) over rows with unit rebate
    # so the shift/decomposition conventions can never diverge between
    # the scalar and batched engines
    pv_hit = jax.vmap(
        lambda se, bar, mu_, sg, up_flag, cum_t_row, dfs_row: (
            hazard_rebate_pv(
                se, bar, mu_, sg, cum_t_row, dfs_row, 1.0, up_flag
            )[0]
        )
    )(s_eff, h_safe, mu, sigma, is_up, monitor_cum_t, monitor_dfs)
    rebate_leg = jnp.where(
        rebate_at_hit,
        rebate * jnp.where(single, pv_hit, 0.0),
        rebate * df * jnp.where(single | double, 1.0, 0.0),
    )
    rebate_leg = jnp.where(rebate > 0.0, rebate_leg, 0.0)

    in_px = vanilla - out_px
    price = jnp.where(is_in, in_px, out_px + rebate_leg)
    # already_hit: OUT worth rebate now; IN worth vanilla
    price = jnp.where(
        already_hit,
        jnp.where(is_in, vanilla, jnp.where(rebate_at_hit, rebate, rebate * df)),
        price,
    )
    return price


def bgk_discrete_sweep(
    s_eff, strike, forward, mu, sigma, t, df, m,
    lower=None, upper=None,
    is_call=True, is_in=False,
    spot=None, already_hit=False,
    rebate=0.0, rebate_at_hit=False,
    monitor_cum_t: Optional[np.ndarray] = None,
    monitor_dfs: Optional[np.ndarray] = None,
    series_terms: int = 50,
):
    """BGK/Hörfelt discretely-monitored barrier sweep (Black-76 layout).

    Inputs follow the scalar pricer's resolved quantities
    (bgk_pricer.DiscreteBarrierBGKPricer): ``s_eff`` escrowed spot,
    ``forward`` = F(T_carry), ``mu`` the theta drift, ``df`` = e^{-r T_disc},
    ``m`` monitors per trade (array ok). Rebate-at-hit needs the monitor
    grid: ``monitor_cum_t``/``monitor_dfs`` of shape (B, M) (pad rows by
    repeating the last horizon with df 0 — the padded hazard increments are
    then exactly zero).
    """
    def _shape1(v):
        # barrier args may be None or sequences CONTAINING None (mask
        # entries), so length is read without a float conversion
        if v is None:
            return (1,)
        if isinstance(v, (list, tuple)):
            return (len(v),)
        arr = np.asarray(v)
        return arr.shape if arr.ndim else (1,)

    # the batch size must come from EVERY batched argument — inferring it
    # from the 8 numeric args alone mis-shaped the placeholder monitor
    # grid (vmap size mismatch) whenever only lower/upper or the flag
    # arrays carried the batch dimension
    B = int(
        np.prod(
            np.broadcast_shapes(
                *(
                    _shape1(v)
                    for v in (
                        s_eff, strike, forward, mu, sigma, t, df, m,
                        lower, upper, is_call, is_in, spot, already_hit,
                        rebate, rebate_at_hit,
                    )
                )
            )
        )
    )
    lo, up, has_lo, has_up = _mask_arrays(lower, upper, B)
    if monitor_cum_t is None:
        # rebate-at-hit PV needs the real monitor grid; this placeholder
        # (single horizon T, df 0) makes the at-hit leg evaluate to 0
        monitor_cum_t = np.broadcast_to(
            np.asarray(t, dtype=np.float64).reshape(-1, 1)
            if np.ndim(t)
            else np.full((B, 1), float(t)),
            (B, 1),
        )
        monitor_dfs = np.zeros((B, 1))
    return _bgk_sweep_kernel(
        s_eff, s_eff if spot is None else spot, strike, forward, mu, sigma,
        t, df, np.asarray(m, dtype=np.float64),
        lo, up, has_lo, has_up,
        np.asarray(is_call), np.asarray(is_in), np.asarray(already_hit),
        np.asarray(rebate, dtype=np.float64), np.asarray(rebate_at_hit),
        np.asarray(monitor_cum_t, dtype=np.float64),
        np.asarray(monitor_dfs, dtype=np.float64),
        series_terms=series_terms,
    )


bs93_sweep = jax.jit(american_price_bs93)


@jax.jit
def bs93_sweep_greeks(s, f, k, t, r, sigma, is_call, rel_bump=1e-4):
    """Batched bump greeks, forward held fixed (bjerksund_stensland.py:47-91)."""
    s = jnp.asarray(s)
    ds = s * rel_bump
    base = american_price_bs93(s, f, k, t, r, sigma, is_call)
    up = american_price_bs93(s + ds, f, k, t, r, sigma, is_call)
    dn = american_price_bs93(s - ds, f, k, t, r, sigma, is_call)
    sig = jnp.asarray(sigma)
    dv = sig * rel_bump
    vu = american_price_bs93(s, f, k, t, r, sig + dv, is_call)
    vd = american_price_bs93(s, f, k, t, r, sig - dv, is_call)
    return {
        "price": base,
        "delta": (up - dn) / (2.0 * ds),
        "gamma": (up - 2.0 * base + dn) / (ds * ds),
        "vega": (vu - vd) / (2.0 * dv),
    }


@partial(jax.jit, static_argnames=("variant",))
def bs2002_sweep(s, k, r, b, sigma, t, variant: str = "riskflow_1993"):
    """BS2002 two-step American call sweep; puts via the standard transform
    C(K, S, T, r-b, -b, sigma) applied by the caller (bjerk_stens_new.py).

    vmapped (not broadcast): the Gauss-Legendre bivariate normal CDF
    contracts over fixed quadrature nodes, so each trade maps separately.
    """
    arrs = jnp.broadcast_arrays(*map(jnp.asarray, (s, k, r, b, sigma, t)))
    flat = [a.reshape(-1) for a in arrs]
    fn = lambda s_, k_, r_, b_, sg_, t_: american_call_two_step_2002(
        s_, k_, r_, b_, sg_, t_, variant
    )[0]
    return jax.vmap(fn)(*flat).reshape(arrs[0].shape)


def monitoring_decision(
    t_expiry: np.ndarray,
    monitor_times,
    sigma: np.ndarray,
    n_desired: int = 400,
    n_min_per_interval: int = 1,
    n_lim_multiplier: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorised FIS n_lim rule (discrete_barrier_analytic_pricer.py:278-342).

    ``monitor_times``: per-trade list of monitor year-fractions (host).
    Returns (use_continuous (B,), bgk_adj (B,)) where ``bgk_adj`` is the
    barrier shift factor exp(beta * sigma * sqrt(dt_avg)) — shifted barriers
    are lower/adj and upper*adj.
    """
    t_expiry = np.atleast_1d(np.asarray(t_expiry, dtype=np.float64))
    sigma = np.broadcast_to(np.asarray(sigma, dtype=np.float64), t_expiry.shape)
    B = t_expiry.shape[0]
    use_cont = np.zeros(B, dtype=bool)
    adj = np.ones(B, dtype=np.float64)
    for i in range(B):
        mts = sorted(x for x in monitor_times[i] if 0.0 < x <= t_expiry[i])
        if not mts:
            continue
        dt_eq = t_expiry[i] / max(1, n_desired)
        # intervals between CONSECUTIVE monitors only — deliberately
        # excluding valuation->first-monitor, exactly like the reference
        # decision (discrete_barrier_analytic_pricer.py:301-311) and the
        # hybrid twin (models/pde/hybrid.py). The standalone BGK pricer's
        # _compute_dt_years includes that first interval for ITS shift —
        # a different engine's convention, not this router's.
        intervals = np.diff(mts).tolist() or [t_expiry[i] / len(mts)]
        steps = [
            max(n_min_per_interval, int(round(ti / max(1e-12, dt_eq))))
            for ti in intervals
        ]
        use_cont[i] = sum(steps) > n_lim_multiplier * n_desired
        avg_dt = sum(intervals) / len(intervals)
        adj[i] = np.exp(BETA_BGK * sigma[i] * np.sqrt(max(1e-12, avg_dt)))
    return use_cont, adj
