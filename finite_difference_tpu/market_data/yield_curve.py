"""Pathwise yield curves and curve interpolators.

Reconstruction of the reference's absent ``market_data/yield_curve.py`` and
``utils/interpolation.hermite_rt_interp`` (interfaces from ir_swap.py:249-253,
test_1.py:11): a curve is (year_fracs (n_tenors,), zero rates
(n_paths, n_tenors), interpolator), vectorized across simulation paths.

- ``linear_interp``     : linear in the zero rate;
- ``hermite_rt_interp`` : cubic Hermite with Bessel tangents on r(t)*t
  (the RiskFlow 'HermiteRT' convention) — interpolating the log-discount
  preserves forward-rate smoothness;
- discount factors DF(t) = exp(-r(t) * t) (continuous compounding);
- ``forward_rate(t0, t1, tau)`` = (DF(t0)/DF(t1) - 1) / tau (simple).

All query shapes broadcast: rates (n_paths, n_tenors) x query (m,) ->
(n_paths, m). Flat extrapolation outside the tenor range.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def _interp_core(x: np.ndarray, y: np.ndarray, xq: np.ndarray, hermite: bool):
    """y (n_paths, n) over nodes x (n,) evaluated at xq (m,)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if y.ndim == 1:
        y = y[None, :]
    xq = np.clip(np.asarray(xq, dtype=np.float64), x[0], x[-1])

    if x.size == 1:
        return np.broadcast_to(y[:, :1], (y.shape[0], xq.size)).copy()

    j = np.clip(np.searchsorted(x, xq, side="right"), 1, x.size - 1)
    i = j - 1
    h = x[j] - x[i]
    t = (xq - x[i]) / np.where(h == 0.0, 1.0, h)

    if not hermite:
        return (1.0 - t)[None, :] * y[:, i] + t[None, :] * y[:, j]

    # Bessel tangents: weighted average of adjacent secant slopes; parabolic
    # (2d - m) end conditions.
    hs = np.diff(x)  # (n-1,)
    d = np.diff(y, axis=1) / hs[None, :]  # (n_paths, n-1)
    m = np.empty_like(y)
    if x.size > 2:
        w = hs[None, 1:] * d[:, :-1] + hs[None, :-1] * d[:, 1:]
        m[:, 1:-1] = w / (hs[:-1] + hs[1:])[None, :]
        m[:, 0] = 2.0 * d[:, 0] - m[:, 1]
        m[:, -1] = 2.0 * d[:, -1] - m[:, -2]
    else:
        m[:, 0] = d[:, 0]
        m[:, -1] = d[:, -1]

    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    return (
        h00[None, :] * y[:, i]
        + (h10 * h)[None, :] * m[:, i]
        + h01[None, :] * y[:, j]
        + (h11 * h)[None, :] * m[:, j]
    )


def linear_interp(year_fracs, rates, t_query) -> np.ndarray:
    """Linear interpolation of the zero rate."""
    return _interp_core(year_fracs, rates, t_query, hermite=False)


def hermite_rt_interp(year_fracs, rates, t_query) -> np.ndarray:
    """Hermite-Bessel interpolation on r*t, returned as a zero rate."""
    x = np.asarray(year_fracs, dtype=np.float64)
    r = np.asarray(rates, dtype=np.float64)
    if r.ndim == 1:
        r = r[None, :]
    tq = np.asarray(t_query, dtype=np.float64)
    rt = _interp_core(x, r * x[None, :], tq, hermite=True)
    safe_t = np.where(np.clip(tq, x[0], x[-1]) == 0.0, 1.0, np.clip(tq, x[0], x[-1]))
    out = rt / safe_t[None, :]
    # r(0) limit: fall back to the first node's rate
    at_zero = np.clip(tq, x[0], x[-1]) == 0.0
    if at_zero.any():
        out[:, at_zero] = r[:, :1]
    return out


class YieldCurve:
    """Pathwise zero-rate curve (market_data/yield_curve.py reconstruction).

    Parameters
    ----------
    year_fracs : (n_tenors,) node year fractions from the curve anchor.
    rates : (n_paths, n_tenors) continuously-compounded zero rates.
    interpolator : callable (year_fracs, rates, t_query) -> (n_paths, m);
        defaults to :func:`hermite_rt_interp`.
    """

    def __init__(
        self,
        year_fracs,
        rates,
        interpolator: Optional[Callable] = None,
    ) -> None:
        self.year_fracs = np.asarray(year_fracs, dtype=np.float64)
        r = np.asarray(rates, dtype=np.float64)
        self.rates = r[None, :] if r.ndim == 1 else r
        self.interpolator = interpolator or hermite_rt_interp

    @property
    def n_paths(self) -> int:
        return self.rates.shape[0]

    def zero_rate(self, t_query) -> np.ndarray:
        t = np.atleast_1d(np.asarray(t_query, dtype=np.float64))
        return self.interpolator(self.year_fracs, self.rates, t)

    def discount_factor(self, t_query) -> np.ndarray:
        """DF(0 -> t) per path: (n_paths, m)."""
        t = np.atleast_1d(np.asarray(t_query, dtype=np.float64))
        r = self.zero_rate(t)
        return np.exp(-r * np.maximum(t, 0.0)[None, :])

    def forward_rate(self, t_start: float, t_end: float, tau: Optional[float] = None):
        """Simple forward rate over [t_start, t_end]: (n_paths,)."""
        if tau is None:
            tau = t_end - t_start
        df = self.discount_factor(np.array([t_start, t_end]))
        if tau <= 0.0:
            return np.zeros(self.n_paths)
        return (df[:, 0] / df[:, 1] - 1.0) / float(tau)

    def forward_nacc_rate(self, t_start: float, t_end: float):
        """Continuously-compounded forward rate over [t_start, t_end]."""
        tau = t_end - t_start
        if tau <= 0.0:
            return np.zeros(self.n_paths)
        df = self.discount_factor(np.array([t_start, t_end]))
        return np.log(df[:, 0] / df[:, 1]) / tau
