"""OU / log statistics for time-series panels (RiskFlow calc_statistics).

Capability parity with the reference's ``cs_historical_calibration.py:37-167``
(itself riskflow utils.calc_statistics): per-column OU estimates from daily
levels —

    beta  = Cov(dX, X)/Var(X);  alpha = -N ln(1+beta), clipped
    sigma^2 = [Var(dX) - (1-e^{-a/N})^2 Var(X)] * 2a / (1-e^{-2a/N})
    theta = mean(X) + mean(dX)/(1-e^{-a/N})  (log-theta Jensen-adjusted)

Returns the same stats table ('Volatility', 'Drift', 'Mean Reversion Speed',
'Long Run Mean', 'Reversion Volatility'), the delta correlation matrix, and
the delta panel. ``smooth`` > 0 applies the outlier removal used by the
curve-panel variant (calibrations.py:272-416).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd


def calc_statistics(
    data_frame: pd.DataFrame,
    method: str = "Log",
    num_business_days: float = 252.0,
    max_alpha: float = 4.0,
    smooth: float = 0.0,
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    if method not in ("Log", "Diff"):
        raise ValueError("method must be 'Log' or 'Diff'")

    df = data_frame.copy().sort_index()
    df = df.dropna(axis=0, how="all").dropna(axis=1, how="all")

    if smooth > 0.0:
        med = df.median(axis=0)
        sd = df.std(axis=0, ddof=0)
        mask = (df.sub(med, axis=1).abs()).le(smooth * sd, axis=1)
        df = df.where(mask)
        try:
            df = df.interpolate(method="time")
        except (ValueError, TypeError):
            df = df.interpolate(method="index")
        df = df.ffill().bfill()

    transform = {
        "Diff": lambda x: x,
        "Log": lambda x: np.log(x.clip(0.0001, np.inf)),
    }[method]
    y = transform(df)
    data = y.diff(1).shift(-1)  # dX aligned at t

    def calc_alpha(x, yy):
        beta = ((x - x.mean(axis=0)) * (yy - yy.mean(axis=0))).mean(axis=0) / (
            (yy - yy.mean(axis=0)) ** 2.0
        ).mean(axis=0)
        return (-num_business_days * np.log(1.0 + beta)).clip(0.001, max_alpha)

    def calc_sigma2(x, yy, alpha):
        dt_factor = 1.0 - np.exp(-alpha / num_business_days)
        return (x.var(axis=0) - (dt_factor**2) * yy.var(axis=0)) * (
            2.0 * alpha
        ) / (1.0 - np.exp(-2.0 * alpha / num_business_days))

    def calc_theta(x, yy, alpha):
        return yy.mean(axis=0) + x.mean(axis=0) / (
            1.0 - np.exp(-alpha / num_business_days)
        )

    alpha = calc_alpha(data, y)
    theta = calc_theta(data, y, alpha)
    sigma2 = calc_sigma2(data, y, alpha)

    if method == "Log":
        theta = np.exp(theta + sigma2 / (4.0 * alpha))
        theta = theta.replace([np.inf, -np.inf], np.nan)
        median = theta.median()
        theta[np.abs(theta - median) > (2 * theta.std())] = np.nan

    stats = pd.DataFrame(
        {
            "Volatility": data.std(axis=0) * np.sqrt(num_business_days),
            "Drift": data.mean(axis=0) * num_business_days,
            "Mean Reversion Speed": alpha,
            "Long Run Mean": theta,
            "Reversion Volatility": np.sqrt(sigma2.clip(0.0)),
        }
    )
    correlation = data.corr()
    return stats, correlation, data


def parse_tenor_labels(labels) -> np.ndarray:
    """Tenor year-fractions from panel column labels ('NAME,2.0' or plain
    numeric). Parse from the STATS index (the columns that survived
    calc_statistics' all-NaN drop), never the original panel columns —
    zipping original labels against surviving stats silently shifts every
    volatility/yield after a dropped column onto the wrong tenor."""
    return np.array(
        [
            float(str(x).split(",")[1]) if "," in str(x) else float(x)
            for x in labels
        ],
        dtype=np.float64,
    )


def force_positive_shift(curve_panel: pd.DataFrame) -> float:
    """RiskFlow positivity shift: 0 if all positive else -5*min
    (calibrate_hw1f_interest_rate.py:29-35)."""
    min_rate = float(curve_panel.min().min())
    return 0.0 if min_rate > 0.0 else -5.0 * min_rate
