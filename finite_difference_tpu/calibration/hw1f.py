"""Hull-White 1-factor interest-rate calibration.

Capability parity with the reference's ``calibrate_hw1f_interest_rate.py``
(:1-155 calibration, :157-228 extraction, :230-369 comparison): the
pre-computed-statistics-averaging method — force_positive shift, per-tenor
OU stats, scalar Alpha = mean of per-tenor alphas, Sigma stored as a
.Curve, Historical_Yield per tenor.
"""
from __future__ import annotations

import json
import os
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from .statistics import (
    calc_statistics,
    force_positive_shift,
    parse_tenor_labels,
)


def calibrate_hw1f_interest_rate(
    curve_panel: pd.DataFrame,
    num_business_days: float = 252.0,
    smooth: float = 0.0,
    frequency: int = 1,
    max_alpha: float = 4.0,
    rate_drift_model: str = "Drift_To_Forward",
    distribution_type: str = "Lognormal",
) -> Tuple[OrderedDict, pd.DataFrame, pd.DataFrame]:
    """(param OrderedDict, correlation, delta) from a rates panel."""
    force_positive = force_positive_shift(curve_panel)
    stats, correlation, delta = calc_statistics(
        curve_panel + force_positive,
        method="Log",
        num_business_days=num_business_days,
        max_alpha=max_alpha,
        smooth=smooth,
    )
    # tenors from the SURVIVING columns (all-NaN columns are dropped
    # inside calc_statistics; parsing curve_panel.columns would misalign
    # every tenor after a dropped column)
    tenor = parse_tenor_labels(stats.index)

    mean_reversion_speed = float(stats["Mean Reversion Speed"].mean())
    sigma_curve = stats["Reversion Volatility"].interpolate()
    reversion_level = stats["Long Run Mean"].interpolate().bfill().ffill()

    param = OrderedDict(
        {
            "Lambda": 0.0,
            "Alpha": mean_reversion_speed,
            "Sigma": {
                ".Curve": {
                    "meta": [],
                    "data": list(zip(tenor.tolist(), sigma_curve.values.tolist())),
                }
            },
            "Historical_Yield": list(
                zip(tenor.tolist(), reversion_level.values.tolist())
            ),
            "Quanto_FX_Correlation": 0.0,
            "Quanto_FX_Volatility": 0.0,
            "Rate_Drift_Model": rate_drift_model,
            "Distribution_Type": distribution_type,
            "Force_Positive": force_positive,
        }
    )
    return param, correlation, delta


def _unpack_curve(raw):
    from .curve_data import unpack_curve_rows

    return unpack_curve_rows(raw)


def extract_hw1f_params(filepath: str, asset_names: Union[str, List[str]]) -> Dict:
    """HullWhite1FactorInterestRateModel params from MarketData.json
    (extract_hw1f_params.py:1-74)."""
    if isinstance(asset_names, str):
        asset_names = [asset_names]
    if not os.path.exists(filepath):
        raise FileNotFoundError(f"File not found: {filepath}")
    with open(filepath, "r", encoding="utf-8") as f:
        market_data = json.load(f)
    price_models = market_data.get("MarketData", {}).get("Price Models", {})

    results = {}
    for asset_name in asset_names:
        if asset_name not in price_models:
            continue
        model = price_models[asset_name]
        results[asset_name] = {
            "Lambda": model.get("Lambda"),
            "Alpha": model.get("Alpha"),
            "Sigma": _unpack_curve(model.get("Sigma")),
            "Quanto_FX_Correlation": model.get("Quanto_FX_Correlation"),
            "Quanto_FX_Volatility": model.get("Quanto_FX_Volatility"),
        }
    return results


def compare_hw1f_params(
    calibrated_param, extracted_param, asset_name: str,
    output_path: Optional[str] = None,
) -> pd.DataFrame:
    """Alpha/Sigma comparison table (compare_hw1f_params, :230-369)."""
    ext = extracted_param.get(asset_name, extracted_param)
    cal = getattr(calibrated_param, "param", calibrated_param)

    def curve_to_dict(pairs):
        pairs = _unpack_curve(pairs) if not isinstance(pairs, list) else pairs
        return {float(p[0]): float(p[1]) for p in pairs} if pairs else {}

    rows = []
    cal_alpha, ext_alpha = cal.get("Alpha"), ext.get("Alpha")
    rows.append(
        {
            "Parameter": "Alpha (Mean Reversion Speed)",
            "Tenor": "scalar",
            "Calibrated": cal_alpha,
            "Extracted": ext_alpha,
        }
    )
    cal_sigma = curve_to_dict(cal.get("Sigma"))
    ext_sigma = curve_to_dict(ext.get("Sigma"))
    for t in sorted(set(cal_sigma) | set(ext_sigma)):
        rows.append(
            {
                "Parameter": "Sigma",
                "Tenor": t,
                "Calibrated": cal_sigma.get(t),
                "Extracted": ext_sigma.get(t),
            }
        )
    df = pd.DataFrame(rows)
    df["Abs_Diff"] = (df["Calibrated"] - df["Extracted"]).abs()
    df["Rel_Diff_Pct"] = (
        df["Abs_Diff"] / df["Extracted"].abs().clip(lower=1e-12) * 100.0
    )
    if output_path:
        df.to_csv(output_path, index=False)
    return df
