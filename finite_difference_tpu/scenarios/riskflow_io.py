"""RiskFlow scenario-DataFrame round-trip and comparison.

Capability parity with cs_simulation.py:1079-1446: conversion between the raw
(n_steps, n_tenors, n_scenarios) array and RiskFlow's scenario DataFrame
layout (rows = MultiIndex (tenor, scenario), columns = scenario dates), CSV
export in RiskFlow's format, extraction of scenario frames from a
Credit_Monte_Carlo output dict, and a moment/path-level/KS comparator.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd


def to_riskflow_dataframe(simulated: np.ndarray, metadata: dict) -> pd.DataFrame:
    """(steps, tenors, scens) array -> RiskFlow scenario DataFrame.

    Mirrors riskflow calculation.report (cs_simulation.py:1079-1122): columns
    are a (tenor excel-day, scenario) MultiIndex product, transposed so rows
    are (tenor, scenario) and columns are the scenario dates.
    """
    tenors_excel = metadata["tenors_excel"]
    base_date = metadata["base_date"]
    scen_time_grid = metadata["scen_time_grid"]
    n_timesteps, _, n_scenarios = simulated.shape

    scenario_dates = pd.DatetimeIndex(
        sorted(base_date + pd.Timedelta(days=int(d)) for d in scen_time_grid)
    )
    columns = pd.MultiIndex.from_product(
        [tenors_excel, np.arange(n_scenarios)], names=["tenor", "scenario"]
    )
    return pd.DataFrame(
        simulated.reshape(n_timesteps, -1),
        index=scenario_dates[:n_timesteps],
        columns=columns,
    ).T


def from_riskflow_dataframe(
    scenario_df: pd.DataFrame, metadata: Optional[dict] = None
) -> Tuple[np.ndarray, np.ndarray, pd.DatetimeIndex]:
    """Inverse of :func:`to_riskflow_dataframe` (cs_simulation.py:1125-1162)."""
    tenors = scenario_df.index.get_level_values("tenor").unique().values
    scenarios = scenario_df.index.get_level_values("scenario").unique().values
    scenario_dates = scenario_df.columns

    simulated = scenario_df.T.values.reshape(
        len(scenario_dates), len(tenors), len(scenarios)
    )
    if metadata is not None:
        metadata["tenors_excel"] = tenors
        metadata["total_scenarios"] = len(scenarios)
        metadata["scenario_dates"] = scenario_dates
    return simulated, tenors, scenario_dates


def export_scenarios_csv(
    scenario_df: pd.DataFrame, filepath: str, factor_name: Optional[str] = None
) -> None:
    """CSV in RiskFlow's export layout (cs_simulation.py:1165-1191)."""
    df_out = scenario_df.copy()
    df_out.columns = [str(d.date()) for d in df_out.columns]
    df_out.to_csv(filepath)


def load_scenarios_csv(filepath) -> pd.DataFrame:
    """Exact inverse of :func:`export_scenarios_csv`.

    Reads the RiskFlow CSV layout back into the scenario-frame shape
    :func:`to_riskflow_dataframe` produces: rows = MultiIndex
    (tenor, scenario), columns = DatetimeIndex of scenario dates. Beyond
    the reference (cs_simulation.py:1165-1191 exports but nothing loads);
    completes the CSV round-trip so exported cubes are re-ingestable by
    ``from_riskflow_dataframe``/``compare_scenario_outputs``.
    """
    df = pd.read_csv(filepath, index_col=[0, 1])
    df.index = df.index.set_names(["tenor", "scenario"])
    df.columns = pd.DatetimeIndex(pd.to_datetime(df.columns))
    return df


def load_riskflow_scenarios(riskflow_output, factor_name: str) -> pd.DataFrame:
    """Pull one factor's scenario frame out of a RiskFlow output dict.

    Handles out['Results']['scenarios'][name], out['scenarios'][name], a
    plain {name: df} dict, an already-extracted DataFrame, or a path to a
    CSV written by :func:`export_scenarios_csv`; falls back to substring
    matching on the factor name (cs_simulation.py:1194-1245).
    """
    if isinstance(riskflow_output, pd.DataFrame):
        return riskflow_output
    if isinstance(riskflow_output, (str, os.PathLike)):
        return load_scenarios_csv(riskflow_output)

    if "Results" in riskflow_output:
        scenarios = riskflow_output["Results"].get("scenarios", {})
    elif "scenarios" in riskflow_output:
        scenarios = riskflow_output["scenarios"]
    else:
        scenarios = riskflow_output

    if factor_name in scenarios:
        return scenarios[factor_name]
    for key, df in scenarios.items():
        if factor_name in str(key) or str(key) in factor_name:
            return df
    raise KeyError(
        f"No scenarios found for {factor_name!r}; available: {list(scenarios.keys())}"
    )


def compare_scenario_outputs(
    df_validation: pd.DataFrame,
    df_riskflow: pd.DataFrame,
    metadata: Optional[dict] = None,
    labels: Tuple[str, str] = ("Validation", "RiskFlow"),
    tol: float = 1e-6,
    verbose: bool = False,
) -> Dict:
    """Moment, path-level, and distributional comparison of two outputs.

    Mirrors cs_simulation.py:1248-1446: per-(tenor, date) cross-scenario
    moments; if the scenario counts match, path-by-path max/mean abs and rel
    diffs plus correlation with a MATCH/MISMATCH verdict at ``tol``;
    otherwise two-sample KS tests. Returns the comparison dict (plots from
    the reference are intentionally dropped — this is a library API).
    """
    from scipy import stats as sp_stats

    tenors_v = df_validation.index.get_level_values(0).unique()
    tenors_r = df_riskflow.index.get_level_values(0).unique()
    scens_v = df_validation.index.get_level_values(1).unique()
    scens_r = df_riskflow.index.get_level_values(1).unique()

    common_tenors = sorted(set(tenors_v) & set(tenors_r))
    common_dates = sorted(set(df_validation.columns) & set(df_riskflow.columns))
    same_scenario_count = len(scens_v) == len(scens_r)

    if not common_tenors:
        return {"error": "no_common_tenors"}
    if not common_dates:
        return {"error": "no_common_dates"}

    moment_records = []
    for tenor in common_tenors:
        block_v = df_validation.loc[tenor]
        block_r = df_riskflow.loc[tenor]
        for date in common_dates:
            vals_v = np.atleast_1d(np.asarray(block_v[date]))
            vals_r = np.atleast_1d(np.asarray(block_r[date]))
            moment_records.append(
                {
                    "tenor": tenor,
                    "date": date,
                    "mean_val": np.mean(vals_v),
                    "mean_rf": np.mean(vals_r),
                    "mean_diff": np.mean(vals_v) - np.mean(vals_r),
                    "std_val": np.std(vals_v, ddof=1),
                    "std_rf": np.std(vals_r, ddof=1),
                    "std_diff": np.std(vals_v, ddof=1) - np.std(vals_r, ddof=1),
                    "p5_val": np.percentile(vals_v, 5),
                    "p5_rf": np.percentile(vals_r, 5),
                    "p95_val": np.percentile(vals_v, 95),
                    "p95_rf": np.percentile(vals_r, 95),
                }
            )
    moment_df = pd.DataFrame(moment_records)

    path_results: Dict = {}
    ks_results: Dict = {}
    verdict = None
    if same_scenario_count:
        for tenor in common_tenors:
            block_v = df_validation.loc[tenor]
            block_r = df_riskflow.loc[tenor]
            for di in {0, len(common_dates) // 2, len(common_dates) - 1}:
                date = common_dates[di]
                vals_v = np.asarray(block_v[date])
                vals_r = np.asarray(block_r[date])
                abs_diff = np.abs(vals_v - vals_r)
                rel_diff = abs_diff / np.maximum(np.abs(vals_r), 1e-10)
                degenerate = (
                    len(vals_v) < 2 or np.std(vals_v) == 0 or np.std(vals_r) == 0
                )
                corr = np.nan if degenerate else np.corrcoef(vals_v, vals_r)[0, 1]
                path_results[(tenor, date)] = {
                    "max_abs_diff": float(np.max(abs_diff)),
                    "mean_abs_diff": float(np.mean(abs_diff)),
                    "max_rel_diff": float(np.max(rel_diff)),
                    "mean_rel_diff": float(np.mean(rel_diff)),
                    "correlation": float(corr),
                }
        max_abs = max(v["max_abs_diff"] for v in path_results.values())
        verdict = "MATCH" if max_abs < tol else "MISMATCH"
        if verbose:
            print(f"Path-level verdict: {verdict} (max abs diff {max_abs:.2e})")
    else:
        for tenor in common_tenors:
            block_v = df_validation.loc[tenor]
            block_r = df_riskflow.loc[tenor]
            for di in {0, len(common_dates) // 2, len(common_dates) - 1}:
                date = common_dates[di]
                ks_stat, ks_p = sp_stats.ks_2samp(
                    np.asarray(block_v[date]), np.asarray(block_r[date])
                )
                ks_results[(tenor, date)] = {
                    "ks_stat": float(ks_stat),
                    "ks_pvalue": float(ks_p),
                    "match": bool(ks_p > 0.05),
                }

    return {
        "moment_df": moment_df,
        "path_results": path_results if same_scenario_count else None,
        "ks_results": ks_results or None,
        "common_tenors": common_tenors,
        "common_dates": common_dates,
        "same_scenario_count": same_scenario_count,
        "verdict": verdict,
    }
