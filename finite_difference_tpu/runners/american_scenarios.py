"""American-option scenario runner.

Capability parity with the reference's ``run_american_scenarios.py:46-316``:
per-scenario ``AmericanFDMPricer`` pricing with FA price/greek diffs from a
config CSV.
"""
from __future__ import annotations

import datetime as dt
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

from ..models.pde.american import AmericanFDMPricer
from ..utils.curves import flat_curve
from ..utils.rates import naca_to_nacc
from .barrier_scenarios import _diff_block


def run_american_scenario(
    scenario_name: str,
    S0: float,
    K: float,
    sigma: float,
    rate: float,
    FA_price: Optional[float],
    FA_delta: Optional[float],
    FA_gamma: Optional[float],
    FA_vega: Optional[float],
    *,
    valuation: dt.date,
    maturity: dt.date,
    opt_type: str = "call",
    trade_number: int = 201871103,
    quantity: int = 1000,
    contract_size: int = 1,
    position: str = "long",
    divs: Optional[list] = None,
    underlying_spot_days: int = 0,
    option_days: int = 0,
    option_settlement_days: int = 0,
    day_count: str = "ACT/365",
    num_space_nodes: int = 500,
    num_time_steps: int = 500,
) -> Dict[str, Any]:
    curve = flat_curve(rate, valuation)
    pricer = AmericanFDMPricer(
        spot=S0,
        strike=K,
        valuation_date=valuation,
        maturity_date=maturity,
        sigma=sigma,
        option_type=opt_type,
        discount_curve=curve,
        forward_curve=curve,
        dividend_schedule=divs or [],
        trade_id=trade_number,
        direction=position,
        quantity=quantity,
        contract_multiplier=contract_size,
        underlying_spot_days=underlying_spot_days,
        option_days=option_days,
        option_settlement_days=option_settlement_days,
        day_count=day_count,
        num_space_nodes=num_space_nodes,
        num_time_steps=num_time_steps,
    )
    model_price = pricer.price_log2()
    greeks = pricer.greeks_log2()

    results: Dict[str, Any] = {
        "scenario_name": scenario_name,
        "S0": S0,
        "K": K,
        "sigma": sigma,
        "rate": rate,
    }
    results.update(_diff_block("price", model_price, FA_price))
    results.update(_diff_block("delta", greeks["delta"], FA_delta))
    results.update(_diff_block("gamma", greeks["gamma"], FA_gamma))
    results.update(_diff_block("vega", greeks["vega"], FA_vega))
    return results


def run_all_american_scenarios(
    config_csv_path: str,
    output_csv_path: Optional[str],
    base_params: Dict[str, Any],
    verbose: bool = False,
) -> pd.DataFrame:
    """Config CSV in, diff table out (run_american_scenarios.py:209-316)."""
    config_df = pd.read_csv(config_csv_path)
    all_results = []
    for _, row in config_df.iterrows():
        nan_to_none = lambda k: row[k] if k in row and pd.notna(row[k]) else None
        result = run_american_scenario(
            scenario_name=row["scenario_name"],
            S0=row["S0"],
            K=row["K"],
            sigma=row["sigma"],
            rate=row["rate"],
            FA_price=nan_to_none("FA_price"),
            FA_delta=nan_to_none("FA_delta"),
            FA_gamma=nan_to_none("FA_gamma"),
            FA_vega=nan_to_none("FA_vega"),
            **base_params,
        )
        all_results.append(result)
        if verbose:
            print(f"{result['scenario_name']}: price {result['model_price']:.6f}")
    results_df = pd.DataFrame(all_results)
    if output_csv_path:
        results_df.to_csv(output_csv_path, index=False)
    return results_df


def run_all_american_scenarios_batched(
    config_csv_path: str,
    output_csv_path: Optional[str],
    base_params: Dict[str, Any],
    mesh=None,
    num_space_nodes: Optional[int] = None,
    dtype=np.float64,
    richardson: bool = True,
) -> pd.DataFrame:
    """TPU path: the whole American scenario table as one batched device
    program (the reference's per-scenario loop, run_american_scenarios.py:
    209-316, collapsed into one vmapped solve).

    Prices with ``price_american_batch_richardson`` (the batched twin of
    the scalar pricer's ``price_log2`` Richardson pair) or the flat
    ``price_american_batch`` when ``richardson=False``. On TPU-f32 runs
    the batch auto-routes to the fused SPIKE pallas kernel with the
    Ikonen-Toivanen projection fused into the step (models/pde/
    pallas_kernel.py); the f64 rung runs the XLA scan.
    """
    from ..models.pde.batch import (
        build_american_batch,
        price_american_batch,
        price_american_batch_richardson,
    )
    from ..utils.daycount import year_fraction

    config_df = pd.read_csv(config_csv_path)
    valuation = base_params["valuation"]
    maturity = base_params["maturity"]
    opt_type = base_params.get("opt_type", "call")
    n_time = base_params.get("num_time_steps", 500)
    n_space = num_space_nodes or base_params.get("num_space_nodes", 500)
    day_count = base_params.get("day_count", "ACT/365")
    for lag in (
        "underlying_spot_days", "option_days", "option_settlement_days"
    ):
        if base_params.get(lag):
            # the batch container carries one time measure; non-zero FA
            # settlement lags need the scalar per-scenario path
            raise ValueError(
                f"batched American runner does not support {lag}; use "
                "run_all_american_scenarios"
            )

    t_exp = year_fraction(valuation, maturity, day_count)
    rows = list(config_df.iterrows())
    B = len(rows)
    nacc = [naca_to_nacc(float(row["rate"])) for _, row in rows]
    # discrete dividends (base_params 'divs': [(ex_date, amount), ...])
    # become per-trade (tau_from_expiry, amount) pairs for the segmented
    # schedule — dividend-bearing batches run the scan (spline jumps)
    divs_tau = sorted(
        (
            (t_exp - year_fraction(valuation, d, day_count), float(a))
            for d, a in base_params.get("divs") or []
            # same strict window as AmericanFDMPricer._div_times_tau
            if valuation < d < maturity
            and 0.0 < year_fraction(valuation, d, day_count) < t_exp
        ),
        key=lambda x: x[0],
    )
    build_kwargs = dict(
        spots=[float(row["S0"]) for _, row in rows],
        strikes=[float(row["K"]) for _, row in rows],
        sigmas=[float(row["sigma"]) for _, row in rows],
        t_expiry=[t_exp] * B,
        r=nacc,
        b=nacc,
        is_call=[opt_type == "call"] * B,
        dividends_tau=[list(divs_tau)] * B,
        num_space_nodes=n_space,
        dtype=dtype,
        snap_to_grid=True,  # match AmericanFDMPricer's runner defaults
    )
    if richardson:
        out = price_american_batch_richardson(
            n_nodes=n_space + 1, n_time_steps=n_time,
            # the scalar price_log2's reference quirk: the refined run
            # steps 2*num_space_nodes times (fd_american_equity.py:944-952)
            n_time_steps_fine=2 * n_space,
            mesh=mesh,
            **build_kwargs,
        )
    else:
        tb = build_american_batch(n_time_steps=n_time, **build_kwargs)
        out = price_american_batch(tb, n_nodes=n_space + 1, mesh=mesh)

    all_results = []
    for i, (_, row) in enumerate(rows):
        nan_to_none = lambda k: row[k] if k in row and pd.notna(row[k]) else None
        res: Dict[str, Any] = {
            "scenario_name": row["scenario_name"],
            "S0": row["S0"],
            "K": row["K"],
            "sigma": row["sigma"],
            "rate": row["rate"],
        }
        res.update(_diff_block("price", float(out["price"][i]), nan_to_none("FA_price")))
        res.update(_diff_block("delta", float(out["delta"][i]), nan_to_none("FA_delta")))
        res.update(_diff_block("gamma", float(out["gamma"][i]), nan_to_none("FA_gamma")))
        res.update(_diff_block("vega", float(out["vega"][i]), nan_to_none("FA_vega")))
        all_results.append(res)
    results_df = pd.DataFrame(all_results)
    if output_csv_path:
        results_df.to_csv(output_csv_path, index=False)
    return results_df


def build_parser():
    """CLI mirroring the reference's run_american_scenarios.py __main__."""
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m finite_difference_tpu.runners.american_scenarios",
        description="American scenario sweep: config CSV in, FA-diff CSV out.",
    )
    p.add_argument("config_csv")
    p.add_argument("-o", "--output-csv", default=None)
    p.add_argument("--valuation", default="2025-07-28")
    p.add_argument("--maturity", default="2025-08-28")
    p.add_argument("--opt-type", default="put", choices=["call", "put"])
    p.add_argument(
        "--batched", action="store_true",
        help="price the whole table as one batched device program "
        "(Richardson pair; TPU-f32 rides the SPIKE pallas kernel)",
    )
    p.add_argument("-v", "--verbose", action="store_true")
    from ._cli import add_backend_flag

    add_backend_flag(p)
    return p


def main(argv=None):
    import datetime as _dt

    from ._cli import apply_backend_flag

    args = build_parser().parse_args(argv)
    apply_backend_flag(args)
    base = dict(
        valuation=_dt.date.fromisoformat(args.valuation),
        maturity=_dt.date.fromisoformat(args.maturity),
        opt_type=args.opt_type,
    )
    if args.batched:
        df = run_all_american_scenarios_batched(
            args.config_csv, args.output_csv, base
        )
    else:
        df = run_all_american_scenarios(
            args.config_csv, args.output_csv, base, verbose=args.verbose
        )
    cols = [c for c in df.columns
            if c in ("scenario_name", "model_price", "FA_price", "price_pct_diff")]
    print(df[cols].to_string(index=False))
    return df


if __name__ == "__main__":
    main()
