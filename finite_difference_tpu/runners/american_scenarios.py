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
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv=None):
    import datetime as _dt

    args = build_parser().parse_args(argv)
    base = dict(
        valuation=_dt.date.fromisoformat(args.valuation),
        maturity=_dt.date.fromisoformat(args.maturity),
        opt_type=args.opt_type,
    )
    df = run_all_american_scenarios(
        args.config_csv, args.output_csv, base, verbose=args.verbose
    )
    cols = [c for c in df.columns
            if c in ("scenario_name", "model_price", "FA_price", "price_pct_diff")]
    print(df[cols].to_string(index=False))
    return df


if __name__ == "__main__":
    main()
