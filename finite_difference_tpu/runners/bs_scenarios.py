"""Bjerksund-Stensland scenario runner.

Capability parity with the reference's ``bjerksund_stensland_main.py:77-393``:
trade dicts priced through the simple (float T/r) or curve-based path, with
benchmark diffs and CSV export.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import pandas as pd

from ..models.analytic.bs_forward import BjerksundStenslandForwardPricer


def _abs_diff(model: float, bench: Optional[float]) -> Optional[float]:
    if bench is None or (isinstance(bench, float) and math.isnan(bench)):
        return None
    return abs(model - bench)


def _pct_diff(model: float, bench: Optional[float]) -> Optional[float]:
    if bench is None or (isinstance(bench, float) and math.isnan(bench)) or bench == 0.0:
        return None
    return abs(model - bench) / abs(bench) * 100.0


def run_bs_scenario(trade: Dict[str, Any]) -> Dict[str, Any]:
    """Price one trade (bjerksund_stensland_main.py:136-274).

    Curve path when 'discount_curve' is present; simple path otherwise.
    """
    name = trade.get("trade_name", "unnamed")
    pricer = BjerksundStenslandForwardPricer()
    S = float(trade["S"])
    K = float(trade["K"])
    sigma = float(trade["sigma"])
    opt_type = trade.get("option_type", "call")
    dS = float(trade.get("dS", 1e-4))
    dSigma = float(trade.get("dSigma", 1e-4))

    if "discount_curve" in trade:
        kwargs = dict(
            discount_curve=trade["discount_curve"],
            forward_curve=trade.get("forward_curve"),
            dividend_schedule=trade.get("dividend_schedule"),
            underlying_spot_days=int(trade.get("underlying_spot_days", 0)),
            option_days=int(trade.get("option_days", 0)),
            option_settlement_days=int(trade.get("option_settlement_days", 0)),
            day_count=trade.get("day_count", "ACT/365"),
        )
        price_result = pricer.price_from_curves(
            S, K, trade["valuation_date"], trade["maturity_date"], sigma,
            opt_type, **kwargs,
        )
        greek_result = pricer.greeks_from_curves(
            S, K, trade["valuation_date"], trade["maturity_date"], sigma,
            opt_type, dS=dS, dSigma=dSigma, **kwargs,
        )
        resolved = {k: price_result[k] for k in (
            "T_exp", "T_carry", "T_disc", "carry_rate", "disc_rate", "F_eff", "b",
        )}
        path = "curve"
    else:
        if trade.get("T") is not None:
            T_exp = float(trade["T"])
        elif "valuation_date" in trade and "maturity_date" in trade:
            T_exp = max(
                (trade["maturity_date"] - trade["valuation_date"]).days / 365.0, 0.0
            )
        else:
            raise ValueError(
                f"Trade {name!r}: supply 'T', dates, or 'discount_curve'."
            )
        r = float(trade["r"])
        F_arg, q_arg, divs_arg = trade.get("F"), trade.get("q"), trade.get("dividends")
        price_result = pricer.price(S, K, T_exp, r, sigma, opt_type, F_arg, q_arg, divs_arg)
        greek_result = pricer.greeks(
            S, K, T_exp, r, sigma, opt_type, F_arg, q_arg, divs_arg,
            dS=dS, dSigma=dSigma,
        )
        F_eff = pricer._resolve_forward(S, r, T_exp, F_arg, q_arg, divs_arg)
        resolved = {
            "T_exp": T_exp, "T_carry": T_exp, "T_disc": T_exp,
            "carry_rate": r, "disc_rate": r, "F_eff": F_eff,
            "b": math.log(max(F_eff, 1e-15) / max(S, 1e-15)) / max(T_exp, 1e-12),
        }
        path = "simple"

    result: Dict[str, Any] = {
        "trade_name": name,
        "option_type": opt_type,
        "path": path,
        "S": S,
        "K": K,
        "sigma": sigma,
        "early_exercise": price_result.get("early_exercise", 0.0),
        "model_price": price_result["price"],
        "model_delta": greek_result["delta"],
        "model_gamma": greek_result["gamma"],
        "model_vega": greek_result["vega"],
    }
    result.update(resolved)
    for g in ("price", "delta", "gamma", "vega"):
        bench = trade.get(f"bench_{g}")
        result[f"bench_{g}"] = bench
        result[f"{g}_abs_diff"] = _abs_diff(result[f"model_{g}"], bench)
        result[f"{g}_pct_diff"] = _pct_diff(result[f"model_{g}"], bench)
    return result


def run_all_bs_scenarios(
    trades: List[Dict[str, Any]],
    output_csv: Optional[str] = None,
    print_results: bool = False,
) -> List[Dict[str, Any]]:
    """Run all trades; optional CSV (bjerksund_stensland_main.py:276-321)."""
    all_results = [run_bs_scenario(trade) for trade in trades]
    if print_results:
        for r in all_results:
            print(
                f"{r['trade_name']}: price={r['model_price']:.4f} "
                f"delta={r['model_delta']:.4f}"
            )
    if output_csv:
        pd.DataFrame(all_results).to_csv(output_csv, index=False)
    return all_results
