"""Barrier scenario runner: config CSV -> diff-vs-FA results CSV.

Capability parity with the reference's ``run_config_scenarios.py:9-199``
(per-scenario ``DiscreteBarrierFDMPricer`` pricing with FA price/greek
diffs) plus the TPU path the reference lacks: ``run_all_scenarios_batched``
prices the entire scenario table in ONE device program
(``price_barrier_batch``), optionally sharded over a device mesh.
"""
from __future__ import annotations

import datetime as dt
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

from ..models.pde.barrier import DiscreteBarrierFDMPricer
from ..utils.curves import flat_curve
from ..utils.rates import naca_to_nacc


def _pct_diff(model_val: float, fa_val: Optional[float]) -> float:
    if fa_val is None or (isinstance(fa_val, float) and np.isnan(fa_val)) or fa_val == 0.0:
        return np.nan
    return abs(model_val - fa_val) / abs(fa_val) * 100.0


def _diff_block(prefix: str, model: float, fa: Optional[float]) -> Dict[str, float]:
    fa_v = fa if fa is not None else np.nan
    return {
        f"model_{prefix}": model,
        f"FA_{prefix}": fa_v,
        f"{prefix}_diff": abs(model - fa) if fa is not None and not np.isnan(fa_v) else np.nan,
        f"{prefix}_pct_diff": _pct_diff(model, fa),
    }


def run_scenario(
    scenario_name: str,
    S0: float,
    K: float,
    sigma: float,
    rate: float,
    barrier_type: str,
    upper_barrier: Optional[float],
    lower_barrier: Optional[float],
    FA_price: Optional[float],
    FA_delta: Optional[float],
    FA_gamma: Optional[float],
    FA_vega: Optional[float],
    *,
    valuation: dt.date,
    maturity: dt.date,
    monitor_dates: List[dt.date],
    opt_type: str = "call",
    trade_number: int = 201871103,
    quantity: int = 1000,
    contract_size: int = 1,
    position: str = "long",
    divs: Optional[list] = None,
    rebate_amount: float = 0.0,
    rebate_at_hit: bool = True,
    use_one_sided_greeks_near_barrier: bool = False,
    already_hit: bool = False,
    already_in: bool = False,
    underlying_spot_days: int = 0,
    option_days: int = 0,
    option_settlement_days: int = 0,
    day_count: str = "ACT/365",
    grid_type: str = "uniform",
    num_space_nodes: int = 500,
    num_time_steps: int = 500,
) -> Dict[str, Any]:
    """One scenario through the CN pricer (run_config_scenarios.py:9-133)."""
    curve = flat_curve(rate, valuation)
    pricer = DiscreteBarrierFDMPricer(
        spot=S0,
        strike=K,
        valuation_date=valuation,
        maturity_date=maturity,
        sigma=sigma,
        option_type=opt_type,
        barrier_type=barrier_type,
        lower_barrier=lower_barrier,
        upper_barrier=upper_barrier,
        already_in=already_in,
        already_hit=already_hit,
        monitor_dates=monitor_dates,
        discount_curve=curve,
        forward_curve=curve,
        dividend_schedule=divs or [],
        trade_id=trade_number,
        direction=position,
        quantity=quantity,
        underlying_spot_days=underlying_spot_days,
        option_days=option_days,
        option_settlement_days=option_settlement_days,
        rebate_amount=rebate_amount,
        rebate_at_hit=rebate_at_hit,
        contract_multiplier=contract_size,
        use_one_sided_greeks_near_barrier=use_one_sided_greeks_near_barrier,
        num_space_nodes=num_space_nodes,
        num_time_steps=num_time_steps,
        grid_type=grid_type,
        rannacher_steps=2,
        day_count=day_count,
    )
    model_price = pricer.price_log2()
    greeks = pricer.greeks_log2()

    results: Dict[str, Any] = {
        "scenario_name": scenario_name,
        "S0": S0,
        "K": K,
        "sigma": sigma,
        "rate": rate,
        "barrier_type": barrier_type,
        "upper_barrier": upper_barrier if upper_barrier is not None else np.nan,
        "lower_barrier": lower_barrier if lower_barrier is not None else np.nan,
    }
    results.update(_diff_block("price", model_price, FA_price))
    results.update(_diff_block("delta", greeks["delta"], FA_delta))
    results.update(_diff_block("gamma", greeks["gamma"], FA_gamma))
    results.update(_diff_block("vega", greeks["vega"], FA_vega))
    return results


def _read_config(config_csv_path: str) -> pd.DataFrame:
    return pd.read_csv(config_csv_path)


def run_all_scenarios(
    config_csv_path: str,
    output_csv_path: Optional[str],
    base_params: Dict[str, Any],
    verbose: bool = False,
) -> pd.DataFrame:
    """Config CSV in, diff table out (run_config_scenarios.py:137-199)."""
    config_df = _read_config(config_csv_path)
    all_results = []
    for _, row in config_df.iterrows():
        nan_to_none = lambda k: row[k] if pd.notna(row[k]) else None
        result = run_scenario(
            scenario_name=row["scenario_name"],
            S0=row["S0"],
            K=row["K"],
            sigma=row["sigma"],
            rate=row["rate"],
            barrier_type=row["barrier_type"],
            upper_barrier=nan_to_none("upper_barrier"),
            lower_barrier=nan_to_none("lower_barrier"),
            FA_price=nan_to_none("FA_price"),
            FA_delta=nan_to_none("FA_delta"),
            FA_gamma=nan_to_none("FA_gamma"),
            FA_vega=nan_to_none("FA_vega"),
            **base_params,
        )
        all_results.append(result)
        if verbose:
            print(
                f"{result['scenario_name']}: price %diff "
                f"{result['price_pct_diff']:.4f}%"
            )
    results_df = pd.DataFrame(all_results)
    if output_csv_path:
        results_df.to_csv(output_csv_path, index=False)
    return results_df


def run_all_scenarios_batched(
    config_csv_path: str,
    output_csv_path: Optional[str],
    base_params: Dict[str, Any],
    mesh=None,
    num_space_nodes: Optional[int] = None,
    dtype=np.float64,
    route: str = "pde",
    schedule: str = "uniform",
) -> pd.DataFrame:
    """TPU path: the whole scenario table as one batched device program.

    Uses the same flat-curve/time-measure resolution as the per-scenario
    runner, then prices with ``price_barrier_batch`` (vmap over scenarios,
    optionally sharded over ``mesh``). KI prices come from in-out parity
    against the batched Black-76 vanilla.

    ``route='hybrid'`` applies the FIS n_lim monitoring decision per trade
    (discrete_barrier_analytic_pricer.py:278-342): continuous-regime trades
    go to the batched analytic sweep with BGK-shifted barriers
    (models.analytic.batch — ~10^6 trades/s-class), the rest to the CN
    batch. ``route='pde'`` sends everything through the CN batch.

    ``schedule='monitor-aligned'`` builds the reference CN auto-grid's
    ">= 10 steps per monitor interval" time layout (per-interval constant
    dt, monitors exactly on step boundaries — grid.monitor_aligned_schedule)
    instead of the uniform grid with floor-snapped monitor indices; both
    layouts are spectral-eligible.
    """
    from ..models.analytic.batch import (
        continuous_barrier_sweep_greeks,
        monitoring_decision,
    )
    from ..models.analytic.black_scholes import black76_price
    from ..models.pde.batch import build_trade_batch, price_barrier_batch
    from ..utils.daycount import year_fraction

    config_df = _read_config(config_csv_path)
    valuation = base_params["valuation"]
    maturity = base_params["maturity"]
    monitor_dates = base_params["monitor_dates"]
    opt_type = base_params.get("opt_type", "call")
    n_time = base_params.get("num_time_steps", 500)
    n_nodes = num_space_nodes or base_params.get("num_space_nodes", 500)
    rebate_amount = float(base_params.get("rebate_amount", 0.0))
    rebate_at_hit = bool(base_params.get("rebate_at_hit", True))
    # base_params the batch container cannot express must fail loudly —
    # the per-scenario runner honors them, so silently dropping them
    # would make --batched quietly price a different trade (the American
    # runner's guard, american_scenarios.py, is the model)
    for key in (
        "divs", "already_hit", "already_in", "underlying_spot_days",
        "option_days", "option_settlement_days",
    ):
        if base_params.get(key):
            raise ValueError(
                f"batched barrier runner does not support {key}; use "
                "run_all_scenarios (the per-scenario path)"
            )
    if base_params.get("grid_type", "uniform") != "uniform":
        raise ValueError(
            "batched barrier runner only supports grid_type='uniform'; "
            "use run_all_scenarios"
        )

    t_exp = year_fraction(valuation, maturity, base_params.get("day_count", "ACT/365"))
    monitor_times = [
        year_fraction(valuation, d, base_params.get("day_count", "ACT/365"))
        for d in monitor_dates
        if valuation < d <= maturity
    ]
    # the scalar engine ALWAYS monitors at expiry
    # (DiscreteBarrierFDMPricer._build_monitor_times, mirroring the
    # reference); a monitor list ending before maturity silently diverged
    # between --batched and the per-scenario path otherwise
    if monitor_times and monitor_times[-1] < t_exp - 1e-14:
        monitor_times.append(t_exp)

    rows = list(config_df.iterrows())
    B = len(rows)
    uppers, lowers, is_in = [], [], []
    for _, row in rows:
        bt = str(row["barrier_type"])
        up = row["upper_barrier"] if pd.notna(row["upper_barrier"]) else None
        lo = row["lower_barrier"] if pd.notna(row["lower_barrier"]) else None
        is_in.append("in" in bt)
        if "up" in bt:
            uppers.append(up)
            lowers.append(None)
        elif "down" in bt:
            uppers.append(None)
            lowers.append(lo)
        else:  # double or none
            uppers.append(up)
            lowers.append(lo)

    nacc = np.array([naca_to_nacc(row["rate"]) for _, row in rows])
    spots = np.array([row["S0"] for _, row in rows], dtype=np.float64)
    strikes = np.array([row["K"] for _, row in rows], dtype=np.float64)
    sigmas = np.array([row["sigma"] for _, row in rows], dtype=np.float64)

    if route == "hybrid":
        use_cont, bgk_adj = monitoring_decision(
            np.full(B, t_exp), [monitor_times] * B, sigmas
        )
        if rebate_amount:
            # the continuous analytic sweep carries no rebate leg; keep
            # rebate-bearing tables on the CN batch (which does)
            use_cont = np.zeros(B, dtype=bool)
    elif route == "pde":
        use_cont = np.zeros(B, dtype=bool)
        bgk_adj = np.ones(B)
    else:
        raise ValueError(f"route must be 'pde' or 'hybrid', got {route!r}")
    pde_idx = np.where(~use_cont)[0]
    cont_idx = np.where(use_cont)[0]

    price_arr = np.zeros(B)
    delta_arr = np.zeros(B)
    gamma_arr = np.zeros(B)
    vega_arr = np.zeros(B)
    pde_routed = np.zeros(B, dtype=bool)
    pde_routed[pde_idx] = True

    if len(pde_idx):
        sub = lambda seq: [seq[i] for i in pde_idx]
        tb = build_trade_batch(
            spots=sub(list(spots)),
            strikes=sub(list(strikes)),
            sigmas=sub(list(sigmas)),
            t_expiry=[t_exp] * len(pde_idx),
            r=sub(list(nacc)),
            b=sub(list(nacc)),
            is_call=[opt_type == "call"] * len(pde_idx),
            n_time_steps=n_time,
            monitor_times=[monitor_times] * len(pde_idx),
            lower=sub(lowers),
            upper=sub(uppers),
            rebate=[rebate_amount] * len(pde_idx),
            # the IN parity complement must carry the rebate at EXPIRY
            # (KI(R) = vanilla - KO(R at expiry) + R*DF, barrier.price_log2)
            rebate_at_hit=[
                rebate_at_hit and not is_in[i] for i in pde_idx
            ],
            num_space_nodes=n_nodes,
            dtype=dtype,
            monitor_aligned=(schedule == "monitor-aligned"),
        )
        out = price_barrier_batch(tb, n_nodes=n_nodes + 1, mesh=mesh)
        price_arr[pde_idx] = out["price"]
        delta_arr[pde_idx] = out["delta"]
        gamma_arr[pde_idx] = out["gamma"]
        vega_arr[pde_idx] = out["vega"]

    if len(cont_idx):
        # continuous regime: analytic sweep with BGK-shifted barriers
        # (H_lo/adj, H_up*adj); IN trades price directly (RR is_in), so no
        # parity fix-up is needed for these lanes.
        sub = lambda seq: [seq[i] for i in cont_idx]
        lo_shift = [
            None if lowers[i] is None else float(lowers[i]) / bgk_adj[i]
            for i in cont_idx
        ]
        up_shift = [
            None if uppers[i] is None else float(uppers[i]) * bgk_adj[i]
            for i in cont_idx
        ]
        g = continuous_barrier_sweep_greeks(
            spots[cont_idx], strikes[cont_idx], t_exp, nacc[cont_idx],
            nacc[cont_idx], sigmas[cont_idx],
            lower=lo_shift, upper=up_shift,
            is_call=np.full(len(cont_idx), opt_type == "call"),
            is_in=np.asarray([is_in[i] for i in cont_idx]),
        )
        price_arr[cont_idx] = np.asarray(g["price"])
        delta_arr[cont_idx] = np.asarray(g["delta"])
        gamma_arr[cont_idx] = np.asarray(g["gamma"])
        vega_arr[cont_idx] = np.asarray(g["vega"])

    results = []
    for idx, (_, row) in enumerate(rows):
        ko_price = float(price_arr[idx])
        delta, gamma, vega = (
            float(delta_arr[idx]),
            float(gamma_arr[idx]),
            float(vega_arr[idx]),
        )
        if is_in[idx] and pde_routed[idx]:
            df = np.exp(-nacc[idx] * t_exp)
            fwd = row["S0"] / df
            vanilla = float(
                black76_price(fwd, row["K"], row["sigma"], t_exp, df, opt_type == "call")
            )
            # KI(R) = vanilla - KO(R at expiry) + R*DF (the framework-wide
            # identity; the never-knocked-in rebate leg is flat in
            # spot/vol so only the price picks it up)
            model_price = vanilla - ko_price + rebate_amount * df
            # vanilla greeks by closed-form bump for the parity leg
            ds = row["S0"] * 1e-4
            v_up = float(black76_price((row["S0"] + ds) / df, row["K"], row["sigma"], t_exp, df, opt_type == "call"))
            v_dn = float(black76_price((row["S0"] - ds) / df, row["K"], row["sigma"], t_exp, df, opt_type == "call"))
            v_delta = (v_up - v_dn) / (2 * ds)
            v_gamma = (v_up - 2 * vanilla + v_dn) / ds**2
            dsig = 1e-4
            v_vega = (
                float(black76_price(fwd, row["K"], row["sigma"] + dsig, t_exp, df, opt_type == "call"))
                - vanilla
            ) / (100.0 * dsig)
            delta, gamma, vega = v_delta - delta, v_gamma - gamma, v_vega - vega
        else:
            model_price = ko_price

        nan_to_none = lambda k: row[k] if pd.notna(row[k]) else None
        rec: Dict[str, Any] = {
            "scenario_name": row["scenario_name"],
            "S0": row["S0"],
            "K": row["K"],
            "sigma": row["sigma"],
            "rate": row["rate"],
            "barrier_type": row["barrier_type"],
        }
        rec.update(_diff_block("price", model_price, nan_to_none("FA_price")))
        rec.update(_diff_block("delta", delta, nan_to_none("FA_delta")))
        rec.update(_diff_block("gamma", gamma, nan_to_none("FA_gamma")))
        rec.update(_diff_block("vega", vega, nan_to_none("FA_vega")))
        results.append(rec)

    results_df = pd.DataFrame(results)
    if output_csv_path:
        results_df.to_csv(output_csv_path, index=False)
    return results_df


def build_parser():
    """CLI mirroring the reference's run_config_scenarios.py __main__
    defaults (val 2025-07-28, 1-month tenor, daily ZA monitor dates)."""
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m finite_difference_tpu.runners.barrier_scenarios",
        description="Barrier scenario sweep: config CSV in, FA-diff CSV out.",
    )
    p.add_argument("config_csv", help="scenario config CSV")
    p.add_argument("-o", "--output-csv", default=None)
    p.add_argument("--valuation", default="2025-07-28", help="ISO date")
    p.add_argument("--maturity", default="2025-08-28", help="ISO date")
    p.add_argument("--opt-type", default="call", choices=["call", "put"])
    p.add_argument("--batched", action="store_true",
                   help="price the whole table as one device batch")
    p.add_argument("--num-space-nodes", type=int, default=None,
                   help="batched path grid override")
    p.add_argument("--route", default="pde", choices=["pde", "hybrid"],
                   help="batched path: 'hybrid' sends continuous-regime "
                        "trades (FIS n_lim rule) to the analytic sweep")
    p.add_argument("--schedule", default="uniform",
                   choices=["uniform", "monitor-aligned"],
                   help="batched path time layout: 'monitor-aligned' uses "
                        "per-interval constant dt with monitors exactly on "
                        "step boundaries (reference CN auto-grid rule)")
    p.add_argument("-v", "--verbose", action="store_true")
    from ._cli import add_backend_flag

    add_backend_flag(p)
    return p


def main(argv=None):
    import datetime as _dt

    from ..utils.calendars import build_monitoring_dates
    from ._cli import apply_backend_flag

    args = build_parser().parse_args(argv)
    apply_backend_flag(args)
    val = _dt.date.fromisoformat(args.valuation)
    mat = _dt.date.fromisoformat(args.maturity)
    base = dict(
        valuation=val,
        maturity=mat,
        monitor_dates=build_monitoring_dates(val, mat, "daily"),
        opt_type=args.opt_type,
    )
    if args.batched:
        df = run_all_scenarios_batched(
            args.config_csv, args.output_csv, base,
            num_space_nodes=args.num_space_nodes,
            route=args.route,
            schedule=args.schedule,
        )
    else:
        df = run_all_scenarios(
            args.config_csv, args.output_csv, base, verbose=args.verbose
        )
    cols = [c for c in df.columns
            if c in ("scenario_name", "model_price", "FA_price", "price_pct_diff")]
    print(df[cols].to_string(index=False))
    return df


if __name__ == "__main__":
    main()
