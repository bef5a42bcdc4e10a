"""Scenario runners / benchmark harnesses (L6).

The product's "test layer": config CSV / trade-dict tables in, diff-vs-
benchmark tables out, with capability parity to the reference's
run_config_scenarios.py, run_american_scenarios.py,
bjerksund_stensland_main.py, discrete_barrier_bgk_main.py and
xva_commodity_forward_main.py — plus a TPU-batched sweep path that prices
the whole scenario table in one device program.
"""
from .barrier_scenarios import run_all_scenarios, run_all_scenarios_batched, run_scenario
from .american_scenarios import run_all_american_scenarios, run_american_scenario
from .bs_scenarios import run_all_bs_scenarios, run_bs_scenario
from .bgk_scenarios import build_flat_curve, run_all_bgk_scenarios, run_bgk_scenario
from .xva_main import run_asset
from .irswap_fa import IRSwapFAPricer, run_irswap_fa_check, synthetic_zar_curves

__all__ = [
    "run_all_scenarios",
    "run_all_scenarios_batched",
    "run_scenario",
    "run_all_american_scenarios",
    "run_american_scenario",
    "run_all_bs_scenarios",
    "run_bs_scenario",
    "build_flat_curve",
    "run_all_bgk_scenarios",
    "run_bgk_scenario",
    "run_asset",
    "IRSwapFAPricer",
    "run_irswap_fa_check",
    "synthetic_zar_curves",
]
