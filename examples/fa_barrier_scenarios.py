"""Barrier scenario sweep vs Front Arena benchmarks.

The framework equivalent of the reference's `run_config_scenarios.py`
__main__ block: build the 24-business-day ZA monitor schedule, price the
benchmark scenarios from BASELINE.md through both the scalar CN pricer and
the TPU-batched sweep engine, and print the FA diff table.

Run:  python examples/fa_barrier_scenarios.py [results.csv]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# f64 validation pipeline: CPU is the default backend (x64 on the TPU is
# emulated, slower and pointless for a host-side golden comparison); pass
# --tpu to run on the device anyway. --cpu is accepted as a no-op for
# symmetry with the device-first examples. In-process jax.config is the
# only override that works — the preloaded TPU plugin ignores the
# JAX_PLATFORMS env var.
import jax

if "--tpu" in sys.argv:
    sys.argv.remove("--tpu")
else:
    jax.config.update("jax_platforms", "cpu")
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
jax.config.update("jax_enable_x64", True)

import datetime as dt
import tempfile

import numpy as np
import pandas as pd

from finite_difference_tpu.runners import run_all_scenarios, run_all_scenarios_batched

VAL = dt.date(2025, 7, 28)
MAT = dt.date(2025, 8, 28)

# The reference's 24 ZA-business-day monitor schedule
# (run_config_scenarios.py:206-231)
MONITORS = [
    dt.date(2025, 7, 28), dt.date(2025, 7, 29), dt.date(2025, 7, 30),
    dt.date(2025, 7, 31), dt.date(2025, 8, 1), dt.date(2025, 8, 4),
    dt.date(2025, 8, 5), dt.date(2025, 8, 6), dt.date(2025, 8, 7),
    dt.date(2025, 8, 8), dt.date(2025, 8, 11), dt.date(2025, 8, 12),
    dt.date(2025, 8, 13), dt.date(2025, 8, 14), dt.date(2025, 8, 15),
    dt.date(2025, 8, 18), dt.date(2025, 8, 19), dt.date(2025, 8, 20),
    dt.date(2025, 8, 21), dt.date(2025, 8, 22), dt.date(2025, 8, 25),
    dt.date(2025, 8, 26), dt.date(2025, 8, 27), dt.date(2025, 8, 28),
]

# FA benchmarks from Scneario_results_summary.xlsx (BASELINE.md rows 1-4)
SCENARIOS = [
    dict(scenario_name="uo_call_H260", S0=229.74, K=190.0, sigma=0.28790,
         rate=0.073086, barrier_type="up-and-out", upper_barrier=260.0,
         lower_barrier=np.nan, FA_price=32.413972, FA_delta=np.nan,
         FA_gamma=np.nan, FA_vega=np.nan),
    dict(scenario_name="uo_call_H420", S0=229.74, K=190.0, sigma=0.28790,
         rate=0.073086, barrier_type="up-and-out", upper_barrier=420.0,
         lower_barrier=np.nan, FA_price=40.9325556, FA_delta=np.nan,
         FA_gamma=np.nan, FA_vega=np.nan),
    dict(scenario_name="ui_call_H260", S0=229.74, K=190.0, sigma=0.28790,
         rate=0.073086, barrier_type="up-and-in", upper_barrier=260.0,
         lower_barrier=np.nan, FA_price=8.5185837, FA_delta=np.nan,
         FA_gamma=np.nan, FA_vega=np.nan),
]

BASE_PARAMS = dict(
    valuation=VAL,
    maturity=MAT,
    monitor_dates=MONITORS,
    opt_type="call",
    num_space_nodes=500,
    num_time_steps=500,
)


def main(output_csv: str = os.path.join(tempfile.gettempdir(), "fa_barrier_results.csv")) -> pd.DataFrame:
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        pd.DataFrame(SCENARIOS).to_csv(f.name, index=False)
        config_path = f.name

    print("Scalar CN pricer path:")
    df = run_all_scenarios(config_path, output_csv, BASE_PARAMS, verbose=True)
    print(df[["scenario_name", "model_price", "FA_price", "price_pct_diff"]]
          .to_string(index=False))

    print("\nTPU-batched sweep path (one device program):")
    df_b = run_all_scenarios_batched(config_path, None, BASE_PARAMS)
    print(df_b[["scenario_name", "model_price", "FA_price", "price_pct_diff"]]
          .to_string(index=False))

    print(f"\nSaved {output_csv}")
    return df


if __name__ == "__main__":
    main(*sys.argv[1:2])
