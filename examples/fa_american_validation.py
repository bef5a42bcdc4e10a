"""Front Arena American-put validation workflow.

The framework equivalent of the reference's validation notebook
(`Front_Arena_Finite_Difference_Quantitative_Tests.ipynb` cells 3-7):
price trade 201870944 with the FIS-configured vanilla pricer, run the
convergence ladder, diff against the FA benchmark dict, and export the
comparison table to CSV.

Run:  python examples/fa_american_validation.py [output.csv]
"""
import os
import tempfile
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

import numpy as np
import pandas as pd

from finite_difference_tpu.models.pde.vanilla_fis import VanillaOptionPricerFIS
from finite_difference_tpu.utils.curves import flat_naca_dataframe

# Trade 201870944 (BASELINE.md; notebook cell 3)
FRONT_ARENA = {
    "Price": 2.9846891127,
    "Delta": -0.2978815582,
    "Gamma": 0.0230742255,
    "Vega": 0.1778185529,
    "Theta (Annual)": -27.96921280,
}

VAL = dt.date(2025, 7, 28)
MAT = dt.date(2025, 8, 28)
R_NACC = 0.070538282720


def build_pricer() -> VanillaOptionPricerFIS:
    curve = flat_naca_dataframe(np.exp(R_NACC) - 1.0)
    return VanillaOptionPricerFIS(
        spot_price=176.39,
        strike_price=170.0,
        volatility=0.296783211249,
        valuation_date=VAL,
        maturity_date=MAT,
        discount_curve=curve,
        option_type="put",
        exercise_type="american",
        settlement_type="cash",
        underlying_spot_days=3,
        option_spot_days=0,
        option_settlement_days=0,
    )


def main(output_csv: str = os.path.join(tempfile.gettempdir(), "fa_american_comparison.csv")) -> pd.DataFrame:
    pricer = build_pricer()

    print("Convergence ladder (Richardson prices):")
    for n in (40, 80, 160, 320, 500):
        print(f"  N={n:4d}: {pricer.price(n):.8f}")

    greeks = pricer.calculate_greeks(500)
    rows = []
    for key, fa_val in FRONT_ARENA.items():
        model_val = greeks[key]
        rows.append(
            {
                "metric": key,
                "model": model_val,
                "front_arena": fa_val,
                "abs_diff": abs(model_val - fa_val),
                "pct_diff": abs(model_val - fa_val) / abs(fa_val) * 100.0,
            }
        )
    df = pd.DataFrame(rows)
    print("\nComparison vs Front Arena (1% materiality, TSDO p3):")
    print(df.to_string(index=False))
    df.to_csv(output_csv, index=False)
    print(f"\nSaved {output_csv}")
    assert (df["pct_diff"] < 1.0).all(), "FA materiality breach"
    return df


if __name__ == "__main__":
    main(*sys.argv[1:2])
