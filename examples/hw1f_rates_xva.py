"""Calibrate-then-simulate rates XVA: HW1F params from a historical curve
panel drive an IRSwap netting-set exposure profile and CVA.

This closes the loop the reference leaves open (its HW1F pipeline stops at
parameter JSON): calibrate Alpha/Sigma from a rates panel
(`calibration.calibrate_hw1f_interest_rate`), simulate a correlated
rates+FX scenario cube (`scenarios.simulate_joint_cube`), and run a USD
counterparty swap book through the exposure engine.

Run:  python examples/hw1f_rates_xva.py
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

import numpy as np
import pandas as pd

from finite_difference_tpu.calibration import calibrate_hw1f_interest_rate
from finite_difference_tpu.instruments import IRSwap, LegType, SwapLeg
from finite_difference_tpu.models.mc import HW1FCurveSimulator, HW1FParams
from finite_difference_tpu.models.mc.gbm import GBMParams
from finite_difference_tpu.portfolio import NettingSet, Trade
from finite_difference_tpu.scenarios import (
    GBMScalarFactor,
    HW1FCurveFactor,
    simulate_joint_cube,
)
from finite_difference_tpu.xva import ExposureEngine
from finite_difference_tpu.xva.config import CounterpartyConfig
from finite_difference_tpu.xva.cva import XvaCalculator

VAL = dt.date(2025, 7, 28)
TENORS = np.array([0.25, 0.5, 1.0, 2.0, 5.0, 10.0])
TODAY_CURVE = np.array([0.0705, 0.0710, 0.0718, 0.0735, 0.0765, 0.0788])


def synthetic_history(n_days=750, seed=0):
    """A mean-reverting synthetic ZAR curve panel standing in for the
    historical CSV the reference loads."""
    rng = np.random.default_rng(seed)
    x = np.zeros(TENORS.size)
    rows = []
    for _ in range(n_days):
        x = x * (1 - 0.004) + 0.0004 * rng.standard_normal(TENORS.size)
        rows.append(TODAY_CURVE + x)
    return pd.DataFrame(rows, columns=TENORS)


def main():
    # 1. calibrate
    panel = synthetic_history()
    param, _corr, _delta = calibrate_hw1f_interest_rate(panel)
    p = HW1FParams.from_calibration(param)
    # the calibration's Log method reports RELATIVE (lognormal) vols;
    # Hull-White takes absolute short-rate vol, so scale by today's level
    p = HW1FParams(alpha=p.alpha, sigma_tenors=p.sigma_tenors,
                   sigma_values=p.sigma_values * TODAY_CURVE.mean())
    print(f"calibrated alpha={p.alpha:.4f}, "
          f"sigma_abs(1y)={p.sigma_at(np.array(1.0)):.5f}")

    # 2. simulate a correlated rates + FX cube
    sim = HW1FCurveSimulator(p, TENORS, TODAY_CURVE)
    cube = simulate_joint_cube(
        VAL,
        [30 * i for i in range(1, 25)] + [735],
        {
            "ZAR-SWAP": HW1FCurveFactor(simulator=sim, tenors=TENORS),
            "FX.USDZAR": GBMScalarFactor(GBMParams(mu=0.0, sigma=0.14), 18.0),
        },
        n_paths=2048,
        correlations={("ZAR-SWAP", "FX.USDZAR"): -0.25},
        seed=42,
    )

    # 3. a two-swap netting set, USD counterparty
    def swap(fixed, years, flip=False):
        legs = dict(
            receive_leg=SwapLeg(LegType.FLOATING, frequency=3,
                                curve_name="ZAR-SWAP"),
            pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=fixed),
        )
        if flip:
            legs = dict(receive_leg=legs["pay_leg"], pay_leg=legs["receive_leg"])
        return IRSwap(
            name=f"swap{years}y", effective_date=VAL,
            maturity_date=dt.date(VAL.year + years, VAL.month, VAL.day),
            notional=1_000_000, discount_curve_name="ZAR-SWAP", **legs,
        )

    ns = NettingSet(
        "US-bank",
        [
            Trade(swap(0.074, 2), "T1", currency="USD",
                  fx_rate_factor="FX.USDZAR"),
            Trade(swap(0.073, 1, flip=True), "T2", currency="USD",
                  fx_rate_factor="FX.USDZAR"),
        ],
    )
    prof = ExposureEngine(cube).compute(ns)
    ee, pfe = prof.ee(), prof.pfe(0.95)

    # 4. CVA
    calc = XvaCalculator(CounterpartyConfig(hazard_rate=0.02, recovery=0.4),
                         days_in_year=365.25, discount_to_zero=False)
    days = np.array([(d - VAL).days for d in cube.dates], float)
    cva = calc.cva_from_ee(days, ee)

    print(f"peak EE  {ee.max():12,.0f} ZAR")
    print(f"peak PFE {pfe.max():12,.0f} ZAR")
    print(f"CVA      {cva:12,.0f} ZAR")


if __name__ == "__main__":
    main()
