"""End-to-end device CVA pipeline demo (BASELINE config 5, all in HBM).

HW1F-calibrated yield-curve scenarios -> device-resident exposure for a
10-swap netting set -> EE/PFE profile + CVA, with only the profile and
the scalar leaving the device. Optionally saves an EE/PFE plot.

Usage: python examples/device_cva_pipeline.py [n_paths] [plot.png]
"""
from __future__ import annotations

import datetime as dt
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --cpu: force the CPU backend in-process (the preloaded TPU plugin
# ignores the JAX_PLATFORMS env var, so an env-only override can't work)
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")


import numpy as np

from finite_difference_tpu.instruments.cashflow import LegType, SwapLeg
from finite_difference_tpu.instruments.ir_swap import IRSwap
from finite_difference_tpu.models.mc.hw1f import HW1FCurveSimulator, HW1FParams
from finite_difference_tpu.xva.device_exposure import hw1f_cva_pipeline

VAL = dt.date(2025, 7, 28)
TENORS = np.array([0.25, 0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0])


def main() -> None:
    n_paths = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 50_000
    plot_path = next((a for a in sys.argv[1:] if a.endswith(".png")), None)

    # e.g. from calibration.hw1f on RiskFlow MarketData.json params
    sim = HW1FCurveSimulator(
        HW1FParams.flat(alpha=0.05, sigma=0.01),
        curve_tenors=TENORS,
        curve_rates=np.full(TENORS.size, 0.075),
    )
    swaps = [
        IRSwap(
            name=f"irs{k}",
            effective_date=VAL,
            maturity_date=dt.date(2030, 7, 28),
            notional=1_000_000,
            receive_leg=SwapLeg(LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP"),
            pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=0.07 + 0.002 * k),
            discount_curve_name="ZAR-SWAP",
        )
        for k in range(10)
    ]
    scen_days = list(range(30, 1890, 30))

    run = lambda: hw1f_cva_pipeline(
        sim, VAL, scen_days, TENORS, n_paths, swaps,
        hazard_rate=0.02, recovery=0.4, flat_discount_rate=0.075,
    )
    out = run()  # compile + first
    t0 = time.perf_counter()
    out = run()
    steady = time.perf_counter() - t0
    evals = n_paths * (len(scen_days) + 1) * len(swaps)
    print(f"CVA: {out['cva']:,.2f}")
    print(
        f"steady-state: {steady*1e3:.0f} ms for {evals/1e6:.0f}M NPVs "
        f"incl. scenario generation ({evals/steady/1e6:.1f}M NPVs/s)"
    )
    if plot_path:
        from finite_difference_tpu.utils.plotting import plot_ee_pfe

        prof = out["profile"]
        plot_ee_pfe(
            prof.times_days, prof.ee, prof.pfe, save_path=plot_path,
            title=f"HW1F device CVA pipeline — CVA {out['cva']:,.0f}",
        )
        print("plot:", plot_path)


if __name__ == "__main__":
    main()
