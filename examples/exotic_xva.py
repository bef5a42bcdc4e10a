"""Exotic positions in netting-set XVA via the PDE-surrogate hook.

Builds a netting set holding a discretely-monitored up-and-out call and
an American put alongside an IRSwap, simulates a joint equity/rates cube,
and runs the generic ExposureEngine — the exotic instruments price
through per-scenario-date CN value surfaces built ONCE by their
``precompute`` hooks (instruments/equity_barrier.py,
instruments/american_option.py), with barrier survival tracked by the
engine's monitor-date spot stamping.

Usage: python examples/exotic_xva.py [n_paths] [--plot out.png]
"""
from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --cpu: force the CPU backend in-process (the preloaded TPU plugin
# ignores the JAX_PLATFORMS env var, so an env-only override can't work)
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")


import numpy as np

from finite_difference_tpu.instruments import (
    AmericanOptionPosition,
    EquityBarrierOption,
    IRSwap,
)
from finite_difference_tpu.instruments.cashflow import LegType, SwapLeg
from finite_difference_tpu.market_data.scenario_cube import ScenarioCube
from finite_difference_tpu.portfolio.netting_set import NettingSet, Trade
from finite_difference_tpu.xva.exposure_engine import ExposureEngine

VAL = dt.date(2025, 7, 28)
MAT = dt.date(2026, 7, 28)
TENORS = np.array([0.25, 0.5, 1.0, 2.0, 5.0])


def main() -> None:
    n_paths = (
        int(sys.argv[1])
        if len(sys.argv) > 1 and sys.argv[1].isdigit()
        else 10_000
    )
    rng = np.random.default_rng(7)
    dates = [VAL + dt.timedelta(days=14 * i) for i in range(28)]
    n_times = len(dates)
    eq = 100.0 * np.exp(
        rng.normal(0.0005, 0.035, (n_times, n_paths)).cumsum(axis=0)
    )
    rates = 0.07 + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(
        axis=0
    )
    cube = ScenarioCube(
        dates,
        {"EQ.SPOT": ("scalar", eq), "ZAR-SWAP": ("curve", rates, TENORS)},
    )

    monitors = [VAL + dt.timedelta(days=30 * k) for k in range(1, 12)]
    barrier = EquityBarrierOption(
        "uoc", "EQ.SPOT", strike=100.0, maturity_date=MAT, sigma=0.3,
        rate=0.07, monitor_dates=monitors, barrier_type="up-and-out",
        upper_barrier=135.0, rebate=1.0, quantity=5_000.0,
    )
    american = AmericanOptionPosition(
        "amp", "EQ.SPOT", strike=95.0, maturity_date=MAT, sigma=0.3,
        rate=0.07, option_type="put", quantity=5_000.0,
    )
    swap = IRSwap(
        name="irs", effective_date=VAL, maturity_date=MAT, notional=500_000,
        receive_leg=SwapLeg(LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP"),
        pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=0.075),
        discount_curve_name="ZAR-SWAP",
    )
    ns = NettingSet(
        "NS-EXOTIC",
        [Trade(barrier, "T1"), Trade(american, "T2"), Trade(swap, "T3")],
    )
    prof = ExposureEngine(cube).compute(ns)
    ee, pfe = prof.ee(), prof.pfe()
    print(f"n_paths={n_paths}: EE[0]={ee[0]:,.0f} peak EE={ee.max():,.0f} "
          f"peak PFE95={pfe.max():,.0f}")
    assert np.isfinite(prof.mtm).all()

    if "--device" in sys.argv:
        # the same netting set (exotics included) on the device path; in a
        # default (non-x64) session the device kernels run f32, so compare
        # the EE profile at f32 tolerance (tests/test_device_exposure.py
        # pins f64 parity at 1e-10)
        from finite_difference_tpu.xva.device_exposure import (
            DeviceExposureEngine,
        )

        dev = DeviceExposureEngine(
            dates, {"ZAR-SWAP": rates}, TENORS, scalars={"EQ.SPOT": eq}
        )
        dprof = dev.compute([barrier, american, swap])
        np.testing.assert_allclose(
            dprof.ee(), ee, rtol=2e-3, atol=ee.max() * 2e-3
        )
        print("device path matches the host engine "
              f"(EE[0]={dprof.ee()[0]:,.0f}, f32)")

    if "--plot" in sys.argv:
        out = sys.argv[sys.argv.index("--plot") + 1]
        from finite_difference_tpu.utils.plotting import plot_exposure_profile

        plot_exposure_profile(prof, save_path=out)
        print("wrote", out)


if __name__ == "__main__":
    main()
