"""ExposureEngine throughput benchmark on a realistic netting set.

The reference hot loop (`/root/reference/exposure_engine.py:166-201`)
cannot be executed from the dump (its market_data/portfolio modules are
absent), so the benchmark measures THIS engine's wall-clock on the
workload the VERDICT specifies — n_paths x ~61 monthly dates x an
IRSwap + EquityTRS + IndexLinkedSwap netting set — and reports
paths*dates*trades NPV-evaluations per second.

Usage: python examples/exposure_bench.py [n_paths] [--profile | --device]

``--device`` additionally runs the device-resident fast path
(xva/device_exposure.py) on the SAME full netting set (IRSwap + EquityTRS
+ IndexLinkedSwap are all device-expressible) and reports its throughput
next to the host engine's (see docs/PERF_NOTES.md).
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
from finite_difference_tpu.instruments.equity_trs import EquityTRS
from finite_difference_tpu.instruments.inflation_pv import InflationLeg
from finite_difference_tpu.instruments.index_linked_swap import IndexLinkedSwap
from finite_difference_tpu.instruments.ir_swap import IRSwap
from finite_difference_tpu.market_data.scenario_cube import ScenarioCube
from finite_difference_tpu.portfolio.netting_set import NettingSet, Trade
from finite_difference_tpu.portfolio.csa import CSA, InitialMarginMethod
from finite_difference_tpu.xva.exposure_engine import ExposureEngine

VAL = dt.date(2025, 7, 28)
TENORS = np.array([0.25, 0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0])


def first_of_month(d: dt.date) -> dt.date:
    return d.replace(day=1)


def shift_months(d: dt.date, k: int) -> dt.date:
    m = d.month - 1 + k
    return dt.date(d.year + m // 12, m % 12 + 1, 1)


def build_cube(n_paths: int, n_times: int = 62, seed: int = 0) -> ScenarioCube:
    """Monthly 5y cube: rates + inflation curves, CPI + equity scalars."""
    rng = np.random.default_rng(seed)
    dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
    t = np.arange(n_times)[:, None, None]
    z = rng.normal(0.0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
    swap = 0.075 + 0.0005 * t + z
    infl = 0.05 + 0.0003 * t + rng.normal(0.0, 0.001, z.shape).cumsum(axis=0)
    cpi = 100.0 * np.exp(
        0.004 * np.arange(n_times)[:, None]
        + rng.normal(0, 0.002, (n_times, n_paths)).cumsum(axis=0)
    )
    eq = 100.0 * np.exp(
        rng.normal(0.002, 0.05, (n_times, n_paths)).cumsum(axis=0)
    )
    # CPI LEVEL term structure for the legacy ILS mode: spot column = the
    # scalar CPI path, longer tenors carry expected inflation growth
    cpi_curve = cpi[:, :, None] * np.exp(0.05 * TENORS)[None, None, :]
    return ScenarioCube(
        dates,
        {
            "ZAR-SWAP": ("curve", swap, TENORS),
            "INFL.ZA": ("curve", infl, TENORS),
            "EQ.DIV": ("curve", np.full(z.shape, 0.02), TENORS),
            "CPI.CURVE": ("curve", cpi_curve, TENORS),
            "CPI.ZA": ("scalar", cpi),
            "EQ.SPOT": ("scalar", eq),
        },
    )


def build_netting_set() -> NettingSet:
    swap = IRSwap(
        name="irs-5y",
        effective_date=VAL,
        maturity_date=dt.date(2030, 7, 28),
        notional=1_000_000,
        receive_leg=SwapLeg(LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP"),
        pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=0.08),
        discount_curve_name="ZAR-SWAP",
    )
    trs = EquityTRS(
        name="trs-2y",
        effective_date=VAL,
        maturity_date=dt.date(2027, 7, 28),
        quantity=1000.0,
        notional=100_000.0,
        interest_leg=SwapLeg(
            LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP", spread=0.01
        ),
        spot_name="EQ.SPOT",
        carry_curve_name="ZAR-SWAP",
        dividend_curve_name="EQ.DIV",
        discount_curve_name="ZAR-SWAP",
        initial_price=100.0,
    )
    hist = {shift_months(first_of_month(VAL), -k): 100.0 for k in range(0, 8)}
    ils = IndexLinkedSwap(
        name="ils-3y",
        effective_date=VAL,
        maturity_date=dt.date(2028, 7, 28),
        notional=1_000_000,
        inflation_leg=InflationLeg(
            real_rate=0.025, base_cpi=100.0, cpi_curve_name="CPI.ZA",
            frequency=6, inflation_rate_curve_name="INFL.ZA",
        ),
        nominal_leg=SwapLeg(LegType.FIXED, frequency=6, fixed_rate=0.08),
        discount_curve_name="ZAR-SWAP",
        inflation_index=hist,
    )
    return NettingSet(
        "NS-BENCH",
        [Trade(swap, "T1"), Trade(trs, "T2"), Trade(ils, "T3")],
        csa=CSA(mpor_days=10, vm_threshold=0.0, vm_threshold_post=0.0,
                im_method=InitialMarginMethod.NONE),
    )


def build_wide_extras() -> list:
    """The round-2 device-path coverage set: OIS and compounded-reset
    legs, 'Price'-scaled TRS interest, legacy CPI-term-structure ILS."""
    ois = IRSwap(
        name="ois-2y",
        effective_date=VAL,
        maturity_date=dt.date(2027, 7, 28),
        notional=1_000_000,
        receive_leg=SwapLeg(
            LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP",
            overnight_compounding=True,
        ),
        pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=0.078),
        discount_curve_name="ZAR-SWAP",
    )
    cmp_swap = IRSwap(
        name="cmp-3y",
        effective_date=VAL,
        maturity_date=dt.date(2028, 7, 28),
        notional=1_000_000,
        receive_leg=SwapLeg(
            LegType.FLOATING, frequency=6, curve_name="ZAR-SWAP",
            reset_frequency_months=3,
        ),
        pay_leg=SwapLeg(LegType.FIXED, frequency=6, fixed_rate=0.08),
        discount_curve_name="ZAR-SWAP",
    )
    trs_price = EquityTRS(
        name="trs-price-2y",
        effective_date=VAL,
        maturity_date=dt.date(2027, 7, 28),
        quantity=1000.0,
        notional=100_000.0,
        interest_leg=SwapLeg(
            LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP", spread=0.01
        ),
        spot_name="EQ.SPOT",
        carry_curve_name="ZAR-SWAP",
        dividend_curve_name="EQ.DIV",
        discount_curve_name="ZAR-SWAP",
        initial_price=100.0,
        interest_nominal_scaling="Price",
    )
    hist = {shift_months(first_of_month(VAL), -k): 100.0 for k in range(0, 8)}
    ils_legacy = IndexLinkedSwap(
        name="ils-legacy-3y",
        effective_date=VAL,
        maturity_date=dt.date(2028, 7, 28),
        notional=1_000_000,
        inflation_leg=InflationLeg(
            real_rate=0.025, base_cpi=100.0, cpi_curve_name="CPI.CURVE",
            frequency=6, inflation_rate_curve_name="",
        ),
        nominal_leg=SwapLeg(LegType.FIXED, frequency=6, fixed_rate=0.08),
        discount_curve_name="ZAR-SWAP",
        inflation_index=hist,
    )
    return [ois, cmp_swap, trs_price, ils_legacy]


def main() -> None:
    n_paths = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 50_000
    cube = build_cube(n_paths)
    ns = build_netting_set()
    if "--wide" in sys.argv:
        extras = build_wide_extras()
        ns = NettingSet(
            ns.netting_set_id,
            list(ns.trades)
            + [Trade(x, f"W{i}") for i, x in enumerate(extras)],
            csa=ns.csa,
        )
    engine = ExposureEngine(cube)

    if "--profile" in sys.argv:
        import cProfile, pstats

        pr = cProfile.Profile()
        pr.enable()
        prof = engine.compute(ns)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
    else:
        t0 = time.perf_counter()
        prof = engine.compute(ns)
        elapsed = time.perf_counter() - t0
        evals = n_paths * cube.n_times * len(ns.trades)
        print(
            f"n_paths={n_paths} n_times={cube.n_times} trades={len(ns.trades)}: "
            f"{elapsed:.2f}s = {evals/elapsed/1e6:.2f}M path-date-trade NPVs/s"
        )
        print("EE[0], EE[-1]:", prof.ee()[0], prof.ee()[-1])
        assert np.isfinite(prof.mtm).all()

    if "--device" in sys.argv:
        from finite_difference_tpu.xva.device_exposure import DeviceExposureEngine

        import jax.numpy as jnp

        swaps = [t.instrument for t in ns.trades]
        # device-resident cube (f32): upload ONCE — re-shipping it through
        # the tunnel per call costs more than the whole computation
        def pull(name):
            return np.asarray(
                [cube.get_time_slice(t)[name].values for t in range(cube.n_times)],
                dtype=np.float32,
            )

        arrays = {
            k: jnp.asarray(pull(k))
            for k in ("ZAR-SWAP", "INFL.ZA", "EQ.DIV", "CPI.CURVE")
        }
        scalars = {k: jnp.asarray(pull(k)) for k in ("CPI.ZA", "EQ.SPOT")}
        dev = DeviceExposureEngine(
            list(cube.dates), arrays, TENORS, scalars=scalars
        )
        from finite_difference_tpu.xva.cva import exposure_profile

        times_days = np.arange(cube.n_times, dtype=float) * 30.0

        def run_dev():
            # serving shape: mtm stays on device; only the EE/PFE profile
            # (n_times-sized) is materialized
            return exposure_profile(times_days, dev.mtm(swaps).T)

        p = run_dev()  # compile + first
        t0 = time.perf_counter()
        for _ in range(5):
            p = run_dev()
        per = (time.perf_counter() - t0) / 5
        evals = n_paths * cube.n_times * len(swaps)
        print(
            f"device path (full netting set, EE/PFE materialized): {per*1e3:.1f} ms"
            f" = {evals/per/1e6:.0f}M NPVs/s; EE[0]={p.ee[0]:.2f}"
        )


if __name__ == "__main__":
    main()
