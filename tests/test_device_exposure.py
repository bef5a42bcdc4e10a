"""Device-resident exposure fast path vs the generic ExposureEngine."""
import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.instruments.cashflow import LegType, SwapLeg
from finite_difference_tpu.instruments.ir_swap import IRSwap
from finite_difference_tpu.market_data.scenario_cube import ScenarioCube
from finite_difference_tpu.portfolio.netting_set import NettingSet, Trade
from finite_difference_tpu.xva.device_exposure import DeviceExposureEngine
from finite_difference_tpu.xva.exposure_engine import ExposureEngine

VAL = dt.date(2025, 7, 28)
TENORS = np.array([0.25, 0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0])


def _cube_arrays(n_times=26, n_paths=64, seed=0):
    rng = np.random.default_rng(seed)
    dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
    t = np.arange(n_times)[:, None, None]
    swap = 0.075 + 0.0005 * t + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
    return dates, {"ZAR-SWAP": swap}


def _swap(n_years=2, fixing_tenor=None, spread=0.0, fixed_rate=0.08):
    return IRSwap(
        name="irs",
        effective_date=VAL,
        maturity_date=dt.date(VAL.year + n_years, VAL.month, VAL.day),
        notional=1_000_000,
        receive_leg=SwapLeg(
            LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP",
            spread=spread, fixing_tenor_months=fixing_tenor,
        ),
        pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=fixed_rate),
        discount_curve_name="ZAR-SWAP",
    )


def _both(swaps, scales=None, n_times=26, n_paths=64):
    dates, curves = _cube_arrays(n_times, n_paths)
    cube = ScenarioCube(dates, {"ZAR-SWAP": ("curve", curves["ZAR-SWAP"], TENORS)})
    ns = NettingSet(
        "NS",
        [
            Trade(s, f"T{i}", notional_scale=(scales or [1.0] * len(swaps))[i])
            for i, s in enumerate(swaps)
        ],
    )
    generic = ExposureEngine(cube).compute(ns)
    dev = DeviceExposureEngine(dates, curves, TENORS).compute(
        swaps, notional_scales=scales
    )
    return generic, dev


class TestDeviceExposure:
    def test_matches_generic_engine_plain_float(self):
        generic, dev = _both([_swap()])
        np.testing.assert_allclose(dev.mtm, generic.mtm, rtol=1e-10, atol=1e-6)

    def test_matches_with_fixing_tenor_and_spread(self):
        generic, dev = _both([_swap(fixing_tenor=3, spread=0.015)])
        np.testing.assert_allclose(dev.mtm, generic.mtm, rtol=1e-10, atol=1e-6)

    def test_netting_and_scales(self):
        generic, dev = _both(
            [_swap(fixed_rate=0.08), _swap(n_years=1, fixed_rate=0.06)],
            scales=[1.0, -0.5],
        )
        np.testing.assert_allclose(dev.mtm, generic.mtm, rtol=1e-10, atol=1e-6)
        np.testing.assert_allclose(dev.ee(), generic.ee(), rtol=1e-10, atol=1e-6)

    def _ois_swap(self, effective=VAL, frequency=6, seeds=None):
        return IRSwap(
            name="ois",
            effective_date=effective,
            maturity_date=dt.date(effective.year + 1, effective.month,
                                  effective.day),
            notional=1_000_000,
            receive_leg=SwapLeg(
                LegType.FLOATING, frequency=frequency, curve_name="ZAR-SWAP",
                overnight_compounding=True,
            ),
            pay_leg=SwapLeg(LegType.FIXED, frequency=frequency,
                            fixed_rate=0.075),
            discount_curve_name="ZAR-SWAP",
            ois_initial_cfs=seeds,
        )

    def test_ois_leg_matches_generic(self):
        generic, dev = _both([self._ois_swap()], n_times=16, n_paths=16)
        np.testing.assert_allclose(dev.mtm, generic.mtm, rtol=1e-10, atol=1e-5)

    def test_ois_midperiod_start_and_seed(self):
        # effective date strictly between scenario rows; first period
        # already accruing with an old_resets-style seed factor
        eff = VAL - dt.timedelta(days=45)
        swap = self._ois_swap(effective=eff)
        seeds = {("ZAR-SWAP", ps): 1.004
                 for ps, _, _, _ in swap.receive_schedule}
        swap = self._ois_swap(effective=eff, seeds=seeds)
        generic, dev = _both([swap], n_times=16, n_paths=16)
        np.testing.assert_allclose(dev.mtm, generic.mtm, rtol=1e-10, atol=1e-5)

    def test_compounded_reset_leg_matches_generic(self):
        swap = IRSwap(
            name="cmp",
            effective_date=VAL,
            maturity_date=dt.date(2027, 7, 28),
            notional=1_000_000,
            receive_leg=SwapLeg(
                LegType.FLOATING, frequency=6, curve_name="ZAR-SWAP",
                reset_frequency_months=3,
            ),
            pay_leg=SwapLeg(LegType.FIXED, frequency=6, fixed_rate=0.075),
            discount_curve_name="ZAR-SWAP",
        )
        generic, dev = _both([swap])
        np.testing.assert_allclose(dev.mtm, generic.mtm, rtol=1e-10, atol=1e-5)


class TestHW1FPipeline:
    def test_end_to_end_cva(self):
        """HW1F cube -> device exposure -> EE/PFE/CVA, all finite and
        consistent with the generic engine on the same (host) cube."""
        from finite_difference_tpu.models.mc.hw1f import (
            HW1FCurveSimulator, HW1FParams,
        )
        from finite_difference_tpu.xva.device_exposure import hw1f_cva_pipeline

        sim = HW1FCurveSimulator(
            HW1FParams.flat(alpha=0.05, sigma=0.01),
            curve_tenors=TENORS, curve_rates=np.full(TENORS.size, 0.075),
        )
        scen_days = list(range(30, 780, 30))
        swap = _swap(n_years=2)
        out = hw1f_cva_pipeline(
            sim, VAL, scen_days, TENORS, n_paths=128, instruments=[swap],
            hazard_rate=0.02, recovery=0.4, flat_discount_rate=0.07,
        )
        assert np.isfinite(out["cva"]) and out["cva"] > 0
        assert np.isfinite(out["profile"].ee).all()
        assert (out["profile"].pfe >= 0).all()
        # at the profile peak the 95% quantile dominates the mean
        assert out["profile"].pfe.max() >= out["profile"].ee.max()

        # cross-check the MTM against the generic engine on the same cube
        rates = np.asarray(
            sim.simulate(np.asarray(scen_days) / 365.25, TENORS, 128, seed=42)
        )
        today = np.broadcast_to(
            sim._zero_rate0(TENORS)[None, None, :], (1, 128, TENORS.size)
        )
        cube_np = np.concatenate([today, rates], axis=0)
        dates = [VAL] + [VAL + dt.timedelta(days=d) for d in scen_days]
        cube = ScenarioCube(dates, {"ZAR-SWAP": ("curve", cube_np, TENORS)})
        generic = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(swap, "T1")])
        )
        np.testing.assert_allclose(
            np.asarray(out["mtm"]), generic.mtm, rtol=1e-9, atol=1e-5
        )


class TestDeviceTRS:
    def _trs(self, scaling="Price", lag=0, receiver=True, effective=VAL):
        from finite_difference_tpu.instruments.equity_trs import EquityTRS

        return EquityTRS(
            name="trs",
            effective_date=effective,
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
            return_nominal_scaling=scaling,
            spot_lag=lag,
            is_receiver=receiver,
        )

    def _market(self, n_times=26, n_paths=32, seed=3):
        rng = np.random.default_rng(seed)
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        t = np.arange(n_times)[:, None, None]
        swap = 0.075 + 0.0005 * t + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
        div = np.full((n_times, n_paths, TENORS.size), 0.02)
        eq = 100.0 * np.exp(rng.normal(0.002, 0.05, (n_times, n_paths)).cumsum(axis=0))
        return dates, {"ZAR-SWAP": swap, "EQ.DIV": div}, {"EQ.SPOT": eq}

    def _compare(self, trs, rtol=1e-10, atol=1e-5):
        dates, curves, scalars = self._market()
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", curves["ZAR-SWAP"], TENORS),
                "EQ.DIV": ("curve", curves["EQ.DIV"], TENORS),
                "EQ.SPOT": ("scalar", scalars["EQ.SPOT"]),
            },
        )
        generic = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(trs, "T1")])
        )
        dev = DeviceExposureEngine(dates, curves, TENORS, scalars=scalars)
        mtm = np.asarray(dev.mtm([trs]))
        np.testing.assert_allclose(mtm, generic.mtm, rtol=rtol, atol=atol)

    def test_payment_lag_outstanding_after_maturity(self):
        """A payment-lagged TRS pays its final return+interest AFTER
        maturity_date; between maturity and that payment the MTM is the
        outstanding (completed-but-unpaid) flows, not zero — and the
        device path matches the generic engine through that window.
        Regression: scenario_npvs cut off at the contractual maturity,
        understating exposure over the lag window."""
        from finite_difference_tpu.instruments.equity_trs import EquityTRS
        from finite_difference_tpu.instruments.schedule import ScheduleConfig

        dates, curves, scalars = self._market()
        mat = dates[20]  # inside the window, leaves room for the lag
        trs = EquityTRS(
            name="trs-lag",
            effective_date=VAL,
            maturity_date=mat,
            quantity=1000.0,
            notional=100_000.0,
            interest_leg=SwapLeg(
                LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP",
                spread=0.01,
            ),
            spot_name="EQ.SPOT",
            carry_curve_name="ZAR-SWAP",
            dividend_curve_name="EQ.DIV",
            discount_curve_name="ZAR-SWAP",
            initial_price=100.0,
            schedule_config=ScheduleConfig(payment_lag_days=10),
        )
        assert trs._effective_maturity > mat
        self._compare(trs)
        # MTM on a date in (maturity, final payment] is nonzero: the last
        # period's return + interest is completed but unpaid
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", curves["ZAR-SWAP"], TENORS),
                "EQ.DIV": ("curve", curves["EQ.DIV"], TENORS),
                "EQ.SPOT": ("scalar", scalars["EQ.SPOT"]),
            },
        )
        prof = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(trs, "T1")])
        )
        in_window = [
            i for i, d in enumerate(dates)
            if mat <= d <= trs._effective_maturity
        ]
        assert in_window, "window must contain a scenario date"
        assert np.any(np.abs(prof.mtm[:, in_window]) > 1e-6)

    def test_price_scaling_matches_generic(self):
        self._compare(self._trs(scaling="Price"))

    def test_initial_price_scaling_matches_generic(self):
        self._compare(self._trs(scaling="Initial Price"))

    def test_payer_direction(self):
        self._compare(self._trs(receiver=False))

    def test_spot_lag(self):
        self._compare(self._trs(lag=3))

    def test_price_interest_scaling_matches_generic(self):
        trs = self._trs()
        trs.interest_nominal_scaling = "Price"
        self._compare(trs)

    def test_price_interest_scaling_seasoned(self):
        # seasoned start: early interest periods use stamped (clamped-lerp)
        # spot notionals, later ones equity forwards
        trs = self._trs(effective=VAL - dt.timedelta(days=100))
        trs.interest_nominal_scaling = "Price"
        self._compare(trs)

    def test_seasoned_in_flight_first_period(self):
        """A return period IN PROGRESS at the early sim dates whose start
        predates the scenario window: the engine stamps its start spot
        from the clamped first-row state, and that stamp wins over the
        contractual initial_price (equity_trs.scenario_npvs:245-268).
        Regression: the device path used initial_price for pre-window
        starts (~70%% MTM error at the early dates)."""
        from finite_difference_tpu.instruments.equity_trs import EquityTRS

        for scaling in ("Price", "Initial Price"):
            trs = EquityTRS(
                name="trs",
                effective_date=VAL - dt.timedelta(days=100),
                maturity_date=dt.date(2026, 4, 19),  # inside the window
                quantity=1000.0,
                notional=100_000.0,
                interest_leg=SwapLeg(
                    LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP",
                    spread=0.01,
                ),
                spot_name="EQ.SPOT",
                carry_curve_name="ZAR-SWAP",
                dividend_curve_name="EQ.DIV",
                discount_curve_name="ZAR-SWAP",
                initial_price=100.0,
                return_nominal_scaling=scaling,
            )
            self._compare(trs)


class TestDeviceILS:
    def _ils(self, n_years=3, receiver=True, pay_notional=True):
        from finite_difference_tpu.instruments.index_linked_swap import (
            IndexLinkedSwap,
        )
        from finite_difference_tpu.instruments.inflation_pv import InflationLeg
        from finite_difference_tpu.market_data.cpi import first_of_month, shift_months

        hist = {
            shift_months(first_of_month(VAL), -k): 100.0 + 0.3 * (8 - k)
            for k in range(0, 9)
        }
        return IndexLinkedSwap(
            name="ils",
            effective_date=VAL,
            maturity_date=dt.date(VAL.year + n_years, VAL.month, VAL.day),
            notional=1_000_000,
            inflation_leg=InflationLeg(
                real_rate=0.025, base_cpi=100.0, cpi_curve_name="CPI.ZA",
                frequency=6, inflation_rate_curve_name="INFL.ZA",
                pay_notional_at_maturity=pay_notional,
            ),
            nominal_leg=SwapLeg(LegType.FIXED, frequency=6, fixed_rate=0.08),
            discount_curve_name="ZAR-SWAP",
            inflation_index=hist,
            inflation_receiver=receiver,
        )

    def _market(self, n_times=40, n_paths=32, seed=5):
        rng = np.random.default_rng(seed)
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        t = np.arange(n_times)[:, None, None]
        swap = 0.078 + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
        infl = 0.05 + rng.normal(0, 0.001, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
        cpi = 102.4 * np.exp(
            0.004 * np.arange(n_times)[:, None]
            + rng.normal(0, 0.002, (n_times, n_paths)).cumsum(axis=0)
        )
        return dates, {"ZAR-SWAP": swap, "INFL.ZA": infl}, {"CPI.ZA": cpi}

    def _compare(self, ils, rtol=1e-10, atol=1e-5):
        dates, curves, scalars = self._market()
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", curves["ZAR-SWAP"], TENORS),
                "INFL.ZA": ("curve", curves["INFL.ZA"], TENORS),
                "CPI.ZA": ("scalar", scalars["CPI.ZA"]),
            },
        )
        generic = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(ils, "T1")])
        )
        dev = DeviceExposureEngine(dates, curves, TENORS, scalars=scalars)
        mtm = np.asarray(dev.mtm([ils]))
        np.testing.assert_allclose(mtm, generic.mtm, rtol=rtol, atol=atol)

    def test_matches_generic_engine(self):
        self._compare(self._ils())

    def test_payer_and_no_notional_exchange(self):
        self._compare(self._ils(receiver=False, pay_notional=False))

    def test_legacy_cpi_term_structure_matches_generic(self):
        # legacy mode: the CPI factor is a pathwise level term structure
        import dataclasses

        ils = self._ils()
        ils.inflation_leg = dataclasses.replace(
            ils.inflation_leg, inflation_rate_curve_name=""
        )
        rng = np.random.default_rng(5)
        n_times, n_paths = 40, 32
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        swap = 0.078 + rng.normal(
            0, 0.002, (n_times, n_paths, TENORS.size)
        ).cumsum(axis=0)
        # CPI-level curve: spot column grows along the scenario, longer
        # tenors carry expected inflation growth
        base = 102.4 * np.exp(
            0.004 * np.arange(n_times)[:, None]
            + rng.normal(0, 0.002, (n_times, n_paths)).cumsum(axis=0)
        )
        cpi_curve = base[:, :, None] * np.exp(0.05 * TENORS)[None, None, :]
        curves = {"ZAR-SWAP": swap, "CPI.ZA": cpi_curve}
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", swap, TENORS),
                "CPI.ZA": ("curve", cpi_curve, TENORS),
            },
        )
        generic = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(ils, "T1")])
        )
        dev = DeviceExposureEngine(dates, curves, TENORS)
        mtm = np.asarray(dev.mtm([ils]))
        np.testing.assert_allclose(mtm, generic.mtm, rtol=1e-10, atol=1e-5)


class TestDeviceCommodity:
    def _market(self, n_times=20, n_paths=16, seed=11):
        rng = np.random.default_rng(seed)
        dates = [VAL + dt.timedelta(days=14 * i) for i in range(n_times)]
        swap = 0.07 + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
        fwd = 70.0 * np.exp(
            rng.normal(0.001, 0.02, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
        )
        return dates, {"ZAR-SWAP": swap, "BRENT": fwd}

    def _both(self, inst):
        dates, curves = self._market()
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", curves["ZAR-SWAP"], TENORS),
                "BRENT": ("curve", curves["BRENT"], TENORS),
            },
        )
        generic = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(inst, "T1")])
        )
        dev = DeviceExposureEngine(dates, curves, TENORS)
        return generic, np.asarray(dev.mtm([inst]))

    def test_forward_matches_generic(self):
        from finite_difference_tpu.instruments.commodity import (
            CommodityForwardInstrument,
        )

        fwd = CommodityForwardInstrument(
            "cf", delivery_date=VAL + dt.timedelta(days=180), strike=72.0,
            notional=1000.0, forward_curve_name="BRENT",
            discount_curve_name="ZAR-SWAP", pricing_lag_days=2,
        )
        generic, mtm = self._both(fwd)
        np.testing.assert_allclose(mtm, generic.mtm, rtol=1e-10, atol=1e-8)

    def test_average_forward_matches_generic(self):
        from finite_difference_tpu.instruments.commodity import (
            CommodityAverageForwardInstrument,
        )

        avg = CommodityAverageForwardInstrument(
            "caf",
            averaging_dates=[VAL + dt.timedelta(days=30 * k) for k in range(1, 7)],
            payment_date=VAL + dt.timedelta(days=200),
            strike=71.0, notional=500.0, forward_curve_name="BRENT",
            discount_curve_name="ZAR-SWAP", pricing_lag_days=1,
        )
        generic, mtm = self._both(avg)
        np.testing.assert_allclose(mtm, generic.mtm, rtol=1e-10, atol=1e-8)

    def test_mixed_netting_with_swap(self):
        from finite_difference_tpu.instruments.commodity import (
            CommodityForwardInstrument,
        )

        dates, curves = self._market(n_times=28)
        fwd = CommodityForwardInstrument(
            "cf", delivery_date=VAL + dt.timedelta(days=150), strike=70.0,
            notional=1000.0, forward_curve_name="BRENT",
            discount_curve_name="ZAR-SWAP",
        )
        swap = _swap(n_years=1)
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", curves["ZAR-SWAP"], TENORS),
                "BRENT": ("curve", curves["BRENT"], TENORS),
            },
        )
        generic = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(fwd, "T1"), Trade(swap, "T2")])
        )
        dev = DeviceExposureEngine(dates, curves, TENORS)
        mtm = np.asarray(dev.mtm([fwd, swap]))
        np.testing.assert_allclose(mtm, generic.mtm, rtol=1e-10, atol=1e-6)


class TestDeviceSurfaceExotics:
    def _market(self, n_times=16, n_paths=24, seed=13):
        rng = np.random.default_rng(seed)
        dates = [VAL + dt.timedelta(days=7 * i) for i in range(n_times)]
        eq = 100.0 * np.exp(
            rng.normal(0.0, 0.04, (n_times, n_paths)).cumsum(axis=0)
        )
        return dates, eq

    def _both(self, inst, dates, eq):
        cube = ScenarioCube(dates, {"EQ.SPOT": ("scalar", eq)})
        generic = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(inst, "T1")])
        )
        dev = DeviceExposureEngine(
            dates, {}, TENORS, scalars={"EQ.SPOT": eq}
        )
        return generic, np.asarray(dev.mtm([inst]))

    def test_ko_barrier_matches_generic(self):
        from finite_difference_tpu.instruments import EquityBarrierOption

        dates, eq = self._market()
        mat = dates[-1]
        mons = [dates[3], dates[6], dates[9], dates[12]]
        opt = EquityBarrierOption(
            "ko", "EQ.SPOT", 100.0, mat, 0.3, 0.06, monitor_dates=mons,
            barrier_type="up-and-out", upper_barrier=115.0, rebate=1.5,
            quantity=100.0, n_time_steps=64, num_space_nodes=127,
        )
        generic, mtm = self._both(opt, dates, eq)
        np.testing.assert_allclose(mtm, generic.mtm, rtol=1e-10, atol=1e-8)

    def test_ki_barrier_matches_generic(self):
        from finite_difference_tpu.instruments import EquityBarrierOption

        dates, eq = self._market(seed=17)
        mat = dates[-1]
        mons = [dates[4], dates[8], dates[12]]
        opt = EquityBarrierOption(
            "ki", "EQ.SPOT", 100.0, mat, 0.3, 0.06, monitor_dates=mons,
            barrier_type="down-and-in", lower_barrier=88.0, rebate=0.5,
            quantity=50.0, n_time_steps=64, num_space_nodes=127,
        )
        generic, mtm = self._both(opt, dates, eq)
        np.testing.assert_allclose(mtm, generic.mtm, rtol=1e-10, atol=1e-8)

    def test_american_matches_generic(self):
        from finite_difference_tpu.instruments import AmericanOptionPosition

        dates, eq = self._market(seed=19)
        opt = AmericanOptionPosition(
            "am", "EQ.SPOT", 100.0, dates[-1], 0.3, 0.06,
            option_type="put", quantity=10.0,
            n_time_steps=64, num_space_nodes=127,
        )
        generic, mtm = self._both(opt, dates, eq)
        np.testing.assert_allclose(mtm, generic.mtm, rtol=1e-10, atol=1e-8)


class TestDeviceFX:
    def test_fx_conversion_matches_generic(self):
        rng = np.random.default_rng(9)
        n_times, n_paths = 14, 16
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        t = np.arange(n_times)[:, None, None]
        swap_cube = 0.07 + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
        fx = 18.0 * np.exp(rng.normal(0, 0.01, (n_times, n_paths)).cumsum(axis=0))
        swap = _swap(n_years=1)
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", swap_cube, TENORS),
                "USDZAR": ("scalar", fx),
            },
        )
        generic = ExposureEngine(cube).compute(
            NettingSet(
                "NS",
                [Trade(swap, "T1", currency="USD", fx_rate_factor="USDZAR")],
                reporting_currency="ZAR",
            )
        )
        dev = DeviceExposureEngine(
            dates, {"ZAR-SWAP": swap_cube}, TENORS, scalars={"USDZAR": fx}
        )
        mtm = np.asarray(dev.mtm([swap], fx_factors=["USDZAR"]))
        np.testing.assert_allclose(mtm, generic.mtm, rtol=1e-10, atol=1e-6)


def test_device_csa_collateral_matches_generic():
    """Device compute(csa=...) reuses the shared MPOR/VM collateral sim."""
    from finite_difference_tpu.portfolio.csa import CSA, InitialMarginMethod

    dates, curves = _cube_arrays(14, 16, seed=2)
    csa = CSA(mpor_days=10, vm_threshold=500.0, vm_threshold_post=800.0,
              im_method=InitialMarginMethod.NONE)
    swap = _swap(n_years=1)
    cube = ScenarioCube(dates, {"ZAR-SWAP": ("curve", curves["ZAR-SWAP"], TENORS)})
    generic = ExposureEngine(cube).compute(
        NettingSet("NS", [Trade(swap, "T1")], csa=csa)
    )
    dev = DeviceExposureEngine(dates, curves, TENORS).compute([swap], csa=csa)
    np.testing.assert_allclose(dev.collateral, generic.collateral, rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(dev.exposure, generic.exposure, rtol=1e-10, atol=1e-6)


def test_device_forward_closeout_risky_curve_matches_generic():
    """FORWARD close-out: the device path rebinds the trade's discount
    (and same-named projection) curve to the CSA risky curve exactly as
    the generic engine's state substitution does."""
    from finite_difference_tpu.portfolio.csa import (
        CSA,
        CloseOutMethod,
        InitialMarginMethod,
    )

    rng = np.random.default_rng(8)
    n_times, n_paths = 14, 16
    dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
    swap_arr = 0.07 + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
    risky_arr = swap_arr + 0.02  # wide risky spread
    curves = {"ZAR-SWAP": swap_arr, "RISKY": risky_arr}
    csa = CSA(
        mpor_days=10, vm_threshold=0.0, vm_threshold_post=0.0,
        im_method=InitialMarginMethod.NONE,
        close_out_method=CloseOutMethod.FORWARD, risky_curve_name="RISKY",
    )
    swap = _swap(n_years=1)
    cube = ScenarioCube(
        dates,
        {
            "ZAR-SWAP": ("curve", swap_arr, TENORS),
            "RISKY": ("curve", risky_arr, TENORS),
        },
    )
    generic = ExposureEngine(cube).compute(
        NettingSet("NS", [Trade(swap, "T1")], csa=csa)
    )
    dev = DeviceExposureEngine(dates, curves, TENORS).compute([swap], csa=csa)
    # the substitution must actually bite (risky spread changes the MTM)
    base = DeviceExposureEngine(dates, curves, TENORS).compute([swap])
    assert np.abs(dev.mtm - base.mtm).max() > 1.0
    np.testing.assert_allclose(dev.mtm, generic.mtm, rtol=1e-10, atol=1e-6)


# FIXED/SCHEDULE IM is a deterministic per-date policy -> the engines
# agree at their 1e-10 base-MTM level. SIMM IM is built from
# finite-difference sensitivities, and (bumped - base)/h amplifies the
# engines' ~1e-10 relative MTM agreement by |V|/|dV| ~ 1e2-1e3 (measured
# max 1.7e-8 rel here), so the honest cross-engine SIMM gate is 1e-7.
@pytest.mark.parametrize(
    "im_method_name,rtol", [("FIXED", 1e-10), ("SCHEDULE", 1e-10), ("SIMM", 1e-7)]
)
def test_device_csa_initial_margin_matches_generic(im_method_name, rtol):
    """Device compute honors the FIXED/SCHEDULE/SIMM IM policies
    (previously the device path silently dropped IM, then punted SIMM to
    the generic engine)."""
    from finite_difference_tpu.portfolio.csa import CSA, InitialMarginMethod

    dates, curves = _cube_arrays(14, 16, seed=4)
    csa = CSA(
        mpor_days=10, vm_threshold=500.0, vm_threshold_post=800.0,
        im_method=InitialMarginMethod[im_method_name], im_amount=2500.0,
    )
    swap = _swap(n_years=1)
    cube = ScenarioCube(dates, {"ZAR-SWAP": ("curve", curves["ZAR-SWAP"], TENORS)})
    generic = ExposureEngine(cube).compute(
        NettingSet("NS", [Trade(swap, "T1")], csa=csa)
    )
    dev = DeviceExposureEngine(dates, curves, TENORS).compute([swap], csa=csa)
    assert np.abs(dev.collateral).max() > 0
    np.testing.assert_allclose(
        dev.collateral, generic.collateral, rtol=rtol, atol=1e-8
    )
    np.testing.assert_allclose(
        dev.exposure, generic.exposure, rtol=rtol, atol=1e-6
    )


def test_device_simm_mixed_factors_matches_generic():
    """SIMM on device over a curve factor AND a scalar (equity) factor:
    the IR bucket bumps, the +1%% scalar bump (with stamped equity
    fixings held at base), and the cross-class aggregation must all
    reproduce the generic engine's pathwise SIMM margin."""
    from finite_difference_tpu.instruments.equity_trs import EquityTRS
    from finite_difference_tpu.portfolio.csa import CSA, InitialMarginMethod

    rng = np.random.default_rng(11)
    n_times, n_paths = 14, 12
    dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
    swap_arr = 0.075 + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
    div = np.full((n_times, n_paths, TENORS.size), 0.02)
    eq = 100.0 * np.exp(rng.normal(0.002, 0.05, (n_times, n_paths)).cumsum(axis=0))
    curves = {"ZAR-SWAP": swap_arr, "EQ.DIV": div}
    scalars = {"EQ.SPOT": eq}
    # seasoned TRS so stamped (historical) spot fixings exist and must
    # stay at base under the equity bump
    trs = EquityTRS(
        name="trs",
        effective_date=VAL - dt.timedelta(days=100),
        maturity_date=dt.date(2026, 6, 28),
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
    swap = _swap(n_years=1)
    csa = CSA(
        mpor_days=10, vm_threshold=500.0, vm_threshold_post=800.0,
        im_method=InitialMarginMethod.SIMM,
    )
    cube = ScenarioCube(
        dates,
        {
            "ZAR-SWAP": ("curve", swap_arr, TENORS),
            "EQ.DIV": ("curve", div, TENORS),
            "EQ.SPOT": ("scalar", eq),
        },
    )
    generic = ExposureEngine(cube).compute(
        NettingSet("NS", [Trade(swap, "T1"), Trade(trs, "T2")], csa=csa)
    )
    dev = DeviceExposureEngine(dates, curves, TENORS, scalars=scalars).compute(
        [swap, trs], csa=csa
    )
    assert np.abs(dev.collateral).max() > 0
    # 1e-7: the cross-engine finite-difference noise floor (see the
    # comment above test_device_csa_initial_margin_matches_generic)
    np.testing.assert_allclose(
        dev.collateral, generic.collateral, rtol=1e-7, atol=1e-8
    )
    np.testing.assert_allclose(
        dev.exposure, generic.exposure, rtol=1e-7, atol=1e-6
    )


def test_device_dict_risky_curve_matches_generic():
    """Per-currency risky-curve dicts (FORWARD close-out) on the device
    path: each trade's discount curve is rebound to the risky curve keyed
    by ITS currency, exactly like the generic engine's per-trade state
    substitution; currencies missing from the dict stay unsubstituted."""
    from finite_difference_tpu.portfolio.csa import (
        CSA,
        CloseOutMethod,
        InitialMarginMethod,
    )

    rng = np.random.default_rng(21)
    n_times, n_paths = 14, 16
    dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
    swap_arr = 0.07 + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
    fx = 18.0 * np.exp(rng.normal(0, 0.01, (n_times, n_paths)).cumsum(axis=0))
    curves = {
        "ZAR-SWAP": swap_arr,
        "RISKY-ZAR": swap_arr + 0.02,
        "RISKY-USD": swap_arr + 0.035,
    }
    scalars = {"USDZAR": fx}
    csa = CSA(
        mpor_days=10, vm_threshold=0.0, vm_threshold_post=0.0,
        im_method=InitialMarginMethod.NONE,
        close_out_method=CloseOutMethod.FORWARD,
        risky_curve_name={"ZAR": "RISKY-ZAR", "USD": "RISKY-USD"},
    )
    zar_swap = _swap(n_years=1)
    usd_swap = _swap(n_years=1, fixed_rate=0.07)
    gbp_swap = _swap(n_years=1, fixed_rate=0.06)  # GBP absent from dict
    cube = ScenarioCube(
        dates,
        {
            "ZAR-SWAP": ("curve", swap_arr, TENORS),
            "RISKY-ZAR": ("curve", curves["RISKY-ZAR"], TENORS),
            "RISKY-USD": ("curve", curves["RISKY-USD"], TENORS),
            "USDZAR": ("scalar", fx),
        },
    )
    generic = ExposureEngine(cube).compute(
        NettingSet(
            "NS",
            [
                Trade(zar_swap, "T1", currency="ZAR"),
                Trade(usd_swap, "T2", currency="USD",
                      fx_rate_factor="USDZAR"),
                Trade(gbp_swap, "T3", currency="GBP",
                      fx_rate_factor="USDZAR"),
            ],
            reporting_currency="ZAR",
            csa=csa,
        )
    )
    dev = DeviceExposureEngine(dates, curves, TENORS, scalars=scalars).compute(
        [zar_swap, usd_swap, gbp_swap],
        fx_factors=[None, "USDZAR", "USDZAR"],
        csa=csa,
        currencies=["ZAR", "USD", "GBP"],
    )
    # the substitution must actually bite, and differently per currency
    base = DeviceExposureEngine(dates, curves, TENORS, scalars=scalars).compute(
        [zar_swap, usd_swap, gbp_swap],
        fx_factors=[None, "USDZAR", "USDZAR"],
    )
    assert np.abs(dev.mtm - base.mtm).max() > 1.0
    np.testing.assert_allclose(dev.mtm, generic.mtm, rtol=1e-10, atol=1e-6)
    np.testing.assert_allclose(
        dev.exposure, generic.exposure, rtol=1e-10, atol=1e-6
    )


class TestJointCubeDevicePipeline:
    def test_multifactor_device_pipeline_matches_generic(self):
        """simulate_joint_cube(as_jax=True) -> DeviceExposureEngine over the
        full IRSwap+TRS+ILS netting set == host ScenarioCube -> generic
        engine on the same correlated scenarios."""
        from finite_difference_tpu.models.mc.gbm import GBMParams
        from finite_difference_tpu.models.mc.hw1f import (
            HW1FCurveSimulator, HW1FParams,
        )
        from finite_difference_tpu.scenarios.joint_cube import (
            GBMScalarFactor, HW1FCurveFactor, simulate_joint_cube,
        )

        n_paths = 16
        scen_days = list(range(30, 780, 30))
        mk_sim = lambda r0: HW1FCurveSimulator(
            HW1FParams.flat(alpha=0.05, sigma=0.008),
            curve_tenors=TENORS, curve_rates=np.full(TENORS.size, r0),
        )
        factors = {
            "ZAR-SWAP": HW1FCurveFactor(mk_sim(0.075), TENORS),
            "INFL.ZA": HW1FCurveFactor(mk_sim(0.05), TENORS),
            "CPI.ZA": GBMScalarFactor(GBMParams(mu=0.05, sigma=0.015), 102.4),
            "EQ.SPOT": GBMScalarFactor(GBMParams(mu=0.07, sigma=0.25), 100.0),
        }
        corr = {("ZAR-SWAP", "INFL.ZA"): 0.4, ("CPI.ZA", "INFL.ZA"): 0.6}

        # host path
        cube = simulate_joint_cube(VAL, scen_days, factors, n_paths, corr)
        # device path (same seed -> same normals)
        dates, curves, scalars, tbn = simulate_joint_cube(
            VAL, scen_days, factors, n_paths, corr, as_jax=True
        )
        # static dividend curve on both sides
        n_times = len(dates)
        div = np.full((n_times, n_paths, TENORS.size), 0.02)
        curves["EQ.DIV"] = div
        from finite_difference_tpu.market_data.scenario_cube import ScenarioCube

        host_cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", np.asarray(curves["ZAR-SWAP"]), TENORS),
                "INFL.ZA": ("curve", np.asarray(curves["INFL.ZA"]), TENORS),
                "EQ.DIV": ("curve", div, TENORS),
                "CPI.ZA": ("scalar", np.asarray(scalars["CPI.ZA"])),
                "EQ.SPOT": ("scalar", np.asarray(scalars["EQ.SPOT"])),
            },
        )

        # instruments: reuse the suite's fixtures
        swap = _swap(n_years=2)
        trs = TestDeviceTRS()._trs()
        ils = TestDeviceILS()._ils(n_years=2)

        generic = ExposureEngine(host_cube).compute(
            NettingSet("NS", [Trade(swap, "T1"), Trade(trs, "T2"), Trade(ils, "T3")])
        )
        dev = DeviceExposureEngine(dates, curves, TENORS, scalars=scalars)
        mtm = np.asarray(dev.mtm([swap, trs, ils]))
        np.testing.assert_allclose(mtm, generic.mtm, rtol=1e-9, atol=1e-4)


class TestDeviceFuzz:
    def test_random_swap_configs_match_generic(self):
        """Fuzz: random frequencies, spreads, fixing tenors, seasoned
        effective dates and maturities — device == generic per config."""
        rng = np.random.default_rng(21)
        n_times, n_paths = 20, 8
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        t = np.arange(n_times)[:, None, None]
        cube_arr = 0.07 + 0.0004 * t + rng.normal(
            0, 0.002, (n_times, n_paths, TENORS.size)
        ).cumsum(axis=0)
        cube = ScenarioCube(dates, {"ZAR-SWAP": ("curve", cube_arr, TENORS)})
        dev = DeviceExposureEngine(dates, {"ZAR-SWAP": cube_arr}, TENORS)

        for trial in range(16):
            freq = int(rng.choice([1, 3, 6, 12]))
            fixing = rng.choice([None, 1, 3, 6])
            fixing = None if fixing is None else int(fixing)
            spread = float(rng.uniform(-0.01, 0.02))
            seasoned = int(rng.integers(-400, 90))  # may start in the past
            eff = VAL + dt.timedelta(days=seasoned)
            mat = eff + dt.timedelta(days=int(rng.integers(360, 900)))
            if mat > dates[-1]:
                mat = dates[-1]
            if mat <= eff:
                continue
            # plain simple-forward, OIS-compounded, or sub-period compounded
            kind = int(rng.integers(0, 3))
            ois = kind == 1
            reset_freq = 0
            if kind == 2:
                fixing = None
                sub = [s for s in (1, 3, 6) if s < freq]
                reset_freq = int(rng.choice(sub)) if sub else 0
            swap = IRSwap(
                name=f"f{trial}",
                effective_date=eff,
                maturity_date=mat,
                notional=float(rng.uniform(1e5, 5e6)),
                receive_leg=SwapLeg(
                    LegType.FLOATING, frequency=freq, curve_name="ZAR-SWAP",
                    spread=spread,
                    fixing_tenor_months=None if ois else fixing,
                    overnight_compounding=ois,
                    reset_frequency_months=reset_freq,
                ),
                pay_leg=SwapLeg(
                    LegType.FIXED, frequency=freq,
                    fixed_rate=float(rng.uniform(0.05, 0.1)),
                ),
                discount_curve_name="ZAR-SWAP",
            )
            generic = ExposureEngine(cube).compute(
                NettingSet("NS", [Trade(swap, "T")])
            )
            mtm = np.asarray(dev.mtm([swap]))
            np.testing.assert_allclose(
                mtm, generic.mtm, rtol=1e-9, atol=1e-4,
                err_msg=f"trial {trial}: freq={freq} fixing={fixing} "
                        f"kind={kind} reset={reset_freq} eff={eff} mat={mat}",
            )

    def test_random_simm_netting_sets_match_generic(self):
        """Fuzz the device SIMM path: random swap+TRS netting sets (varying
        frequencies, spreads, seasoning, quantities) under a SIMM CSA —
        device collateral == generic at the 1e-7 cross-engine FD noise
        floor for every configuration."""
        from finite_difference_tpu.instruments.equity_trs import EquityTRS
        from finite_difference_tpu.portfolio.csa import (
            CSA, InitialMarginMethod,
        )

        rng = np.random.default_rng(41)
        n_times, n_paths = 10, 6
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        swap_arr = 0.073 + rng.normal(
            0, 0.002, (n_times, n_paths, TENORS.size)
        ).cumsum(axis=0)
        div = np.full((n_times, n_paths, TENORS.size), 0.02)
        eq = 100.0 * np.exp(
            rng.normal(0.002, 0.04, (n_times, n_paths)).cumsum(axis=0)
        )
        curves = {"ZAR-SWAP": swap_arr, "EQ.DIV": div}
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", swap_arr, TENORS),
                "EQ.DIV": ("curve", div, TENORS),
                "EQ.SPOT": ("scalar", eq),
            },
        )
        dev = DeviceExposureEngine(
            dates, curves, TENORS, scalars={"EQ.SPOT": eq}
        )
        csa = CSA(
            mpor_days=10, vm_threshold=300.0, vm_threshold_post=500.0,
            im_method=InitialMarginMethod.SIMM,
        )
        for trial in range(6):
            freq = int(rng.choice([3, 6]))
            eff = VAL + dt.timedelta(days=int(rng.integers(-200, 60)))
            mat = min(
                eff + dt.timedelta(days=int(rng.integers(200, 400))),
                dates[-1],
            )
            if mat <= max(eff, dates[0]):
                continue
            swap = IRSwap(
                name=f"s{trial}", effective_date=eff, maturity_date=mat,
                notional=float(rng.uniform(2e5, 2e6)),
                receive_leg=SwapLeg(
                    LegType.FLOATING, frequency=freq, curve_name="ZAR-SWAP",
                    spread=float(rng.uniform(-0.005, 0.01)),
                ),
                pay_leg=SwapLeg(
                    LegType.FIXED, frequency=freq,
                    fixed_rate=float(rng.uniform(0.06, 0.09)),
                ),
                discount_curve_name="ZAR-SWAP",
            )
            trs = EquityTRS(
                name=f"t{trial}",
                effective_date=VAL + dt.timedelta(days=int(rng.integers(-90, 30))),
                maturity_date=dates[-1],
                quantity=float(rng.uniform(100, 2000)),
                notional=100_000.0,
                interest_leg=SwapLeg(
                    LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP",
                    spread=0.01,
                ),
                spot_name="EQ.SPOT", carry_curve_name="ZAR-SWAP",
                dividend_curve_name="EQ.DIV", discount_curve_name="ZAR-SWAP",
                initial_price=100.0,
                return_nominal_scaling=str(rng.choice(["Price", "Initial Price"])),
            )
            generic = ExposureEngine(cube).compute(
                NettingSet(
                    "NS", [Trade(swap, "T1"), Trade(trs, "T2")], csa=csa
                )
            )
            prof = dev.compute([swap, trs], csa=csa)
            np.testing.assert_allclose(
                prof.collateral, generic.collateral, rtol=1e-7, atol=1e-6,
                err_msg=f"trial {trial}: freq={freq} eff={eff} mat={mat}",
            )
            np.testing.assert_allclose(
                prof.exposure, generic.exposure, rtol=1e-7, atol=1e-6,
                err_msg=f"trial {trial}",
            )

    def test_random_mixed_families_match_generic(self):
        """Fuzz across instrument FAMILIES: each trial nets a random swap,
        commodity forward, and surface exotic — device == generic."""
        from finite_difference_tpu.instruments import (
            AmericanOptionPosition,
            EquityBarrierOption,
        )
        from finite_difference_tpu.instruments.commodity import (
            CommodityAverageForwardInstrument,
        )

        rng = np.random.default_rng(31)
        n_times, n_paths = 18, 8
        dates = [VAL + dt.timedelta(days=14 * i) for i in range(n_times)]
        t = np.arange(n_times)[:, None, None]
        swap_arr = 0.07 + 0.0004 * t + rng.normal(
            0, 0.002, (n_times, n_paths, TENORS.size)
        ).cumsum(axis=0)
        oil = 70.0 * np.exp(
            rng.normal(0, 0.02, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
        )
        eq = 100.0 * np.exp(
            rng.normal(0, 0.04, (n_times, n_paths)).cumsum(axis=0)
        )
        curves = {"ZAR-SWAP": swap_arr, "OIL": oil}
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", swap_arr, TENORS),
                "OIL": ("curve", oil, TENORS),
                "EQ.SPOT": ("scalar", eq),
            },
        )
        dev = DeviceExposureEngine(
            dates, curves, TENORS, scalars={"EQ.SPOT": eq}
        )
        for trial in range(4):
            mat_days = int(rng.integers(90, 200))
            swap = IRSwap(
                name=f"s{trial}", effective_date=VAL,
                maturity_date=VAL + dt.timedelta(days=mat_days),
                notional=float(rng.uniform(1e5, 1e6)),
                receive_leg=SwapLeg(
                    LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP",
                    overnight_compounding=bool(rng.integers(0, 2)),
                ),
                pay_leg=SwapLeg(
                    LegType.FIXED, frequency=3,
                    fixed_rate=float(rng.uniform(0.05, 0.1)),
                ),
                discount_curve_name="ZAR-SWAP",
            )
            caf = CommodityAverageForwardInstrument(
                f"c{trial}",
                averaging_dates=[
                    VAL + dt.timedelta(days=int(d))
                    for d in sorted(rng.integers(10, mat_days, 4))
                ],
                payment_date=VAL + dt.timedelta(days=mat_days),
                strike=float(rng.uniform(65, 80)), notional=500.0,
                forward_curve_name="OIL", discount_curve_name="ZAR-SWAP",
            )
            exotic_mat = dates[int(rng.integers(8, n_times - 1))]
            if rng.integers(0, 2):
                exo = EquityBarrierOption(
                    f"b{trial}", "EQ.SPOT", 100.0, exotic_mat, 0.3, 0.06,
                    monitor_dates=[dates[4], dates[7]],
                    barrier_type=str(rng.choice(["up-and-out", "down-and-in"])),
                    lower_barrier=85.0, upper_barrier=120.0,
                    rebate=float(rng.choice([0.0, 2.0])),
                    quantity=100.0, n_time_steps=48, num_space_nodes=127,
                )
            else:
                exo = AmericanOptionPosition(
                    f"a{trial}", "EQ.SPOT", 100.0, exotic_mat, 0.3, 0.06,
                    quantity=10.0, n_time_steps=48, num_space_nodes=127,
                )
            trades = [swap, caf, exo]
            generic = ExposureEngine(cube).compute(
                NettingSet("NS", [Trade(x, f"T{i}") for i, x in enumerate(trades)])
            )
            mtm = np.asarray(dev.mtm(trades))
            np.testing.assert_allclose(
                mtm, generic.mtm, rtol=1e-9, atol=1e-4,
                err_msg=f"trial {trial}",
            )


    def test_random_csa_space_matches_generic(self):
        """Fuzz the CSA parameter space: random MPOR / VM thresholds /
        IM methods (NONE, FIXED, SCHEDULE, SIMM) / close-out conventions
        (STANDARD, FORWARD with string or per-currency-dict risky curves)
        over netting sets mixing swaps, TRS, and index-linked swaps with
        varying window/maturity overlap — device compute() == generic
        compute() (mtm, collateral, exposure) on every draw.

        The window/maturity variation is deliberate: the round-3 device
        TRS initial-price bug only showed when an in-progress period's
        start predated the cube window."""
        from finite_difference_tpu.instruments.equity_trs import EquityTRS
        from finite_difference_tpu.instruments.index_linked_swap import (
            IndexLinkedSwap,
        )
        from finite_difference_tpu.instruments.inflation_pv import InflationLeg
        from finite_difference_tpu.market_data.cpi import (
            first_of_month,
            shift_months,
        )
        from finite_difference_tpu.portfolio.csa import (
            CSA, CloseOutMethod, InitialMarginMethod,
        )

        rng = np.random.default_rng(53)
        n_times, n_paths = 16, 6
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        swap_arr = 0.073 + rng.normal(
            0, 0.002, (n_times, n_paths, TENORS.size)
        ).cumsum(axis=0)
        risky_arr = swap_arr + 0.015
        usd_risky = swap_arr + 0.025
        infl = 0.05 + rng.normal(
            0, 0.001, (n_times, n_paths, TENORS.size)
        ).cumsum(axis=0)
        div = np.full((n_times, n_paths, TENORS.size), 0.02)
        eq = 100.0 * np.exp(
            rng.normal(0.001, 0.04, (n_times, n_paths)).cumsum(axis=0)
        )
        cpi = 102.4 * np.exp(
            0.004 * np.arange(n_times)[:, None]
            + rng.normal(0, 0.002, (n_times, n_paths)).cumsum(axis=0)
        )
        curves = {
            "ZAR-SWAP": swap_arr, "ZAR-RISKY": risky_arr,
            "USD-RISKY": usd_risky, "INFL.ZA": infl, "EQ.DIV": div,
        }
        scalars = {"EQ.SPOT": eq, "CPI.ZA": cpi}
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", swap_arr, TENORS),
                "ZAR-RISKY": ("curve", risky_arr, TENORS),
                "USD-RISKY": ("curve", usd_risky, TENORS),
                "INFL.ZA": ("curve", infl, TENORS),
                "EQ.DIV": ("curve", div, TENORS),
                "EQ.SPOT": ("scalar", eq),
                "CPI.ZA": ("scalar", cpi),
            },
        )
        dev = DeviceExposureEngine(dates, curves, TENORS, scalars=scalars)
        hist = {
            shift_months(first_of_month(VAL), -k): 100.0 + 0.3 * (8 - k)
            for k in range(0, 9)
        }

        for trial in range(10):
            # instruments with randomized window overlap
            swap_eff = VAL + dt.timedelta(days=int(rng.integers(-300, 60)))
            swap_mat = min(
                swap_eff + dt.timedelta(days=int(rng.integers(180, 700))),
                dates[-1],
            )
            if swap_mat <= max(swap_eff, dates[0]):
                continue
            trades = [
                IRSwap(
                    name=f"s{trial}", effective_date=swap_eff,
                    maturity_date=swap_mat,
                    notional=float(rng.uniform(2e5, 2e6)),
                    receive_leg=SwapLeg(
                        LegType.FLOATING, frequency=int(rng.choice([3, 6])),
                        curve_name="ZAR-SWAP",
                        spread=float(rng.uniform(-0.005, 0.01)),
                    ),
                    pay_leg=SwapLeg(
                        LegType.FIXED, frequency=3,
                        fixed_rate=float(rng.uniform(0.06, 0.09)),
                    ),
                    discount_curve_name="ZAR-SWAP",
                )
            ]
            ccys = ["ZAR"]
            if rng.integers(0, 2):
                trades.append(
                    EquityTRS(
                        name=f"t{trial}",
                        effective_date=VAL
                        + dt.timedelta(days=int(rng.integers(-200, 30))),
                        maturity_date=dates[int(rng.integers(6, n_times))],
                        quantity=float(rng.uniform(100, 1500)),
                        notional=100_000.0,
                        interest_leg=SwapLeg(
                            LegType.FLOATING, frequency=3,
                            curve_name="ZAR-SWAP", spread=0.01,
                        ),
                        spot_name="EQ.SPOT", carry_curve_name="ZAR-SWAP",
                        dividend_curve_name="EQ.DIV",
                        discount_curve_name="ZAR-SWAP",
                        initial_price=100.0,
                        return_nominal_scaling=str(
                            rng.choice(["Price", "Initial Price"])
                        ),
                    )
                )
                # trade currency stays the reporting currency (cross-ccy
                # FX factors are covered elsewhere); the USD key of the
                # dict-form risky curve is exercised via rn.get fallback
                ccys.append("ZAR")
            if rng.integers(0, 2):
                trades.append(
                    IndexLinkedSwap(
                        name=f"i{trial}", effective_date=VAL,
                        maturity_date=dt.date(
                            VAL.year + 1, VAL.month, VAL.day,
                        ),
                        notional=500_000.0,
                        inflation_leg=InflationLeg(
                            real_rate=0.025, base_cpi=100.0,
                            cpi_curve_name="CPI.ZA", frequency=6,
                            inflation_rate_curve_name="INFL.ZA",
                            pay_notional_at_maturity=bool(rng.integers(0, 2)),
                        ),
                        nominal_leg=SwapLeg(
                            LegType.FIXED, frequency=6, fixed_rate=0.08
                        ),
                        discount_curve_name="ZAR-SWAP",
                        inflation_index=hist,
                        inflation_receiver=bool(rng.integers(0, 2)),
                    )
                )
                ccys.append("ZAR")

            im = InitialMarginMethod(
                str(rng.choice(["none", "fixed", "schedule", "simm"]))
            )
            close_out = CloseOutMethod(
                str(rng.choice(["standard", "forward"]))
            )
            risky = None
            if close_out is CloseOutMethod.FORWARD:
                risky = (
                    {"ZAR": "ZAR-RISKY", "USD": "USD-RISKY"}
                    if rng.integers(0, 2)
                    else "ZAR-RISKY"
                )
            csa = CSA(
                mpor_days=int(rng.choice([0, 5, 10, 22])),
                vm_threshold=float(rng.choice([0.0, 5e3, 5e4])),
                vm_threshold_post=float(rng.choice([0.0, 1e4])),
                im_method=im,
                im_amount=float(rng.uniform(0, 2e4)) if im
                is InitialMarginMethod.FIXED else 0.0,
                close_out_method=close_out,
                risky_curve_name=risky,
            )
            generic = ExposureEngine(cube).compute(
                NettingSet(
                    "NS",
                    [
                        Trade(x, f"T{i}", currency=ccys[i])
                        for i, x in enumerate(trades)
                    ],
                    csa=csa,
                )
            )
            prof = dev.compute(trades, csa=csa, currencies=ccys)
            tol = dict(rtol=1e-7, atol=1e-5) if im is (
                InitialMarginMethod.SIMM
            ) else dict(rtol=1e-9, atol=1e-6)
            msg = (
                f"trial {trial}: im={im.value} close={close_out.value} "
                f"risky={risky!r} n_trades={len(trades)}"
            )
            np.testing.assert_allclose(
                prof.mtm, generic.mtm, err_msg=msg, **tol
            )
            np.testing.assert_allclose(
                prof.collateral, generic.collateral, err_msg=msg, **tol
            )
            np.testing.assert_allclose(
                prof.exposure, generic.exposure, err_msg=msg, **tol
            )


class TestSimmReviewHardening:
    """Regression tests for review findings: length validation, FX pair
    classification, scalar-class override validation, risky-name noise."""

    def _engine_and_swap(self):
        rng = np.random.default_rng(5)
        n_times, n_paths = 6, 8
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        arr = 0.07 + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
        eng = DeviceExposureEngine(dates, {"C": arr}, TENORS)
        swap = IRSwap(
            name="s1", effective_date=VAL,
            maturity_date=VAL + dt.timedelta(days=150), notional=1e6,
            receive_leg=SwapLeg(LegType.FLOATING, frequency=3, curve_name="C"),
            pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=0.075),
            discount_curve_name="C",
        )
        return eng, swap

    def test_short_risky_curve_list_raises(self):
        eng, swap = self._engine_and_swap()
        with pytest.raises(ValueError, match="risky_curve has 1 entries"):
            eng.mtm([swap, swap, swap], risky_curve=["C"])

    def test_short_currencies_raises(self):
        from finite_difference_tpu.portfolio.csa import CSA, CloseOutMethod

        eng, swap = self._engine_and_swap()
        csa = CSA(close_out_method=CloseOutMethod.FORWARD,
                  risky_curve_name={"ZAR": "C"})
        with pytest.raises(ValueError, match="currencies has 1 entries"):
            eng.compute([swap, swap], csa=csa, currencies=["ZAR"])

    def test_short_notional_scales_raises(self):
        eng, swap = self._engine_and_swap()
        with pytest.raises(ValueError, match="notional_scales"):
            eng.mtm([swap, swap], notional_scales=[1.0])

    def test_missing_risky_curve_warns(self):
        from finite_difference_tpu.portfolio.csa import CSA, CloseOutMethod

        eng, swap = self._engine_and_swap()
        csa = CSA(close_out_method=CloseOutMethod.FORWARD,
                  risky_curve_name="RISKY-TYPO")
        with pytest.warns(UserWarning, match="RISKY-TYPO"):
            out = eng.compute([swap], csa=csa)
        # silently priced riskless (generic-engine semantics), but loud
        base = eng.compute([swap])
        np.testing.assert_allclose(out.mtm, base.mtm, rtol=0)

    def test_fx_pair_names_classify_as_fx(self):
        from finite_difference_tpu.portfolio.simm import infer_scalar_class

        assert infer_scalar_class("USDZAR") == "fx"
        assert infer_scalar_class("eurusd") == "fx"
        assert infer_scalar_class("EQ.SPOT") == "equity"
        assert infer_scalar_class("COPPER") == "equity"  # not a ccy pair

    def test_scalar_class_override_to_ir_raises(self):
        from finite_difference_tpu.portfolio.simm import SimmConfig

        cfg = SimmConfig(factor_classes={"EQ.SPOT": "interest_rate"})
        with pytest.raises(ValueError, match="no scalar risk weight"):
            cfg.scalar_class("EQ.SPOT")

    def test_simm_im_rejects_scalar_interest_rate(self):
        from finite_difference_tpu.portfolio.simm import simm_im

        with pytest.raises(ValueError, match="ir_ws"):
            simm_im(None, {"interest_rate": [np.ones(3)]})
