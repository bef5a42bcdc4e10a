import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.market_data import (
    CurveSlice,
    ScalarSlice,
    ScenarioCube,
    StaticMarketData,
    YieldCurve,
    hermite_rt_interp,
    linear_interp,
)
from finite_difference_tpu.portfolio import (
    CSA,
    CloseOutMethod,
    InitialMarginMethod,
    NettingSet,
    Trade,
)
from finite_difference_tpu.instruments import (
    IRSwap,
    Instrument,
    LegType,
    ScheduleConfig,
    SwapLeg,
)
from finite_difference_tpu.xva import ExposureEngine

VAL = dt.date(2025, 7, 28)
TENORS = np.array([0.25, 0.5, 1.0, 2.0, 5.0, 10.0])


def _dates(n, step=30):
    return [VAL + dt.timedelta(days=step * i) for i in range(n)]


def _flat_cube(n_times=6, n_paths=8, rate=0.07, names=("ZAR-SWAP",)):
    dates = _dates(n_times)
    factors = {}
    for nm in names:
        vals = np.full((n_times, n_paths, TENORS.size), rate)
        factors[nm] = ("curve", vals, TENORS)
    return ScenarioCube(dates, factors)


class TestYieldCurve:
    def test_flat_df_and_forward(self):
        c = YieldCurve(TENORS, np.full((3, TENORS.size), 0.06))
        df = c.discount_factor(np.array([1.0, 2.0]))
        expected = np.broadcast_to(np.exp(-0.06 * np.array([1.0, 2.0])), (3, 2))
        np.testing.assert_allclose(df, expected)
        f = c.forward_rate(1.0, 2.0)
        np.testing.assert_allclose(f, np.exp(0.06) - 1.0, rtol=1e-12)
        np.testing.assert_allclose(c.forward_nacc_rate(1.0, 2.0), 0.06, rtol=1e-12)

    def test_hermite_passes_through_nodes(self):
        rates = np.array([[0.05, 0.055, 0.06, 0.058, 0.062, 0.061]])
        out = hermite_rt_interp(TENORS, rates, TENORS)
        np.testing.assert_allclose(out, rates, atol=1e-12)

    def test_hermite_between_nodes_sane(self):
        rates = np.array([[0.05, 0.055, 0.06, 0.058, 0.062, 0.061]])
        mid = hermite_rt_interp(TENORS, rates, np.array([0.75]))
        assert 0.05 < mid[0, 0] < 0.065

    def test_linear_interp(self):
        rates = np.array([[0.04, 0.06]])
        out = linear_interp(np.array([1.0, 2.0]), rates, np.array([1.5]))
        np.testing.assert_allclose(out, 0.05)

    def test_flat_extrapolation(self):
        c = YieldCurve(np.array([1.0, 2.0]), np.array([[0.04, 0.06]]),
                       interpolator=linear_interp)
        np.testing.assert_allclose(c.zero_rate(np.array([5.0]))[0, 0], 0.06)
        np.testing.assert_allclose(c.zero_rate(np.array([0.1]))[0, 0], 0.04)


class TestScenarioCube:
    def test_slices_and_round_trip(self):
        cube = _flat_cube(n_times=3, n_paths=4)
        s = cube.get_time_slice(1)
        assert isinstance(s["ZAR-SWAP"], CurveSlice)
        assert s["ZAR-SWAP"].values.shape == (4, TENORS.size)
        rebuilt = ScenarioCube.from_slices(
            cube.dates, [cube.get_time_slice(t) for t in range(3)]
        )
        np.testing.assert_allclose(
            rebuilt.factor_array("ZAR-SWAP"), cube.factor_array("ZAR-SWAP")
        )

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            ScenarioCube(_dates(3), {"X": ("scalar", np.zeros((2, 4)))})


class _ConstInstrument(Instrument):
    """NPV = level * DF-like decay to maturity; for engine plumbing tests."""

    def __init__(self, name, level, maturity):
        super().__init__(name)
        self.level = level
        self.maturity_date = maturity

    def scenario_npvs(self, val_date, market_state, fixings=None, rng=None):
        any_slice = next(iter(market_state.values()))
        n_paths = any_slice.values.shape[0]
        if val_date > self.maturity_date:
            return np.zeros(n_paths)
        return np.full(n_paths, self.level)


class TestExposureEngine:
    def test_netting_of_offsetting_trades(self):
        cube = _flat_cube()
        ns = NettingSet(
            "NS1",
            trades=[
                Trade(_ConstInstrument("a", 100.0, cube.dates[-1]), "T1"),
                Trade(_ConstInstrument("b", -100.0, cube.dates[-1]), "T2"),
            ],
        )
        prof = ExposureEngine(cube).compute(ns)
        np.testing.assert_allclose(prof.mtm, 0.0)
        np.testing.assert_allclose(prof.exposure, 0.0)

    def test_maturity_coverage_validation(self):
        cube = _flat_cube()
        late = cube.dates[-1] + dt.timedelta(days=10)
        ns = NettingSet("NS", [Trade(_ConstInstrument("a", 1.0, late), "T1")])
        with pytest.raises(ValueError, match="effective maturity"):
            ExposureEngine(cube).compute(ns)

    def test_fx_factor_validation_and_conversion(self):
        n_times, n_paths = 6, 8
        dates = _dates(n_times)
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", np.full((n_times, n_paths, TENORS.size), 0.07), TENORS),
                "FX.USDZAR": ("scalar", np.full((n_times, n_paths), 18.0)),
            },
        )
        inst = _ConstInstrument("usd", 1.0, dates[-1])
        with pytest.raises(ValueError, match="fx_rate_factor"):
            ExposureEngine(cube).compute(
                NettingSet("NS", [Trade(inst, "T1", currency="USD")])
            )
        prof = ExposureEngine(cube).compute(
            NettingSet(
                "NS",
                [Trade(inst, "T1", currency="USD", fx_rate_factor="FX.USDZAR")],
            )
        )
        np.testing.assert_allclose(prof.mtm, 18.0)

    def test_notional_scale(self):
        cube = _flat_cube()
        ns = NettingSet(
            "NS",
            [Trade(_ConstInstrument("a", 2.0, cube.dates[-1]), "T1", notional_scale=3.0)],
        )
        prof = ExposureEngine(cube).compute(ns)
        np.testing.assert_allclose(prof.mtm, 6.0)

    def test_collateral_mpor_and_thresholds(self):
        cube = _flat_cube(n_times=6)  # 30-day steps
        csa = CSA(mpor_days=30, vm_threshold=40.0)
        ns = NettingSet(
            "NS",
            [Trade(_ConstInstrument("a", 100.0, cube.dates[-1]), "T1")],
            csa=csa,
        )
        prof = ExposureEngine(cube).compute(ns)
        # t=0: lookback 30d before start -> no collateral
        np.testing.assert_allclose(prof.collateral[:, 0], 0.0)
        # t>=1: VM = max(100 - 40, 0) = 60
        np.testing.assert_allclose(prof.collateral[:, 1:], 60.0)
        np.testing.assert_allclose(prof.exposure[:, 1:], 40.0)

    def test_collateral_posted_side(self):
        cube = _flat_cube(n_times=4)
        csa = CSA(mpor_days=0, vm_threshold_post=10.0)
        ns = NettingSet(
            "NS",
            [Trade(_ConstInstrument("a", -50.0, cube.dates[-1]), "T1")],
            csa=csa,
        )
        prof = ExposureEngine(cube).compute(ns)
        np.testing.assert_allclose(prof.collateral, -40.0)  # posted 40
        np.testing.assert_allclose(prof.neg_exposure, -10.0)

    def test_fixed_im(self):
        cube = _flat_cube(n_times=3)
        csa = CSA(mpor_days=0, im_method=InitialMarginMethod.FIXED, im_amount=5.0)
        ns = NettingSet(
            "NS",
            [Trade(_ConstInstrument("a", 100.0, cube.dates[-1]), "T1")],
            csa=csa,
        )
        prof = ExposureEngine(cube).compute(ns)
        np.testing.assert_allclose(prof.collateral, 105.0)

    def test_simm_im_of_state_independent_trade_is_zero(self):
        """A state-independent NPV has zero sensitivities -> zero SIMM IM
        (collateral identical to the NONE method)."""
        cube = _flat_cube(n_times=2)
        inst = _ConstInstrument("a", 1.0, cube.dates[-1])
        simm = ExposureEngine(cube).compute(NettingSet(
            "NS", [Trade(inst, "T1")],
            csa=CSA(mpor_days=0, im_method=InitialMarginMethod.SIMM),
        ))
        none = ExposureEngine(cube).compute(NettingSet(
            "NS", [Trade(inst, "T1")],
            csa=CSA(mpor_days=0, im_method=InitialMarginMethod.NONE),
        ))
        np.testing.assert_allclose(simm.collateral, none.collateral)

    def test_risky_curve_substitution(self):
        """FORWARD close-out replaces the discount curve with the risky one."""
        n_times, n_paths = 3, 4
        dates = _dates(n_times)
        cube = ScenarioCube(
            dates,
            {
                "DISC": ("curve", np.full((n_times, n_paths, TENORS.size), 0.05), TENORS),
                "RISKY": ("curve", np.full((n_times, n_paths, TENORS.size), 0.09), TENORS),
            },
        )

        class _CurveReader(Instrument):
            discount_curve_name = "DISC"
            def __init__(self):
                super().__init__("r")
                self.maturity_date = dates[-1]
            def scenario_npvs(self, val_date, market_state, fixings=None, rng=None):
                return market_state["DISC"].values[:, 0].copy()

        inst = _CurveReader()
        base = ExposureEngine(cube).compute(NettingSet("NS", [Trade(inst, "T")]))
        np.testing.assert_allclose(base.mtm, 0.05)
        risky = ExposureEngine(cube).compute(
            NettingSet(
                "NS",
                [Trade(inst, "T")],
                csa=CSA(
                    close_out_method=CloseOutMethod.FORWARD,
                    risky_curve_name="RISKY",
                    mpor_days=0,
                ),
            )
        )
        np.testing.assert_allclose(risky.mtm[:, 0], 0.09)

    def test_static_data_merge_and_precedence(self):
        cube = _flat_cube(n_times=2, n_paths=4)
        static = StaticMarketData(
            factors={"HAZARD": ScalarSlice(np.full(4, 0.02)),
                     "ZAR-SWAP": ScalarSlice(np.full(4, -1.0))}
        )

        class _Probe(Instrument):
            def __init__(self):
                super().__init__("p")
                self.maturity_date = cube.dates[-1]
                self.seen = None
            def scenario_npvs(self, val_date, market_state, fixings=None, rng=None):
                self.seen = market_state
                return np.zeros(4)

        probe = _Probe()
        ExposureEngine(cube, static).compute(NettingSet("NS", [Trade(probe, "T")]))
        assert isinstance(probe.seen["ZAR-SWAP"], CurveSlice)  # cube wins
        assert isinstance(probe.seen["HAZARD"], ScalarSlice)


class TestIRSwap:
    def _swap(self, fixed_rate, n_years=2, **kw):
        return IRSwap(
            name="swap",
            effective_date=VAL,
            maturity_date=dt.date(VAL.year + n_years, VAL.month, VAL.day),
            notional=1_000_000,
            receive_leg=SwapLeg(LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP"),
            pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=fixed_rate),
            discount_curve_name="ZAR-SWAP",
            **kw,
        )

    def _state(self, rate=0.07, n_paths=4):
        return {
            "ZAR-SWAP": CurveSlice(
                values=np.full((n_paths, TENORS.size), rate), tenors=TENORS
            )
        }

    def test_float_leg_telescopes(self):
        """Same curve for projection and discounting: float PV =
        N * (DF(t_first_start) - DF(T_pay_last))."""
        swap = self._swap(fixed_rate=0.0)
        state = self._state(0.07)
        npv = swap.scenario_npvs(VAL, state)
        curve = YieldCurve(TENORS, state["ZAR-SWAP"].values)
        sc = swap.schedule_config
        t_last = sc.curve_year_fraction(VAL, swap.receive_schedule[-1][2])
        df = curve.discount_factor(np.array([0.0, t_last]))
        expected = 1_000_000 * (df[:, 0] - df[:, 1])
        np.testing.assert_allclose(npv, expected, rtol=1e-9)

    def test_ois_leg_telescopes_multi_period(self):
        """Multi-period OIS leg, same projection/discount curve: each
        coupon PV is N*(DF(t_start)-DF(t_end)), so the leg telescopes to
        N*(1 - DF(T_last_pay)) on ANY curve shape. Regression for the
        forward-period compounding bug: cf_future compounded from the
        valuation date instead of the period start, overstating a 2y
        quarterly leg ~2.5x (only single-period OIS was tested)."""
        rng = np.random.default_rng(7)
        vals = 0.06 + 0.004 * rng.standard_normal((4, TENORS.size)).cumsum(
            axis=1
        )
        state = {"OIS": CurveSlice(values=vals, tenors=TENORS)}
        swap = IRSwap(
            name="ois2y",
            effective_date=VAL,
            maturity_date=dt.date(VAL.year + 2, VAL.month, VAL.day),
            notional=1_000_000,
            receive_leg=SwapLeg(
                LegType.FLOATING, frequency=3, curve_name="OIS",
                overnight_compounding=True,
            ),
            pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=0.0),
            discount_curve_name="OIS",
        )
        npv = swap.scenario_npvs(VAL, state)
        curve = YieldCurve(TENORS, vals)
        sc = swap.schedule_config
        t_last = sc.curve_year_fraction(VAL, swap.receive_schedule[-1][2])
        df = curve.discount_factor(np.array([0.0, t_last]))
        np.testing.assert_allclose(
            npv, 1_000_000 * (df[:, 0] - df[:, 1]), rtol=1e-9
        )

    def test_par_swap_near_zero(self):
        state = self._state(0.07)
        curve = YieldCurve(TENORS, state["ZAR-SWAP"].values)
        swap0 = self._swap(fixed_rate=0.0)
        sc = swap0.schedule_config
        # par rate = (DF0 - DFT)/annuity on this schedule
        anns = sum(
            acc * curve.discount_factor(
                np.array([sc.curve_year_fraction(VAL, pay)])
            )[0, 0]
            for _, _, pay, acc in swap0.pay_schedule
        )
        t_last = sc.curve_year_fraction(VAL, swap0.receive_schedule[-1][2])
        df = curve.discount_factor(np.array([0.0, t_last]))
        par = (df[0, 0] - df[0, 1]) / anns
        swap = self._swap(fixed_rate=par)
        npv = swap.scenario_npvs(VAL, state)
        np.testing.assert_allclose(npv, 0.0, atol=1e-6)

    def test_beyond_maturity_zero(self):
        swap = self._swap(0.07)
        npv = swap.scenario_npvs(dt.date(2035, 1, 1), self._state())
        np.testing.assert_allclose(npv, 0.0)

    def test_reset_dates_emitted(self):
        swap = self._swap(0.07)
        resets = swap.get_reset_dates()
        assert len(resets) == len(swap.receive_schedule)
        assert all(r[1] == "ZAR-SWAP" and r[4] is False for r in resets)

    def test_engine_stamps_libor_fixings(self):
        """First-period rate must come from the t=0 curve even when priced later."""
        n_times, n_paths = 10, 4
        dates = [VAL + dt.timedelta(days=45 * i) for i in range(n_times)]
        rates = np.full((n_times, n_paths, TENORS.size), 0.07)
        rates[2:] += 0.03  # curve jumps after the first reset
        cube = ScenarioCube(dates, {"ZAR-SWAP": ("curve", rates, TENORS)})
        swap = self._swap(fixed_rate=0.07, n_years=1)
        prof = ExposureEngine(cube).compute(NettingSet("NS", [Trade(swap, "T")]))
        assert np.isfinite(prof.mtm).all()
        # after the jump the floating receiver gains value
        assert prof.mtm[0, 3] > prof.mtm[0, 0]

    def test_ois_leg_compounding_in_engine(self):
        n_times, n_paths = 10, 4
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        cube = ScenarioCube(
            dates,
            {"OIS": ("curve", np.full((n_times, n_paths, TENORS.size), 0.06), TENORS)},
        )
        swap = IRSwap(
            name="ois-swap",
            effective_date=VAL,
            maturity_date=VAL + dt.timedelta(days=180),
            notional=1_000_000,
            receive_leg=SwapLeg(
                LegType.FLOATING, frequency=6, curve_name="OIS",
                overnight_compounding=True,
            ),
            pay_leg=SwapLeg(LegType.FIXED, frequency=6, fixed_rate=0.0),
            discount_curve_name="OIS",
        )
        prof = ExposureEngine(cube).compute(NettingSet("NS", [Trade(swap, "T")]))
        assert np.isfinite(prof.mtm).all()
        # flat 6% curve: the single compounded OIS coupon is EXACTLY
        # N*(e^{0.06*tau}-1) paid at tau, discounted at 6% — i.e. the leg
        # telescopes to N*(1 - DF(tau)). A simple-rate (non-compounded)
        # regression would give N*0.06*tau*DF instead; mtm > 0 alone
        # could not tell them apart.
        sc = swap.schedule_config
        t_pay = sc.curve_year_fraction(VAL, swap.receive_schedule[-1][2])
        expected = 1_000_000 * (1.0 - np.exp(-0.06 * t_pay))
        np.testing.assert_allclose(prof.mtm[:, 0], expected, rtol=1e-9)

    def test_ois_initial_cf_seed(self):
        swap = IRSwap(
            name="s",
            effective_date=VAL - dt.timedelta(days=90),
            maturity_date=VAL + dt.timedelta(days=90),
            notional=1.0,
            receive_leg=SwapLeg(
                LegType.FLOATING, frequency=6, curve_name="OIS",
                overnight_compounding=True,
            ),
            pay_leg=SwapLeg(LegType.FIXED, frequency=6, fixed_rate=0.0),
            discount_curve_name="OIS",
            ois_initial_cfs={("OIS", VAL - dt.timedelta(days=90)): 1.015},
        )
        start = swap.receive_schedule[0][0]
        assert swap.get_ois_initial_cf("OIS", VAL - dt.timedelta(days=90)) == 1.015
        assert swap.get_ois_initial_cf("OIS", start) in (1.015, None)


class TestScheduleIM:
    def test_schedule_im_grid(self):
        from finite_difference_tpu.portfolio.csa import schedule_im_factor

        assert schedule_im_factor("interest_rate", 1.0) == 0.01
        assert schedule_im_factor("interest_rate", 3.0) == 0.02
        assert schedule_im_factor("interest_rate", 10.0) == 0.04
        assert schedule_im_factor("equity", 1.0) == 0.15
        assert schedule_im_factor("unknown-thing", 1.0) == 0.15

    def test_schedule_im_in_collateral(self):
        """Schedule IM = |notional| x bucket pct while the trade is live,
        and rolls down the maturity buckets / off at maturity."""
        cube = _flat_cube(n_times=6)  # 30-day steps
        inst = _ConstInstrument("a", 100.0, cube.dates[2])
        inst.notional = 1_000_000  # residual < 2y -> 1% IR bucket... but
        inst.asset_class = "equity"  # explicit attribute wins -> 15%
        csa = CSA(mpor_days=0, im_method=InitialMarginMethod.SCHEDULE)
        ns = NettingSet("NS", [Trade(inst, "T1")], csa=csa)
        prof = ExposureEngine(cube).compute(ns)
        # collateral = VM (=mtm above 0 threshold) + IM while trade live
        im_live = 0.15 * 1_000_000
        np.testing.assert_allclose(prof.collateral[:, 0], 100.0 + im_live)
        # after maturity the trade contributes no IM and no mtm
        np.testing.assert_allclose(prof.collateral[:, -1], 0.0)

    def test_ir_bucket_rolldown(self):
        from finite_difference_tpu.portfolio.csa import schedule_im_factor

        cube = _flat_cube(n_times=6)
        inst = _ConstInstrument("swap-like", 0.0, cube.dates[-1])
        inst.notional = 1_000_000
        inst.asset_class = "interest_rate"
        csa = CSA(mpor_days=0, im_method=InitialMarginMethod.SCHEDULE)
        ns = NettingSet("NS", [Trade(inst, "T1")], csa=csa)
        prof = ExposureEngine(cube).compute(ns)
        # residual maturity < 2y on every sim date here -> 1% bucket
        assert schedule_im_factor("interest_rate", 0.4) == 0.01
        np.testing.assert_allclose(prof.collateral[:, 0], 0.01 * 1_000_000)


class _CurveLinearInstrument(Instrument):
    """NPV = scale * curve_value_at_node(j): exact 1bp-bump sensitivity."""

    def __init__(self, name, factor, node_idx, scale, maturity):
        super().__init__(name)
        self.factor = factor
        self.node_idx = node_idx
        self.scale = scale
        self.maturity_date = maturity

    def scenario_npvs(self, val_date, market_state, fixings=None, rng=None):
        slc = market_state[self.factor]
        return self.scale * slc.values[:, self.node_idx]


class TestSimmAggregation:
    """portfolio.simm delta-margin math against hand-computed values."""

    def test_single_ir_bucket_margin_is_abs_ws(self):
        from finite_difference_tpu.portfolio.simm import ir_delta_margin

        ws = np.zeros(12)
        ws[7] = -3.5
        assert ir_delta_margin(ws) == pytest.approx(3.5)

    def test_two_ir_buckets_use_tenor_correlation(self):
        from finite_difference_tpu.portfolio.simm import (
            DEFAULT_SIMM, ir_delta_margin,
        )

        ws = np.zeros(12)
        ws[6], ws[8] = 2.0, 5.0
        rho = DEFAULT_SIMM.ir_corr()[6, 8]
        expect = np.sqrt(4.0 + 25.0 + 2 * rho * 10.0)
        assert ir_delta_margin(ws) == pytest.approx(expect, rel=1e-12)

    def test_scalar_class_intra_correlation(self):
        from finite_difference_tpu.portfolio.simm import scalar_delta_margin

        k = scalar_delta_margin([np.array(3.0), np.array(-4.0)], 0.24)
        assert k == pytest.approx(np.sqrt(9 + 16 + 2 * 0.24 * -12.0))

    def test_cross_class_psi(self):
        from finite_difference_tpu.portfolio.simm import DEFAULT_SIMM, simm_im

        ws = np.zeros(12)
        ws[7] = 10.0
        im = simm_im(ir_ws=ws, scalar_ws={"equity": [np.array(5.0)]})
        psi = DEFAULT_SIMM.cross_class_corr[0][1]
        assert im == pytest.approx(np.sqrt(100 + 25 + 2 * psi * 50.0), rel=1e-12)

    def test_bucket_assignment(self):
        from finite_difference_tpu.portfolio.simm import assign_ir_buckets

        idx = assign_ir_buckets([0.25, 5.0, 30.0, 0.04])
        np.testing.assert_array_equal(idx, [2, 7, 11, 0])

    def test_pathwise_shapes(self):
        from finite_difference_tpu.portfolio.simm import simm_im

        ws = np.zeros((7, 12))
        ws[:, 3] = np.arange(7.0)
        im = simm_im(ir_ws=ws)
        np.testing.assert_allclose(im, np.arange(7.0))


class TestSimmEngine:
    """SIMM IM through the ExposureEngine's pricing pass."""

    def _im_paths(self, ns_trades, csa, cube):
        simm_prof = ExposureEngine(cube).compute(
            NettingSet("NS", ns_trades, csa=csa)
        )
        none_prof = ExposureEngine(cube).compute(
            NettingSet("NS", ns_trades, csa=CSA(
                mpor_days=csa.mpor_days, im_method=InitialMarginMethod.NONE
            ))
        )
        return simm_prof.collateral - none_prof.collateral

    def test_linear_instrument_exact_pv01(self):
        """NPV = scale * r[j]: the 1bp bucket bump gives s = scale*1e-4,
        single-bucket margin = RW_j * s exactly."""
        from finite_difference_tpu.portfolio.simm import (
            DEFAULT_SIMM, assign_ir_buckets,
        )

        cube = _flat_cube(n_times=2)
        j = 4  # tenor 5.0y
        scale = 2.0e6
        inst = _CurveLinearInstrument(
            "lin", "ZAR-SWAP", j, scale, cube.dates[-1]
        )
        csa = CSA(mpor_days=0, im_method=InitialMarginMethod.SIMM)
        im = self._im_paths([Trade(inst, "T1")], csa, cube)
        bucket = int(assign_ir_buckets(TENORS)[j])
        expect = DEFAULT_SIMM.ir_risk_weights[bucket] * scale * 1e-4
        np.testing.assert_allclose(im[:, 0], expect, rtol=1e-9)

    def test_im_scales_with_notional(self):
        cube = _flat_cube(n_times=3)
        swap = IRSwap(
            name="irs", effective_date=VAL,
            maturity_date=cube.dates[-1], notional=1e6,
            receive_leg=SwapLeg(LegType.FLOATING, frequency=1,
                                curve_name="ZAR-SWAP"),
            pay_leg=SwapLeg(LegType.FIXED, frequency=1, fixed_rate=0.075),
            discount_curve_name="ZAR-SWAP",
        )
        csa = CSA(mpor_days=0, im_method=InitialMarginMethod.SIMM)
        im1 = self._im_paths([Trade(swap, "T1")], csa, cube)
        im2 = self._im_paths([Trade(swap, "T1", notional_scale=2.0)], csa, cube)
        assert im1[0, 0] > 0.0
        np.testing.assert_allclose(im2, 2.0 * im1, rtol=1e-9)

    def test_scalar_factor_class_and_netting(self):
        """Equity ScalarSlice sensitivity: NPV = w * spot -> s = w*spot*1%,
        WS = RW_eq * s; two offsetting trades net to zero IM."""
        from finite_difference_tpu.portfolio.simm import DEFAULT_SIMM

        n_times, n_paths = 2, 4
        dates = _dates(n_times)
        spot = 150.0
        factors = {
            "EQ-SPOT": ("scalar", np.full((n_times, n_paths), spot)),
        }
        cube = ScenarioCube(dates, factors)

        class _SpotLinear(Instrument):
            def __init__(self, name, w, maturity):
                super().__init__(name)
                self.w = w
                self.maturity_date = maturity

            def scenario_npvs(self, val_date, market_state, fixings=None,
                              rng=None):
                return self.w * market_state["EQ-SPOT"].values

        csa = CSA(mpor_days=0, im_method=InitialMarginMethod.SIMM)
        inst = _SpotLinear("eq", 100.0, dates[-1])
        im = self._im_paths([Trade(inst, "T1")], csa, cube)
        expect = DEFAULT_SIMM.scalar_risk_weights["equity"] * 100.0 * spot * 0.01
        np.testing.assert_allclose(im[:, 0], expect, rtol=1e-9)

        hedged = [
            Trade(inst, "T1"),
            Trade(_SpotLinear("eq2", -100.0, dates[-1]), "T2"),
        ]
        im_h = self._im_paths(hedged, csa, cube)
        np.testing.assert_allclose(im_h, 0.0, atol=1e-12)

    def test_factor_restriction(self):
        from finite_difference_tpu.portfolio.simm import SimmConfig

        cube = _flat_cube(n_times=2, names=("ZAR-SWAP", "OTHER"))
        inst = _CurveLinearInstrument(
            "lin", "ZAR-SWAP", 2, 1e6, cube.dates[-1]
        )
        csa = CSA(
            mpor_days=0, im_method=InitialMarginMethod.SIMM,
            simm_config=SimmConfig(factors=("OTHER",)),
        )
        im = self._im_paths([Trade(inst, "T1")], csa, cube)
        np.testing.assert_allclose(im, 0.0, atol=1e-12)
