import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.market_data import (
    CPIPublication,
    CurveSlice,
    HistoricalCPI,
    ScalarSlice,
    ScenarioCube,
    YieldCurve,
    besa_bracket,
    first_of_month,
    shift_months,
)
from finite_difference_tpu.instruments import (
    EquityTRS,
    IndexLinkedSwap,
    InflationLeg,
    LegType,
    SwapLeg,
    equity_forward_price,
    filter_future_periods,
    get_cpi_level,
)
from finite_difference_tpu.portfolio import NettingSet, Trade
from finite_difference_tpu.xva import ExposureEngine

VAL = dt.date(2025, 7, 28)
TENORS = np.array([0.25, 0.5, 1.0, 2.0, 5.0, 10.0])


class TestCPIConventions:
    def test_besa_bracket_mid_month(self):
        j, j1 = besa_bracket(dt.date(2025, 7, 15))
        assert j == dt.date(2025, 3, 1) and j1 == dt.date(2025, 4, 1)

    def test_besa_bracket_first_of_month(self):
        j, j1 = besa_bracket(dt.date(2025, 7, 1))
        assert j == j1 == dt.date(2025, 3, 1)

    def test_publication_interp(self):
        cpi = CPIPublication({dt.date(2025, 3, 1): 100.0, dt.date(2025, 4, 1): 103.1})
        # July 2025 has 31 days; day 16 -> fraction 15/31
        got = cpi.published_cpi(dt.date(2025, 7, 16))
        assert got == pytest.approx(100.0 + (15 / 31) * 3.1)
        assert cpi.published_cpi(dt.date(2025, 7, 1)) == 100.0

    def test_historical_cpi_extension(self):
        """CPI_next = CPI_prev * DF(prev)/DF(next) with flat 6% inflation."""
        rate = 0.06
        df = lambda d: np.exp(-rate * (d - VAL).days / 365.0)
        hist = HistoricalCPI(
            VAL,
            {dt.date(2025, 6, 1): 100.0},
            discount_factor_fn=df,
            extend_cpi=24,
        )
        # one year out the index should have grown ~e^0.06
        one_year = hist.monthly_cpi[dt.date(2026, 6, 1)]
        assert one_year == pytest.approx(100.0 * np.exp(0.06), rel=5e-3)
        # cpi_value triggers on-demand extension
        v = hist.cpi_value(dt.date(2027, 12, 15))
        assert v > one_year

    def test_on_demand_extension_continues_the_same_ladder(self):
        """Re-extension in cpi_value must land on the SAME DF-ratio ladder
        as a single up-front extension on a non-flat curve. Regression:
        each re-extension re-anchored at the last projected month with a
        fresh df_anchor=1, so month k+1 grew by the 1-month SPOT rate
        instead of the forward rate k months out — a kink in projected
        CPI whenever the curve isn't flat."""
        # steeply upward-sloping zero curve: spot 2%, long end ~10%
        df = lambda d: np.exp(
            -(0.02 + 0.08 * min((d - VAL).days / 3650.0, 1.0))
            * (d - VAL).days / 365.0
        )
        short = HistoricalCPI(
            VAL, {dt.date(2025, 6, 1): 100.0},
            discount_factor_fn=df, extend_cpi=3,
        )
        full = HistoricalCPI(
            VAL, {dt.date(2025, 6, 1): 100.0},
            discount_factor_fn=df, extend_cpi=60,
        )
        # force on-demand re-extension years past the first horizon
        probe = dt.date(2029, 8, 15)
        assert short.cpi_value(probe) == pytest.approx(
            full.cpi_value(probe), rel=1e-12
        )
        # the whole re-extended map matches the up-front one
        for m, v in short.monthly_cpi.items():
            assert v == pytest.approx(full.monthly_cpi[m], rel=1e-12), m

    def test_shift_months(self):
        assert shift_months(dt.date(2025, 1, 15), -1) == dt.date(2024, 12, 1)
        assert first_of_month(dt.date(2025, 7, 28)) == dt.date(2025, 7, 1)


class TestGetCpiLevel:
    def test_riskflow_projection_from_anchor(self):
        """Unpublished dates project CPI(T_last_pub)/DF_infl."""
        infl_curve = YieldCurve(TENORS, np.full((4, TENORS.size), 0.05))
        hist = {dt.date(2025, 6, 1): 100.0}
        ref = dt.date(2026, 6, 1)
        out = get_cpi_level(
            ref, VAL, hist, 4,
            inflation_rate_curve=infl_curve,
            last_pub_date=dt.date(2025, 6, 1),
        )
        t = (ref - dt.date(2025, 6, 1)).days / 365.0
        np.testing.assert_allclose(out, 100.0 * np.exp(0.05 * t), rtol=1e-12)

    def test_published_requires_fixing(self):
        infl_curve = YieldCurve(TENORS, np.full((1, TENORS.size), 0.05))
        with pytest.raises(ValueError, match="Missing published CPI fixing"):
            get_cpi_level(
                dt.date(2025, 5, 1), VAL, {}, 1,
                inflation_rate_curve=infl_curve,
                last_pub_date=dt.date(2025, 6, 1),
            )

    def test_fixing_priority_for_published(self):
        infl_curve = YieldCurve(TENORS, np.full((2, TENORS.size), 0.05))
        fix = {dt.date(2025, 5, 1): np.array([101.0, 102.0])}
        out = get_cpi_level(
            dt.date(2025, 5, 1), VAL, {dt.date(2025, 5, 1): 99.0}, 2,
            cpi_fixings=fix,
            inflation_rate_curve=infl_curve,
            last_pub_date=dt.date(2025, 6, 1),
        )
        np.testing.assert_allclose(out, [101.0, 102.0])

    def test_unpublished_ignores_own_fixing(self):
        """Projection must anchor at T_last_pub even if a pre-stamped value
        exists for the ref date itself."""
        infl_curve = YieldCurve(TENORS, np.full((1, TENORS.size), 0.05))
        ref = dt.date(2025, 7, 1)
        fix = {ref: np.array([555.0]), dt.date(2025, 6, 1): np.array([100.0])}
        out = get_cpi_level(
            ref, VAL, {}, 1,
            cpi_fixings=fix,
            inflation_rate_curve=infl_curve,
            last_pub_date=dt.date(2025, 6, 1),
        )
        assert out[0] != 555.0 and 100.0 < out[0] < 101.0


def _ils(n_years=3, real_rate=0.025, infl_rate=0.05, nominal_rate=0.08):
    hist = {shift_months(first_of_month(VAL), -k): 100.0 for k in range(0, 8)}
    leg = InflationLeg(
        real_rate=real_rate,
        base_cpi=100.0,
        cpi_curve_name="CPI.ZA",
        frequency=6,
        inflation_rate_curve_name="INFL.ZA",
    )
    nominal = SwapLeg(LegType.FIXED, frequency=6, fixed_rate=nominal_rate)
    return IndexLinkedSwap(
        name="ils",
        effective_date=VAL,
        maturity_date=dt.date(VAL.year + n_years, VAL.month, VAL.day),
        notional=1_000_000,
        inflation_leg=leg,
        nominal_leg=nominal,
        discount_curve_name="ZAR-SWAP",
        inflation_index=hist,
    )


def _ils_state(n_paths=4, disc=0.08, infl=0.05, cpi_spot=100.0):
    return {
        "ZAR-SWAP": CurveSlice(np.full((n_paths, TENORS.size), disc), TENORS),
        "INFL.ZA": CurveSlice(np.full((n_paths, TENORS.size), infl), TENORS),
        "CPI.ZA": ScalarSlice(np.full(n_paths, cpi_spot)),
    }


class TestIndexLinkedSwap:
    def test_cpi_reference_dates_sorted_unique(self):
        swap = _ils()
        refs = swap.get_cpi_reference_dates()
        dates = [d for d, _ in refs]
        assert dates == sorted(dates) and len(set(dates)) == len(dates)
        assert all(nm == "CPI.ZA" for _, nm in refs)

    def test_npv_finite_and_sign_convention(self):
        swap = _ils()
        state = _ils_state()
        npv_recv = swap.scenario_npvs(VAL, state)
        swap.inflation_receiver = False
        npv_pay = swap.scenario_npvs(VAL, state)
        np.testing.assert_allclose(npv_recv, -npv_pay)
        assert np.isfinite(npv_recv).all()

    def test_higher_inflation_raises_inflation_leg(self):
        lo = _ils().scenario_npvs(VAL, _ils_state(infl=0.03))
        hi = _ils().scenario_npvs(VAL, _ils_state(infl=0.07))
        assert (hi > lo).all()

    def test_t_last_pub(self):
        swap = _ils()
        assert swap.get_cpi_last_pub_date(dt.date(2025, 7, 28)) == dt.date(2025, 6, 1)

    def test_in_engine_with_cpi_stamping(self):
        n_times, n_paths = 8, 4
        dates = [VAL + dt.timedelta(days=91 * i) for i in range(n_times)]
        swap = _ils(n_years=1)
        # CPI spot grows 5%/yr along the path
        t_years = np.array([(d - VAL).days / 365.0 for d in dates])
        cpi_path = 100.0 * np.exp(0.05 * t_years)
        cube = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", np.full((n_times, n_paths, TENORS.size), 0.08), TENORS),
                "INFL.ZA": ("curve", np.full((n_times, n_paths, TENORS.size), 0.05), TENORS),
                "CPI.ZA": ("scalar", np.broadcast_to(cpi_path[:, None], (n_times, n_paths)).copy()),
            },
        )
        prof = ExposureEngine(cube).compute(NettingSet("NS", [Trade(swap, "T")]))
        assert np.isfinite(prof.mtm).all()
        assert np.abs(prof.mtm).max() > 0
        # deterministic cube (every path identical) -> every MTM column
        # must be path-constant; a path-indexing bug in the stamping
        # would break this while staying finite/nonzero
        np.testing.assert_allclose(
            prof.mtm,
            np.broadcast_to(prof.mtm[:1, :], prof.mtm.shape),
            rtol=1e-12,
        )
        # the stamped fixings must actually FEED later valuations: bump
        # the CPI path at one EARLY date only (a value that becomes a
        # lagged historical fixing for later dates) and the later MTMs
        # move — ignoring the path (e.g. always using spot CPI=100)
        # passes the finiteness checks but not this
        cpi_bumped = np.broadcast_to(
            cpi_path[:, None], (n_times, n_paths)
        ).copy()
        cpi_bumped[1, :] *= 1.02
        cube2 = ScenarioCube(
            dates,
            {
                "ZAR-SWAP": ("curve", np.full((n_times, n_paths, TENORS.size), 0.08), TENORS),
                "INFL.ZA": ("curve", np.full((n_times, n_paths, TENORS.size), 0.05), TENORS),
                "CPI.ZA": ("scalar", cpi_bumped),
            },
        )
        prof2 = ExposureEngine(cube2).compute(
            NettingSet("NS", [Trade(_ils(n_years=1), "T")])
        )
        later = np.abs(prof2.mtm[0, 2:] - prof.mtm[0, 2:]).max()
        assert later > 1e-6, "early CPI stamp did not propagate"


class TestEquityForward:
    def test_cost_of_carry(self):
        spot = np.array([100.0, 200.0])
        carry = YieldCurve(TENORS, np.full((2, TENORS.size), 0.06))
        div = YieldCurve(TENORS, np.full((2, TENORS.size), 0.02))
        F, _, _ = equity_forward_price(spot, carry, div, 1.0)
        np.testing.assert_allclose(F, spot * np.exp(0.04), rtol=1e-12)

    def test_settlement_anchor(self):
        spot = np.array([100.0])
        carry = YieldCurve(TENORS, np.full((1, TENORS.size), 0.06))
        F, _, _ = equity_forward_price(spot, carry, None, 1.0, t0=0.5)
        np.testing.assert_allclose(F, 100.0 * np.exp(0.06 * 0.5), rtol=1e-12)


def _trs(scaling="Price", interest_scaling="Initial Price", initial_price=100.0,
         spot_lag=0):
    return EquityTRS(
        name="trs",
        effective_date=VAL,
        maturity_date=dt.date(2026, 7, 28),
        quantity=1000.0,
        notional=100_000.0,
        interest_leg=SwapLeg(
            LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP", spread=0.01
        ),
        spot_name="EQ.SPOT",
        carry_curve_name="ZAR-SWAP",
        dividend_curve_name="EQ.DIV",
        discount_curve_name="ZAR-SWAP",
        initial_price=initial_price,
        return_nominal_scaling=scaling,
        interest_nominal_scaling=interest_scaling,
        spot_lag=spot_lag,
    )


def _trs_state(n_paths=4, spot=100.0, r=0.07, q=0.02):
    return {
        "EQ.SPOT": ScalarSlice(np.full(n_paths, spot)),
        "ZAR-SWAP": CurveSlice(np.full((n_paths, TENORS.size), r), TENORS),
        "EQ.DIV": CurveSlice(np.full((n_paths, TENORS.size), q), TENORS),
    }


class TestEquityTRS:
    def test_future_periods_filter(self):
        trs = _trs()
        future = filter_future_periods(trs.return_schedule, VAL)
        assert len(future) == len(trs.return_schedule)
        future2 = filter_future_periods(
            trs.return_schedule, VAL + dt.timedelta(days=120)
        )
        assert len(future2) < len(future)

    def test_receiver_payer_antisymmetry(self):
        state = _trs_state()
        recv = _trs()
        pay = _trs()
        pay.is_receiver = False
        np.testing.assert_allclose(
            recv.scenario_npvs(VAL, state), -pay.scenario_npvs(VAL, state)
        )

    def test_return_leg_tracks_spot(self):
        lo = _trs().scenario_npvs(VAL, _trs_state(spot=100.0))
        hi = _trs().scenario_npvs(VAL, _trs_state(spot=110.0))
        assert (hi > lo).all()

    def test_price_vs_initial_price_scaling_single_period(self):
        """For a single in-progress period with initial_price == spot and
        notional == quantity * initial_price the two scalings coincide:
        q*(F_end - S0) == N*(F_end/S0 - 1)."""
        state = _trs_state(spot=100.0)
        def mk(scaling):
            trs = _trs(scaling=scaling)
            trs.__init__(
                name="trs1p", effective_date=VAL,
                maturity_date=dt.date(2025, 10, 28),
                quantity=1000.0, notional=100_000.0,
                interest_leg=SwapLeg(
                    LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP", spread=0.01
                ),
                spot_name="EQ.SPOT", carry_curve_name="ZAR-SWAP",
                dividend_curve_name="EQ.DIV", discount_curve_name="ZAR-SWAP",
                initial_price=100.0, return_nominal_scaling=scaling,
            )
            return trs
        p = mk("Price").scenario_npvs(VAL, state)
        ip = mk("Initial Price").scenario_npvs(VAL, state)
        np.testing.assert_allclose(p, ip, rtol=1e-9)

    def test_equity_reset_schedule_includes_ends(self):
        trs = _trs()
        resets = trs.get_equity_reset_schedule()
        starts = {s for s, _, _, _ in trs.return_schedule}
        ends = {e for _, e, _, _ in trs.return_schedule}
        assert starts | ends <= set(resets)

    def test_in_engine_stamps_equity_fixings(self):
        n_times, n_paths = 10, 8
        dates = [VAL + dt.timedelta(days=45 * i) for i in range(n_times)]
        rng = np.random.default_rng(1)
        spot_paths = 100.0 * np.exp(
            np.cumsum(rng.normal(0, 0.05, (n_times, n_paths)), axis=0)
        )
        cube = ScenarioCube(
            dates,
            {
                "EQ.SPOT": ("scalar", spot_paths),
                "ZAR-SWAP": ("curve", np.full((n_times, n_paths, TENORS.size), 0.07), TENORS),
                "EQ.DIV": ("curve", np.full((n_times, n_paths, TENORS.size), 0.02), TENORS),
            },
        )
        trs = _trs()
        trs.maturity_date = dates[-1]
        trs.__init__(
            name="trs2", effective_date=VAL, maturity_date=dates[-2],
            quantity=1000.0, notional=100_000.0,
            interest_leg=SwapLeg(LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP"),
            spot_name="EQ.SPOT", carry_curve_name="ZAR-SWAP",
            dividend_curve_name="EQ.DIV", discount_curve_name="ZAR-SWAP",
            initial_price=100.0,
        )
        prof = ExposureEngine(cube).compute(NettingSet("NS", [Trade(trs, "T")]))
        assert np.isfinite(prof.mtm).all()
        # exposure should vary across paths once resets are stamped
        assert prof.mtm[:, 5].std() > 0


class TestCommodityInstruments:
    def _cube(self, n_times=8, n_paths=6):
        from finite_difference_tpu.market_data import ScenarioCube

        dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
        fwd_tenors = np.array([0.0, 0.5, 1.0, 2.0])
        # forward curve level drifts up deterministically per step
        fwd = np.broadcast_to(
            (100.0 + np.arange(n_times))[:, None, None],
            (n_times, n_paths, fwd_tenors.size),
        ).copy()
        disc = np.full((n_times, n_paths, TENORS.size), 0.06)
        return ScenarioCube(
            dates,
            {
                "FWD.OIL": ("curve", fwd, fwd_tenors),
                "ZAR-SWAP": ("curve", disc, TENORS),
            },
        )

    def test_forward_instrument_stamps_fixing(self):
        from finite_difference_tpu.instruments import CommodityForwardInstrument

        cube = self._cube()
        delivery = cube.dates[3]
        inst = CommodityForwardInstrument(
            "fwd", delivery_date=delivery, strike=100.0, notional=1.0,
            forward_curve_name="FWD.OIL", discount_curve_name="ZAR-SWAP",
        )
        prof = ExposureEngine(cube).compute(NettingSet("NS", [Trade(inst, "T")]))
        # after delivery the NPV is zero
        np.testing.assert_allclose(prof.mtm[:, 4:], 0.0)
        # at delivery step the realized fixing (level 103) is locked in:
        # mtm = df * (103 - 100)
        assert prof.mtm[0, 3] == pytest.approx(3.0, rel=1e-6)
        assert np.isfinite(prof.mtm).all()

    def test_average_forward_uses_stamped_history(self):
        from finite_difference_tpu.instruments import (
            CommodityAverageForwardInstrument,
        )

        cube = self._cube()
        avg_dates = [cube.dates[2], cube.dates[3], cube.dates[4]]
        inst = CommodityAverageForwardInstrument(
            "avg", averaging_dates=avg_dates, payment_date=cube.dates[5],
            strike=100.0, notional=1.0,
            forward_curve_name="FWD.OIL", discount_curve_name="ZAR-SWAP",
        )
        prof = ExposureEngine(cube).compute(NettingSet("NS", [Trade(inst, "T")]))
        # at the payment step the average of stamped levels (102,103,104)=103
        # discounted zero days -> mtm = 3
        assert prof.mtm[0, 5] == pytest.approx(3.0, rel=1e-6)
        np.testing.assert_allclose(prof.mtm[:, 6:], 0.0)
