import numpy as np
import pytest
import jax.numpy as jnp

from finite_difference_tpu.models.mc import CSParams
from finite_difference_tpu.xva import (
    CommodityForward,
    CommodityXvaEngine,
    CounterpartyConfig,
    DiscountingConfig,
    FixingSchedule,
    ReferencePrice,
    SamplingConvention,
    SimulationConfig,
    TimeGrid,
    XvaCalculator,
)


class TestTimeGrid:
    def test_regular(self):
        tg = TimeGrid.regular(dt_days=5, horizon_days=17)
        assert tg.scen_days[0] == 0 and tg.scen_days[-1] == 17
        assert tg.n_steps == 5
        np.testing.assert_allclose(tg.year_fractions(365.0)[-1], 17 / 365.0)

    def test_validation(self):
        with pytest.raises(ValueError):
            TimeGrid.regular(0, 10)
        with pytest.raises(ValueError):
            TimeGrid.regular(1, 0)


class TestFixingSchedule:
    def test_conventions(self):
        assert FixingSchedule(10, 30, SamplingConvention.BULLET).sample_days().tolist() == [30.0]
        daily = FixingSchedule(10, 12, SamplingConvention.DAILY).sample_days()
        np.testing.assert_array_equal(daily, [10, 11, 12])
        weekly = FixingSchedule(0, 21, SamplingConvention.WEEKLY).sample_days()
        np.testing.assert_array_equal(weekly, [0, 7, 14, 21])
        monthly = FixingSchedule(0, 90, SamplingConvention.MONTHLY).sample_days()
        np.testing.assert_array_equal(monthly, [0, 30, 60, 90])

    def test_offset_and_validation(self):
        s = FixingSchedule(10, 12, SamplingConvention.DAILY, offset_days=2)
        np.testing.assert_array_equal(s.sample_days(), [12, 13, 14])
        with pytest.raises(ValueError):
            FixingSchedule(10, 5).sample_days()


class TestReferencePrice:
    def _curves(self, n_steps=3, n_sims=4):
        # flat-in-tenor curves with known level per step: level = 100 + step
        tenor_days = np.array([0.0, 100.0, 200.0])
        curves = jnp.asarray(
            np.broadcast_to(
                (100.0 + np.arange(n_steps))[:, None, None], (n_steps, 3, n_sims)
            )
        )
        return tenor_days, curves

    def test_future_only_average(self):
        tenor_days, curves = self._curves()
        rp = ReferencePrice(FixingSchedule(50, 52, SamplingConvention.DAILY),
                            settlement_lag_days=0)
        out = rp.compute_all(np.array([0.0, 1.0, 2.0]), curves, tenor_days)
        np.testing.assert_allclose(np.asarray(out)[:, 0], [100.0, 101.0, 102.0])

    def test_realised_mix(self):
        tenor_days, curves = self._curves()
        rp = ReferencePrice(
            FixingSchedule(0, 2, SamplingConvention.DAILY),
            settlement_lag_days=0,
            realised_fixings={0: 90.0, 1: 80.0},
        )
        out = np.asarray(rp.compute_all(np.array([0.0, 1.0, 2.0]), curves, tenor_days))
        # at t=0: day0 realised (90), days1,2 from curve (100) -> (90+200)/3
        np.testing.assert_allclose(out[0, 0], (90.0 + 2 * 100.0) / 3.0)
        # at t=1: days0,1 realised, day2 curve level 101
        np.testing.assert_allclose(out[1, 0], (90.0 + 80.0 + 101.0) / 3.0)

    def test_tenor_interpolation_and_lag(self):
        tenor_days = np.array([0.0, 100.0])
        # curve rises linearly in tenor: F(T)=T
        base = np.array([[0.0], [100.0]])
        curves = jnp.asarray(base[None, :, :])
        rp = ReferencePrice(
            FixingSchedule(40, 40, SamplingConvention.BULLET), settlement_lag_days=10
        )
        out = np.asarray(rp.compute_all(np.array([0.0]), curves, tenor_days))
        np.testing.assert_allclose(out[0, 0], 50.0)  # query at 40+10

    def test_flat_extrapolation(self):
        tenor_days = np.array([10.0, 20.0])
        curves = jnp.asarray(np.array([[[5.0]], [[7.0]]])[None, :, :, 0])
        rp = ReferencePrice(
            FixingSchedule(90, 90, SamplingConvention.BULLET), settlement_lag_days=0
        )
        out = np.asarray(rp.compute_all(np.array([0.0]), curves, tenor_days))
        np.testing.assert_allclose(out[0, 0], 7.0)

    def test_single_date_api(self):
        tenor_days, curves = self._curves()
        rp = ReferencePrice(FixingSchedule(50, 52), settlement_lag_days=0)
        single = np.asarray(rp.compute(1, 1.0, curves[1], tenor_days))
        np.testing.assert_allclose(single, 101.0)


class TestXvaCalculator:
    def test_profile_and_cva_flat_exposure(self):
        """Flat unit EE, no discounting: CVA = LGD * (1 - S(T))."""
        cp = CounterpartyConfig(hazard_rate=0.02, recovery=0.4)
        calc = XvaCalculator(cp, days_in_year=365.0, discount_to_zero=False)
        times = np.linspace(0.0, 365.0, 50)
        mtm = jnp.ones((50, 1000))
        prof = calc.build_exposure_profile(times, mtm)
        np.testing.assert_allclose(prof.ee, 1.0)
        np.testing.assert_allclose(prof.pfe, 1.0)
        cva = calc.cva_from_ee(times, prof.ee)
        assert cva == pytest.approx(0.6 * (1.0 - np.exp(-0.02)), rel=1e-12)

    def test_negative_exposure_floored(self):
        cp = CounterpartyConfig(hazard_rate=0.02)
        calc = XvaCalculator(cp, days_in_year=365.0, discount_to_zero=False)
        prof = calc.build_exposure_profile(
            np.array([0.0, 100.0]), jnp.full((2, 10), -5.0)
        )
        np.testing.assert_allclose(prof.ee, 0.0)

    def test_discount_to_zero(self):
        cp = CounterpartyConfig(hazard_rate=0.0)
        calc = XvaCalculator(
            cp, days_in_year=365.0, discount_to_zero=True, flat_discount_rate=0.05
        )
        prof = calc.build_exposure_profile(np.array([0.0, 365.0]), jnp.ones((2, 4)))
        np.testing.assert_allclose(prof.ee, [1.0, np.exp(-0.05)])


class TestCommodityXvaEngine:
    def _engine(self, n_sims=20_000, hazard=0.03):
        sim_cfg = SimulationConfig(
            num_sims=n_sims, seed=1, dt_days=10, horizon_days=180, days_in_year=365.0
        )
        tenor_days = np.array([30.0, 90.0, 180.0, 270.0])
        initial_curve = np.array([100.0, 102.0, 104.0, 106.0])
        return CommodityXvaEngine(
            sim_cfg=sim_cfg,
            cs_params=CSParams(alpha=1.0, sigma=0.3, mu=0.0),
            initial_curve=initial_curve,
            tenor_days=tenor_days,
            discounting=DiscountingConfig(rate=0.05),
            counterparty=CounterpartyConfig(hazard_rate=hazard, recovery=0.4),
            rng_backend="threefry",
        )

    def _trade(self, strike=100.0):
        rp = ReferencePrice(
            FixingSchedule(170, 180, SamplingConvention.DAILY), settlement_lag_days=2
        )
        return CommodityForward(
            maturity_day=185,
            strike=strike,
            notional=1.0,
            reference_price=rp,
            discounting=DiscountingConfig(rate=0.05),
        )

    def test_atm_forward_cva_positive_and_bounded(self):
        res = self._engine().run_forward_cva(self._trade())
        assert res.cva > 0.0
        # CVA bounded by LGD * max EE
        assert res.cva < 0.6 * res.exposure_profile.ee.max() * 1.01
        assert res.mtm_paths.shape == (res.times_days.size, 20_000)
        # PFE dominates EE pointwise
        assert np.all(res.exposure_profile.pfe >= res.exposure_profile.ee - 1e-12)

    def test_martingale_mtm_expectation(self):
        """Risk-neutral: E[MTM_t deflated] should be ~flat in t for a forward."""
        res = self._engine(n_sims=50_000).run_forward_cva(self._trade(strike=102.0))
        mtm = np.asarray(res.mtm_paths)
        mean0 = mtm[0].mean()
        meanT = mtm[-1].mean()
        # undiscounted forward MTM expectation moves only by discounting effects
        assert meanT == pytest.approx(mean0, abs=0.25)

    def test_deep_itm_forward_cva_scales_with_hazard(self):
        low = self._engine(hazard=0.01).run_forward_cva(self._trade(strike=50.0)).cva
        high = self._engine(hazard=0.05).run_forward_cva(self._trade(strike=50.0)).cva
        assert high > low > 0

    def test_sobol_backend_runs(self):
        sim_cfg = SimulationConfig(num_sims=512, seed=1, dt_days=30, horizon_days=90)
        eng = CommodityXvaEngine(
            sim_cfg=sim_cfg,
            cs_params=CSParams(alpha=1.0, sigma=0.2, mu=0.0),
            initial_curve=np.array([100.0, 101.0]),
            tenor_days=np.array([60.0, 120.0]),
            discounting=DiscountingConfig(rate=0.03),
            counterparty=CounterpartyConfig(hazard_rate=0.02),
            rng_backend="sobol",
        )
        res = eng.run_forward_cva(self._trade(strike=100.0))
        assert np.isfinite(res.cva)
