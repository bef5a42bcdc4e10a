import datetime as dt

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from finite_difference_tpu.models.mc import (
    CSForwardCurveSimulator,
    CSParams,
    GBMParams,
    GBMSimulator,
    MCConfig,
    SobolNormalRng,
    price_discrete_barrier_mc,
)
from finite_difference_tpu.models.mc.discrete_barrier import BarrierSpec, RebateSpec
from finite_difference_tpu.models.analytic import generalized_bs_price
from finite_difference_tpu.utils.calendars import build_monitoring_dates
from finite_difference_tpu.utils.curves import flat_curve

VAL = dt.date(2025, 7, 28)
MAT = dt.date(2025, 8, 28)


class TestSobol:
    def test_moments_and_shape(self):
        z = SobolNormalRng(seed=7).draw_normals(2, 4096)
        assert z.shape == (2, 4096)
        assert abs(z.mean()) < 0.02
        assert abs(z.std() - 1.0) < 0.02

    def test_torch_parity_backend(self):
        """The torch backend must reproduce the reference's Sobol sequence
        (rng.py draws via torch.quasirandom.SobolEngine)."""
        torch = pytest.importorskip("torch")
        z_ours = SobolNormalRng(seed=3, backend="torch").draw_normals(1, 64)
        engine = torch.quasirandom.SobolEngine(dimension=1, scramble=True, seed=3)
        sob = engine.draw(64, dtype=torch.float64)
        eps = torch.finfo(torch.float64).eps
        u = 0.5 + (1.0 - eps) * (sob - 0.5)
        z_ref = (1.4142135623730951 * torch.erfinv(2.0 * u - 1.0)).numpy().T
        np.testing.assert_allclose(z_ours, z_ref, rtol=1e-12)

    def test_fast_forward(self):
        full = SobolNormalRng(seed=5).draw_normals(1, 32)
        tail = SobolNormalRng(seed=5, fast_forward=16).draw_normals(1, 16)
        np.testing.assert_allclose(full[:, 16:], tail, rtol=1e-12)


class TestGBM:
    def test_martingale_and_lognormal(self):
        sim = GBMSimulator(GBMParams(mu=0.05, sigma=0.2), days_in_year=365.0)
        days = np.arange(0, 366, 5)
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (len(days), 100_000))
        paths = np.asarray(sim.simulate(100.0, days, z))
        t = days[-1] / 365.0
        expected = 100.0 * np.exp(0.05 * t)
        assert paths[-1].mean() == pytest.approx(expected, rel=5e-3)
        log_std = np.log(paths[-1]).std()
        assert log_std == pytest.approx(0.2 * np.sqrt(t), rel=1e-2)

    def test_sanity_check_z(self):
        z = np.random.default_rng(0).standard_normal((50, 10000))
        d = GBMSimulator.sanity_check_z(z)
        assert abs(d["mean"]) < 0.01 and abs(d["std"] - 1) < 0.01
        assert abs(d["kurtosis"] - 3.0) < 0.1


class TestClewlowStrickland:
    def test_martingale_risk_neutral(self):
        """Risk-neutral mode: E[F(t,T)] = F(0,T) per tenor."""
        params = CSParams(alpha=1.2, sigma=0.35, mu=0.08)
        sim = CSForwardCurveSimulator(params, days_in_year=365.25)
        tenors = np.array([30.0, 90.0, 180.0, 365.0])
        scen = np.array([0.0, 5.0, 10.0, 30.0, 60.0, 90.0])
        f0 = np.array([50.0, 52.0, 55.0, 60.0])
        z = jax.random.normal(jax.random.PRNGKey(1), (len(scen), 200_000))
        paths = np.asarray(sim.simulate(f0, tenors, scen, z, risk_neutral=True))
        assert paths.shape == (6, 4, 200_000)
        means = paths[-1].mean(axis=1)
        np.testing.assert_allclose(means, f0, rtol=5e-3)

    def test_variance_stops_at_delivery(self):
        """A tenor that matures mid-grid must stop accumulating variance."""
        params = CSParams(alpha=0.8, sigma=0.4, mu=0.0)
        sim = CSForwardCurveSimulator(params, days_in_year=365.25)
        tenors = np.array([10.0, 365.0])
        scen = np.array([0.0, 5.0, 10.0, 50.0, 100.0])
        z = jax.random.normal(jax.random.PRNGKey(2), (5, 50_000))
        paths = np.asarray(sim.simulate(np.array([50.0, 50.0]), tenors, scen, z))
        var_short = np.log(paths[:, 0, :]).var(axis=1)
        # variance at step 2 (day 10, = delivery) equals variance at day 100
        assert var_short[2] == pytest.approx(var_short[4], rel=1e-9)
        var_long = np.log(paths[:, 1, :]).var(axis=1)
        assert var_long[4] > var_long[2] > 0

    def test_drift_matches_theory(self):
        """Historical mode: E[F(t,T)] = F0 e^{mu t}
        (martingale test from cs_diagnostics.py:235)."""
        params = CSParams(alpha=1.0, sigma=0.2, mu=0.1)
        sim = CSForwardCurveSimulator(params, days_in_year=365.25)
        tenors = np.array([365.0])
        scen = np.array([0.0, 60.0, 120.0, 182.0])
        z = jax.random.normal(jax.random.PRNGKey(3), (4, 200_000))
        paths = np.asarray(sim.simulate(np.array([40.0]), tenors, scen, z))
        t = 182.0 / 365.25
        assert paths[-1, 0].mean() == pytest.approx(40.0 * np.exp(params.mu * t), rel=5e-3)


class TestDiscreteBarrierMC:
    def _price(self, **kw):
        base = dict(
            spot=229.74, strike=190.0, vol=0.28790, option_type="call",
            valuation=VAL, maturity=MAT,
            discount_curve=flat_curve(0.073085649282, VAL),
            monitor_dates=build_monitoring_dates(VAL, MAT, "daily"),
            cfg=MCConfig(n_paths=200_000, seed=42),
        )
        base.update(kw)
        return price_discrete_barrier_mc(**base)

    def test_vanilla_matches_closed_form(self):
        res = self._price(barrier=BarrierSpec("none"), monitor_dates=[])
        curve = flat_curve(0.073085649282, VAL)
        t = curve.year_fraction(VAL, MAT)
        r = curve.get_forward_nacc_rate(VAL, MAT)
        expected = float(generalized_bs_price(229.74, 190.0, 0.28790, t, r, r, True))
        assert res["price"] == pytest.approx(expected, abs=4 * res["stderr"])

    def test_ko_matches_pde(self):
        """MC up-and-out call vs the CN FDM engine with identical dates."""
        from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricer
        from finite_difference_tpu.utils.curves import flat_naca_dataframe

        monitors = build_monitoring_dates(VAL, MAT, "daily")
        res = self._price(
            barrier=BarrierSpec("up-and-out", level=260.0), monitor_dates=monitors,
            cfg=MCConfig(n_paths=400_000, seed=11),
        )
        fdm = DiscreteBarrierFDMPricer(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT,
            sigma=0.28790, option_type="call", barrier_type="up-and-out",
            upper_barrier=260.0, monitor_dates=monitors,
            discount_curve=flat_naca_dataframe(0.073085649282),
            underlying_spot_days=0, num_time_steps=500,
        )
        p_pde = fdm.price_log2()
        assert res["price"] == pytest.approx(p_pde, abs=4 * res["stderr"] + 0.02)

    def test_in_out_parity(self):
        monitors = build_monitoring_dates(VAL, MAT, "daily")
        ko = self._price(barrier=BarrierSpec("up-and-out", level=260.0), monitor_dates=monitors)
        ki = self._price(barrier=BarrierSpec("up-and-in", level=260.0), monitor_dates=monitors)
        van = self._price(barrier=BarrierSpec("none"), monitor_dates=monitors)
        # same seed => same paths => parity is exact up to float noise
        assert ko["price"] + ki["price"] == pytest.approx(van["price"], rel=1e-10)

    def test_rebate_at_hit(self):
        monitors = build_monitoring_dates(VAL, MAT, "daily")
        p0 = self._price(barrier=BarrierSpec("up-and-out", level=250.0), monitor_dates=monitors)
        p_reb = self._price(
            barrier=BarrierSpec("up-and-out", level=250.0), monitor_dates=monitors,
            rebate=RebateSpec(amount=5.0, rebate_at_hit=True),
        )
        assert p_reb["price"] > p0["price"]

    def test_rebated_barriers_mc_vs_pde_cross_engine(self):
        """Cross-engine lock on the unified rebate conventions (round-3):
        MC and the CN production pricer agree within MC error for rebated
        KO (both timings) AND rebated KI (never-touched leg) on the same
        monitor schedule."""
        from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricer
        from finite_difference_tpu.utils.curves import flat_naca_dataframe

        monitors = build_monitoring_dates(VAL, MAT, "daily")
        cases = [
            ("up-and-out", 5.0, False),
            ("up-and-out", 5.0, True),
            ("up-and-in", 5.0, False),
        ]
        for bt, reb, at_hit in cases:
            res = self._price(
                barrier=BarrierSpec(bt, level=260.0),
                monitor_dates=monitors,
                rebate=RebateSpec(amount=reb, rebate_at_hit=at_hit),
                cfg=MCConfig(n_paths=400_000, seed=11),
            )
            pde = DiscreteBarrierFDMPricer(
                spot=229.74, strike=190.0, valuation_date=VAL,
                maturity_date=MAT, sigma=0.28790, option_type="call",
                barrier_type=bt, upper_barrier=260.0,
                monitor_dates=monitors,
                discount_curve=flat_naca_dataframe(0.073085649282),
                underlying_spot_days=0, num_time_steps=500,
                rebate_amount=reb, rebate_at_hit=at_hit,
            ).price_log2()
            assert res["price"] == pytest.approx(
                pde, abs=4 * res["stderr"] + 0.05
            ), (bt, reb, at_hit, res["price"], pde)

    def test_ki_rebate_pays_iff_never_hit(self):
        """Knock-in rebate (RR term E): paid at expiry iff the barrier is
        never touched. Regression: the MC kernel dropped this leg (like
        the reference, where rebate is KO-only), so rebated-KI MC prices
        disagreed with the analytic layer by R*DF*P(no hit)."""
        monitors = build_monitoring_dates(VAL, MAT, "daily")
        spec = BarrierSpec("up-and-in", level=260.0)
        p0 = self._price(barrier=spec, monitor_dates=monitors)
        p5 = self._price(
            barrier=spec, monitor_dates=monitors,
            rebate=RebateSpec(amount=5.0),
        )
        # same seed/paths: the difference IS the rebate leg, exactly
        # 5 * DF(T) * P(no hit); P(no hit) recovered from the KO/vanilla
        # run pair is messier, so bound it instead: 0 < leg < 5*DF(T)
        curve = flat_curve(0.073085649282, VAL)
        df_t = float(curve.get_discount_factor(MAT))
        leg = p5["price"] - p0["price"]
        assert 0.0 < leg < 5.0 * df_t
        # far barrier: never hit -> the KI is (almost) only the rebate
        far = self._price(
            barrier=BarrierSpec("up-and-in", level=900.0),
            monitor_dates=monitors, rebate=RebateSpec(amount=5.0),
        )
        assert far["price"] == pytest.approx(5.0 * df_t, rel=1e-6)

    def test_dividend_reduces_call(self):
        res0 = self._price(barrier=BarrierSpec("none"), monitor_dates=[])
        res_div = self._price(
            barrier=BarrierSpec("none"), monitor_dates=[],
            dividends=[(dt.date(2025, 8, 14), 8.0)],
        )
        assert res_div["price"] < res0["price"] - 2.0

    def test_barrier_band(self):
        monitors = build_monitoring_dates(VAL, MAT, "daily")
        tight = self._price(barrier=BarrierSpec("up-and-out", level=260.0), monitor_dates=monitors)
        banded = self._price(
            barrier=BarrierSpec("up-and-out", level=260.0, tol_bps=100.0),
            monitor_dates=monitors,
        )
        # a band below the barrier knocks out more paths
        assert banded["price"] < tight["price"]


class TestDeviceSobol:
    def test_matches_unscrambled_scipy_sobol(self):
        from scipy.stats import qmc

        from finite_difference_tpu.models.mc.rng import sobol1d_uniforms

        want = qmc.Sobol(d=1, scramble=False).random(64)[:, 0]
        got = np.asarray(sobol1d_uniforms(64))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_fast_forward_is_an_offset(self):
        from finite_difference_tpu.models.mc.rng import sobol1d_uniforms

        full = np.asarray(sobol1d_uniforms(32))
        tail = np.asarray(sobol1d_uniforms(24, fast_forward=8))
        np.testing.assert_array_equal(full[8:], tail)

    def test_normals_low_discrepancy(self):
        """QMC mean error decays ~1/n: far below the MC 1/sqrt(n) band."""
        from finite_difference_tpu.models.mc.rng import sobol1d_normals

        z = np.asarray(sobol1d_normals(1 << 14))
        assert abs(z.mean()) < 1e-3              # MC stderr would be ~0.008
        assert abs(z.std() - 1.0) < 1e-2

    def test_engine_backend(self):
        from finite_difference_tpu.models.mc import CSParams
        from finite_difference_tpu.xva import (
            CommodityXvaEngine,
            CounterpartyConfig,
            DiscountingConfig,
            SimulationConfig,
        )

        eng = CommodityXvaEngine(
            sim_cfg=SimulationConfig(num_sims=2048, seed=1, dt_days=30,
                                     horizon_days=120),
            cs_params=CSParams(alpha=1.0, sigma=0.3, mu=0.0),
            initial_curve=np.array([100.0, 102.0]),
            tenor_days=np.array([60.0, 180.0]),
            discounting=DiscountingConfig(rate=0.05),
            counterparty=CounterpartyConfig(hazard_rate=0.03),
            rng_backend="sobol_device",
        )
        z = eng._draw_normals(4, 2048)
        assert z.shape == (4, 2048)
        assert abs(float(z.mean())) < 5e-3


class TestMultiDimDeviceSobol:
    def test_matches_scipy_all_dims(self):
        from scipy.stats import qmc

        from finite_difference_tpu.models.mc.rng import sobol_uniforms

        for d in (1, 2, 5, 13):
            want = qmc.Sobol(d=d, scramble=False).random(128)
            got = np.asarray(sobol_uniforms(128, d))
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_fast_forward_offset(self):
        from finite_difference_tpu.models.mc.rng import sobol_uniforms

        full = np.asarray(sobol_uniforms(64, 3))
        np.testing.assert_array_equal(
            np.asarray(sobol_uniforms(24, 3, fast_forward=40)), full[40:]
        )

    def test_scenario_backend_correlation(self):
        """QMC correlated normals recover the target correlation."""
        from finite_difference_tpu.scenarios import build_cholesky
        from finite_difference_tpu.scenarios.simulation import (
            generate_random_numbers,
        )

        L = build_cholesky({("A", "B"): 0.6}, ["A", "B"])
        z = generate_random_numbers(L, num_timesteps=16, batch_size=4096,
                                    rng_backend="sobol_device", seed=0)
        assert z.shape == (2, 16, 4096)
        cors = [np.corrcoef(z[0, t], z[1, t])[0, 1] for t in range(16)]
        assert abs(np.mean(cors) - 0.6) < 0.02


class TestCrossEngineBarrierFuzz:
    def test_random_configs_cn_vs_bgk_vs_mc(self):
        """Randomized three-engine consistency: for random single-barrier
        configs (type, moneyness, vol, rate, barrier distance) with daily
        monitors, the CN PDE, the BGK/Hörfelt analytic pricer, and the
        MC kernel must agree — CN vs MC inside MC error, BGK vs CN inside
        its O(1/sqrt(m)) approximation band. Locks the engines together
        across the config space rather than at hand-picked points."""
        from finite_difference_tpu.models.analytic.bgk_pricer import (
            DiscreteBarrierBGKPricer,
        )
        from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricer
        from finite_difference_tpu.utils.curves import flat_naca_dataframe

        rng = np.random.default_rng(17)
        monitors = build_monitoring_dates(VAL, MAT, "daily")
        naca = 0.073085649282
        curve_df = flat_naca_dataframe(naca)
        mc_curve = flat_curve(naca, VAL)

        for trial in range(6):
            is_up = bool(rng.integers(0, 2))
            is_in = bool(rng.integers(0, 2))
            bt = ("up-" if is_up else "down-") + ("and-in" if is_in else "and-out")
            s0 = float(rng.uniform(90.0, 110.0))
            k = float(rng.uniform(85.0, 115.0))
            sigma = float(rng.uniform(0.18, 0.4))
            h = s0 * (
                float(rng.uniform(1.08, 1.3))
                if is_up
                else float(rng.uniform(0.75, 0.93))
            )
            kw_cn = dict(upper_barrier=h) if is_up else dict(lower_barrier=h)

            cn = DiscreteBarrierFDMPricer(
                spot=s0, strike=k, valuation_date=VAL, maturity_date=MAT,
                sigma=sigma, option_type="call", barrier_type=bt,
                monitor_dates=monitors, discount_curve=curve_df,
                underlying_spot_days=0, num_time_steps=400, **kw_cn,
            ).price_log2()

            bgk = DiscreteBarrierBGKPricer(
                spot=s0, strike=k, volatility=sigma,
                valuation_date=VAL, maturity_date=MAT,
                monitor_dates=monitors, option_type="call",
                barrier_type=bt, pricing_method="bgk",
                discount_curve=mc_curve, **kw_cn,
            ).price()

            res = price_discrete_barrier_mc(
                spot=s0, strike=k, vol=sigma, option_type="call",
                valuation=VAL, maturity=MAT, discount_curve=mc_curve,
                monitor_dates=monitors,
                barrier=BarrierSpec(bt, level=h),
                cfg=MCConfig(n_paths=200_000, seed=100 + trial),
            )
            msg = f"trial {trial}: {bt} s0={s0:.2f} k={k:.2f} h={h:.2f} sigma={sigma:.2f}"
            # CN vs MC: same product, independent numerics
            assert res["price"] == pytest.approx(
                cn, abs=4 * res["stderr"] + 0.03
            ), f"{msg} cn={cn} mc={res['price']}"
            # BGK vs CN: the Hörfelt approximation's band at m=23 daily
            # monitors (worst near the barrier); absolute floor for
            # near-zero KI prices
            assert bgk == pytest.approx(cn, rel=6e-2, abs=0.15), (
                f"{msg} cn={cn} bgk={bgk}"
            )
