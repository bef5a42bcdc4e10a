"""Hull–White 1F yield-curve simulator: exactness, arbitrage-freeness, and
the HW1F-calibrated-rates → scenario-cube → exposure-engine loop
(BASELINE.json config 5)."""
import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.models.mc.hw1f import HW1FCurveSimulator, HW1FParams

TENORS0 = np.array([0.25, 0.5, 1.0, 2.0, 5.0, 10.0, 30.0])
RATES0 = np.array([0.070, 0.071, 0.072, 0.074, 0.077, 0.079, 0.080])


def _sim(alpha=0.1, sigma=0.012):
    return HW1FCurveSimulator(HW1FParams.flat(alpha, sigma), TENORS0, RATES0)


class TestHW1FParams:
    def test_from_calibration_dot_curve_packing(self):
        params = {
            "Alpha": 0.15,
            "Sigma": {".Curve": {"meta": [], "data": [(1.0, 0.01), (0.25, 0.02)]}},
        }
        p = HW1FParams.from_calibration(params)
        assert p.alpha == 0.15
        np.testing.assert_allclose(p.sigma_tenors, [0.25, 1.0])  # sorted
        np.testing.assert_allclose(p.sigma_at(np.array([0.25, 0.625, 2.0])),
                                   [0.02, 0.015, 0.01])

    def test_from_calibration_pipeline_output(self):
        """The OrderedDict produced by calibrate_hw1f_interest_rate feeds
        the simulator directly."""
        import pandas as pd

        from finite_difference_tpu.calibration import calibrate_hw1f_interest_rate

        rng = np.random.default_rng(0)
        panel = pd.DataFrame(
            0.07 + 0.002 * rng.standard_normal((300, 4)).cumsum(axis=0) / 50.0,
            columns=[0.25, 1.0, 5.0, 10.0],
        )
        param, _, _ = calibrate_hw1f_interest_rate(panel)
        p = HW1FParams.from_calibration(param)
        assert p.alpha > 0
        assert (p.sigma_values >= 0).all()


class TestHW1FSimulator:
    def test_zero_vol_reconstitutes_forward_curve(self):
        sim = _sim(sigma=1e-14)
        t_grid = np.linspace(0.1, 2.0, 20)
        taus = [0.25, 1.0, 5.0]
        out = sim.simulate(t_grid, taus, n_paths=3, seed=1)
        z0t = np.interp(t_grid, TENORS0, RATES0)
        for j, tau in enumerate(taus):
            zf = (np.interp(t_grid + tau, TENORS0, RATES0) * (t_grid + tau)
                  - z0t * t_grid) / tau
            np.testing.assert_allclose(out[:, 0, j], zf, atol=1e-9)

    def test_state_moments_match_closed_form(self):
        sim = _sim()
        t_grid = np.linspace(1 / 52, 2.0, 52)
        xs = sim.simulate_state(t_grid, n_paths=40_000, seed=7)
        m_cl, y_cl = sim.moments(t_grid)
        # antithetic pairing makes the sample mean of z exactly zero, so the
        # pathwise mean reproduces the deterministic drift to roundoff
        np.testing.assert_allclose(xs.mean(axis=1), m_cl, atol=1e-14)
        np.testing.assert_allclose(xs.var(axis=1), y_cl, rtol=0.05)

    def test_martingale_discounted_bond(self):
        """E[exp(-∫r) P(t,T)] = P(0,T): the reconstitution is arbitrage-free
        (trapezoid bank account on a weekly grid)."""
        sim = _sim()
        t_grid = np.linspace(1 / 52, 1.0, 52)
        tau_T, n_paths, eps = 5.0, 100_000, 1e-4
        out = sim.simulate(t_grid, [tau_T], n_paths=n_paths, seed=7)
        r = sim.simulate(t_grid, [eps], n_paths=n_paths, seed=7)[:, :, 0]
        dts = np.diff(np.concatenate([[0.0], t_grid]))
        r0 = np.interp(eps, TENORS0, RATES0)
        r_prev = np.vstack([np.full((1, n_paths), r0), r[:-1]])
        integ = np.cumsum(0.5 * (r + r_prev) * dts[:, None], axis=0)
        i = len(t_grid) - 1
        lhs = (np.exp(-integ[i]) * np.exp(-out[i, :, 0] * tau_T)).mean()
        T = t_grid[i] + tau_T
        rhs = np.exp(-np.interp(T, TENORS0, RATES0) * T)
        assert abs(lhs / rhs - 1.0) < 5e-4

    def test_piecewise_sigma_moments(self):
        p = HW1FParams(alpha=0.3, sigma_tenors=np.array([0.0, 1.0]),
                       sigma_values=np.array([0.02, 0.005]))
        sim = HW1FCurveSimulator(p, TENORS0, RATES0)
        t_grid = np.linspace(0.25, 2.0, 8)
        xs = sim.simulate_state(t_grid, n_paths=60_000, seed=3)
        _, y_cl = sim.moments(t_grid)
        np.testing.assert_allclose(xs.var(axis=1), y_cl, rtol=0.05)

    def test_validation(self):
        sim = _sim()
        with pytest.raises(ValueError, match="ascending"):
            sim.simulate([0.5, 0.25], [1.0], 4)
        with pytest.raises(ValueError, match="tenors"):
            sim.simulate([0.25, 0.5], [0.0, 1.0], 4)
        with pytest.raises(ValueError, match="normals"):
            sim.simulate([0.25], [1.0], 4, normals=np.zeros((2, 4)))


class TestHW1FExposureLoop:
    def test_calibrated_rates_drive_swap_exposure(self):
        """HW1F params → curve cube → ExposureEngine on an IRSwap: EE/PFE
        behave like a swap profile (positive, humped, zero at maturity)."""
        from finite_difference_tpu.instruments import IRSwap, LegType, SwapLeg
        from finite_difference_tpu.portfolio import NettingSet, Trade
        from finite_difference_tpu.xva import ExposureEngine
        from finite_difference_tpu.xva.cva import XvaCalculator
        from finite_difference_tpu.xva.config import CounterpartyConfig

        val = dt.date(2025, 7, 28)
        sim = _sim(alpha=0.1, sigma=0.012)
        cube = sim.to_scenario_cube(
            base_date=val,
            scen_days=[30 * i for i in range(1, 25)] + [735],
            tenors=TENORS0,
            n_paths=256,
            factor_name="ZAR-SWAP",
            seed=11,
        )
        swap = IRSwap(
            name="payer",
            effective_date=val,
            maturity_date=dt.date(2027, 7, 28),
            notional=1_000_000,
            receive_leg=SwapLeg(LegType.FLOATING, frequency=3,
                                curve_name="ZAR-SWAP"),
            pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=0.074),
            discount_curve_name="ZAR-SWAP",
        )
        prof = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(swap, "T1")])
        )
        ee = prof.ee()  # (n_times,) mean positive exposure
        assert (ee >= 0).all() and ee.max() > 0
        # profile decays to ~0 as the swap rolls off
        assert ee[-1] <= 0.05 * ee.max() + 1e-9
        # CVA from the humped profile is positive
        calc = XvaCalculator(CounterpartyConfig(hazard_rate=0.02),
                             days_in_year=365.25, discount_to_zero=False)
        times_days = np.array([(d - val).days for d in cube.dates], float)
        cva = calc.cva_from_ee(times_days, ee)
        assert cva > 0


class TestJointCube:
    def _specs(self):
        from finite_difference_tpu.models.mc.gbm import GBMParams
        from finite_difference_tpu.scenarios.joint_cube import (
            GBMScalarFactor,
            HW1FCurveFactor,
        )

        sim = _sim(alpha=0.15, sigma=0.01)
        return {
            "ZAR-SWAP": HW1FCurveFactor(simulator=sim, tenors=TENORS0),
            "FX.USDZAR": GBMScalarFactor(params=GBMParams(mu=0.0, sigma=0.15),
                                         s0=18.0),
        }

    def test_shapes_and_t0_slices(self):
        from finite_difference_tpu.scenarios.joint_cube import simulate_joint_cube

        val = dt.date(2025, 7, 28)
        cube = simulate_joint_cube(
            val, [30, 60, 90], self._specs(), n_paths=64, seed=5
        )
        assert cube.n_times == 4 and cube.n_paths == 64
        s0 = cube.get_time_slice(0)
        np.testing.assert_allclose(s0["FX.USDZAR"].values, 18.0)
        np.testing.assert_allclose(
            s0["ZAR-SWAP"].values, np.broadcast_to(RATES0, (64, RATES0.size))
        )

    def test_cross_factor_correlation_recovered(self):
        from finite_difference_tpu.scenarios.joint_cube import simulate_joint_cube

        val = dt.date(2025, 7, 28)
        rho = 0.7
        cube = simulate_joint_cube(
            val, list(range(7, 371, 7)), self._specs(), n_paths=20_000,
            correlations={("ZAR-SWAP", "FX.USDZAR"): rho}, seed=9,
        )
        fx = cube.factor_array("FX.USDZAR")          # (n_times, n_paths)
        rates = cube.factor_array("ZAR-SWAP")[:, :, 0]  # short tenor
        d_fx = np.diff(np.log(fx), axis=0)
        d_r = np.diff(rates, axis=0)
        cors = [np.corrcoef(d_fx[t], d_r[t])[0, 1] for t in range(d_fx.shape[0])]
        assert abs(np.mean(cors) - rho) < 0.03

    def test_mixed_cube_through_exposure_engine(self):
        from finite_difference_tpu.instruments import IRSwap, LegType, SwapLeg
        from finite_difference_tpu.portfolio import NettingSet, Trade
        from finite_difference_tpu.scenarios.joint_cube import simulate_joint_cube
        from finite_difference_tpu.xva import ExposureEngine

        val = dt.date(2025, 7, 28)
        cube = simulate_joint_cube(
            val, [30 * i for i in range(1, 13)] + [400], self._specs(),
            n_paths=128, correlations={("ZAR-SWAP", "FX.USDZAR"): -0.3},
            seed=3,
        )
        swap = IRSwap(
            name="s", effective_date=val, maturity_date=dt.date(2026, 7, 28),
            notional=1_000_000,
            receive_leg=SwapLeg(LegType.FLOATING, frequency=3,
                                curve_name="ZAR-SWAP"),
            pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=0.073),
            discount_curve_name="ZAR-SWAP",
        )
        ns = NettingSet(
            "NS", [Trade(swap, "T1", currency="USD",
                         fx_rate_factor="FX.USDZAR")]
        )
        prof = ExposureEngine(cube).compute(ns)
        assert prof.ee().max() > 0
        # the conversion must actually be the pathwise FX multiply: the
        # FX trade's MTM equals the unconverted trade's MTM times the
        # simulated FX path (ee>0 alone passes even if fx is ignored or
        # applied upside down)
        prof_zar = ExposureEngine(cube).compute(
            NettingSet("NS", [Trade(swap, "T1")])
        )
        fx = np.stack(
            [
                np.asarray(cube.get_time_slice(t)["FX.USDZAR"].values)
                for t in range(len(cube.dates))
            ],
            axis=1,
        )  # (n_paths, n_times)
        np.testing.assert_allclose(
            prof.mtm, prof_zar.mtm * fx, rtol=1e-12, atol=1e-9
        )
