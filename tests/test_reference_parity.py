"""Direct numerical parity vs the ACTUAL reference implementation.

These tests import the reference modules from /root/reference (read-only)
and compare our TPU-native implementations against their outputs on the
same inputs — the strongest form of the benchmark-comparison validation
tier (SURVEY §4.1). Skipped wholesale when the reference tree is absent.
"""
import datetime as dt
import os
import sys

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)


# ---------------------------------------------------------------------------
# L1 analytic engines
# ---------------------------------------------------------------------------


class TestReinerRubinsteinParity:
    CASES = [
        # (opt, direction, inout, S, K, H, rebate)
        ("c", "u", "o", 100.0, 95.0, 120.0, 0.0),
        ("c", "u", "i", 100.0, 95.0, 120.0, 0.0),
        ("c", "d", "o", 100.0, 105.0, 85.0, 2.0),
        ("c", "d", "i", 100.0, 105.0, 85.0, 2.0),
        ("p", "u", "o", 100.0, 110.0, 125.0, 1.0),
        ("p", "u", "i", 100.0, 110.0, 125.0, 1.0),
        ("p", "d", "o", 100.0, 95.0, 80.0, 0.0),
        ("p", "d", "i", 100.0, 95.0, 80.0, 0.0),
    ]

    @pytest.mark.parametrize("opt,direc,inout,S,K,H,reb", CASES)
    def test_all_eight_types(self, opt, direc, inout, S, K, H, reb):
        import barrier_engine as ref_mod

        from finite_difference_tpu.models.analytic import BarrierEngine

        kwargs = dict(
            s=S, b=0.03, r=0.07, t=0.75, x=K, sigma=0.3, h=H,
            optionflag=opt, directionflag=direc, in_out_flag=inout, k=reb,
        )
        ref = ref_mod.BarrierEngine(**kwargs).price()
        ours = BarrierEngine(**kwargs).price()
        assert ours == pytest.approx(ref, rel=1e-10, abs=1e-12)

    def test_barrier_status_crossed(self):
        import barrier_engine as ref_mod

        from finite_difference_tpu.models.analytic import BarrierEngine

        kwargs = dict(
            s=100.0, b=0.03, r=0.07, t=0.75, x=95.0, sigma=0.3, h=120.0,
            optionflag="c", directionflag="u", in_out_flag="i", k=0.0,
            barrier_status="crossed",
        )
        ref = ref_mod.BarrierEngine(**kwargs).price()
        ours = BarrierEngine(**kwargs).price()
        assert ours == pytest.approx(ref, rel=1e-10)


class TestBS93Parity:
    @pytest.mark.parametrize(
        "S,K,T,r,sigma,q",
        [
            (100.0, 100.0, 1.0, 0.08, 0.3, 0.12),
            (100.0, 110.0, 0.5, 0.08, 0.3, 0.12),
            (42.0, 40.0, 0.75, 0.04, 0.35, 0.08),
            (120.0, 100.0, 2.0, 0.05, 0.2, 0.03),
        ],
    )
    def test_call_and_put(self, S, K, T, r, sigma, q):
        from bjerksund_stensland import BjerksundStenslandOptionPricer as Ref

        from finite_difference_tpu.models.analytic import (
            BjerksundStenslandOptionPricer as Ours,
        )

        ref = Ref(spot=S, strike=K, expiry=T, rate=r, vol=sigma, div_yield=q)
        ours = Ours(spot=S, strike=K, expiry=T, rate=r, vol=sigma, div_yield=q)
        assert ours.price_call() == pytest.approx(ref.price_call(), rel=1e-9)
        assert ours.price_put() == pytest.approx(ref.price_put(), rel=1e-9)

    def test_boundary_2002(self):
        """Our 1993-variant boundary matches bjerk_stens_new's X_tau."""
        from bjerk_stens_new import BjerksundStenslandOptionPricer as Ref2002

        from finite_difference_tpu.models.analytic import boundary_XT

        ref = Ref2002()
        for tau in (0.25, 1.0, 2.0):
            for variant in ("riskflow_1993", "paper_2002_modified"):
                want = ref._boundary_XT(
                    K=100.0, r=0.06, b=-0.02, sigma=0.3, tau=tau,
                    boundary_variant=variant,
                )
                got = float(boundary_XT(100.0, 0.06, -0.02, 0.3, tau, variant))
                assert got == pytest.approx(want, rel=1e-12), (tau, variant)


# ---------------------------------------------------------------------------
# L3 RNG / simulators
# ---------------------------------------------------------------------------


class TestSobolParity:
    def test_draw_normals_bit_match(self):
        import rng as ref_rng

        from finite_difference_tpu.models.mc import SobolNormalRng

        ref = ref_rng.SobolNormalRng(seed=11, fast_forward=8).draw_normals(3, 64)
        ours = SobolNormalRng(seed=11, fast_forward=8, backend="torch").draw_normals(3, 64)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-12)


class TestCSSimulationParity:
    def test_parse_time_grid_exact(self):
        import cs_simulation as ref

        from finite_difference_tpu.scenarios import parse_time_grid

        run = pd.Timestamp("2025-01-06")
        maxd = pd.Timestamp("2027-06-30")
        for grid in ("0d 2d 1w(1w) 1m(1m) 3m(3m)", "0d 1m(1m)", "2d 1y3m"):
            want = ref.parse_time_grid(run, maxd, grid)
            got = parse_time_grid(run, maxd, grid)
            np.testing.assert_array_equal(got, want), grid

    def test_precalculate_exact(self):
        import cs_simulation as ref

        from finite_difference_tpu.scenarios import precalculate

        tenors = np.array([45100.0, 45200.0, 45420.0])
        scen = np.array([0, 10, 50, 120, 250, 400])
        prices = np.array([10.0, 11.0, 12.0])
        want = ref.precalculate(prices, tenors, scen, 0.35, 1.2, 0.04, 45000)
        got = precalculate(prices, tenors, scen, 0.35, 1.2, 0.04, 45000)
        np.testing.assert_allclose(got["vol"], want["vol"], atol=1e-14)
        np.testing.assert_allclose(got["drift"], want["drift"], atol=1e-14)
        np.testing.assert_allclose(
            got["initial_curve"], want["initial_curve"], atol=0
        )

    def test_build_cholesky_exact(self):
        import cs_simulation as ref

        from finite_difference_tpu.scenarios import build_cholesky

        corr = {("a", "b"): 0.6, ("b", "c"): 0.3}
        names = ["a", "b", "c"]
        np.testing.assert_allclose(
            build_cholesky(corr, names), ref.build_cholesky(corr, names), atol=1e-14
        )
        # non-PSD healing path
        bad = {("a", "b"): 0.95, ("a", "c"): 0.95, ("b", "c"): -0.95}
        np.testing.assert_allclose(
            build_cholesky(bad, names), ref.build_cholesky(bad, names), atol=1e-12
        )

    def test_generate_random_numbers_torch_parity(self):
        import torch

        import cs_simulation as ref

        from finite_difference_tpu.scenarios import (
            build_cholesky,
            generate_random_numbers,
        )

        L = build_cholesky({("a", "b"): 0.5}, ["a", "b"])
        torch.manual_seed(123)
        want = ref.generate_random_numbers(L, 5, 16, use_antithetic=True)
        torch.manual_seed(123)
        got = generate_random_numbers(
            L, 5, 16, use_antithetic=True, rng_backend="torch"
        )
        np.testing.assert_allclose(got, want, rtol=1e-14)

    def test_generate_paths_exact(self):
        import cs_simulation as ref

        from finite_difference_tpu.scenarios import generate_paths, precalculate

        tenors = np.array([45100.0, 45200.0])
        scen = np.array([0, 30, 90, 180])
        prices = np.array([50.0, 51.0])
        pre_ref = ref.precalculate(prices, tenors, scen, 0.3, 1.0, 0.02, 45000)
        pre_ours = precalculate(prices, tenors, scen, 0.3, 1.0, 0.02, 45000)
        z = np.random.default_rng(0).normal(size=(1, len(scen), 32))
        want = ref.generate_paths(pre_ref, z)
        got = generate_paths(pre_ours, z)
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestCSSimulatorParity:
    def test_forward_curve_paths_exact(self):
        import torch

        from clewlow_strickland import (
            CSForwardCurveSimulator as RefSim,
            CSParams as RefParams,
        )

        from finite_difference_tpu.models.mc import (
            CSForwardCurveSimulator,
            CSParams,
        )

        tenor_days = np.array([90.0, 180.0, 365.0])
        scen_days = np.array([0.0, 10.0, 30.0, 90.0, 200.0])
        init = np.array([100.0, 102.0, 104.0])
        z = np.random.default_rng(1).normal(size=(len(scen_days), 64))

        ref_sim = RefSim(
            params=RefParams(alpha=1.1, sigma=0.35, mu=0.03),
            days_in_year=365.0, device="cpu", dtype=torch.float64,
        )
        want = ref_sim.simulate(
            initial_curve=init, tenor_days=tenor_days, scen_days=scen_days,
            z=torch.tensor(z), risk_neutral=False,
        ).numpy()
        ours = CSForwardCurveSimulator(
            CSParams(alpha=1.1, sigma=0.35, mu=0.03), days_in_year=365.0
        ).simulate(init, tenor_days, scen_days, z, risk_neutral=False)
        np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-10)


class TestGBMParity:
    def test_paths_exact(self):
        import torch

        from gbm_asset_price_diagnostic import (
            GBMParams as RefParams,
            GBMSimulator as RefSim,
        )

        from finite_difference_tpu.models.mc import GBMParams, GBMSimulator

        days = np.arange(0, 101, 10, dtype=float)
        z = np.random.default_rng(3).normal(size=(len(days), 32))
        want = RefSim(RefParams(mu=0.05, sigma=0.25), days_in_year=365.0).simulate(
            100.0, days, torch.tensor(z)
        ).numpy()
        got = GBMSimulator(GBMParams(mu=0.05, sigma=0.25), days_in_year=365.0).simulate(
            100.0, days, z
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


# ---------------------------------------------------------------------------
# L1 BGK pricer (curve-driven)
# ---------------------------------------------------------------------------


class TestBGKParity:
    def _curve(self):
        start = dt.date(2025, 7, 27)
        dates = pd.date_range(start=start, periods=420, freq="D")
        return pd.DataFrame(
            {"Date": dates.strftime("%Y-%m-%d"), "NACA": 0.0755}
        )

    @pytest.mark.parametrize(
        "btype,lower,upper,otype",
        [
            ("up-and-out", None, 260.0, "call"),
            ("down-and-out", 190.0, None, "put"),
            ("up-and-in", None, 260.0, "call"),
            ("double-out", 180.0, 280.0, "call"),
        ],
    )
    def test_bgk_analytic_prices(self, btype, lower, upper, otype):
        import discrete_barrier_bgk as ref_mod

        from finite_difference_tpu.models.analytic import DiscreteBarrierBGKPricer

        val, mat = dt.date(2025, 7, 28), dt.date(2025, 10, 28)
        mons = [val + dt.timedelta(days=7 * k) for k in range(1, 13)]
        kwargs = dict(
            spot=229.74, strike=220.0, valuation_date=val, maturity_date=mat,
            option_type=otype, barrier_type=btype,
            lower_barrier=lower, upper_barrier=upper, monitor_dates=mons,
            discount_curve=self._curve(), volatility=0.2879,
            pricing_method="bgk",
        )
        ref = ref_mod.DiscreteBarrierBGKPricer(**kwargs).price()
        ours = DiscreteBarrierBGKPricer(**kwargs).price()
        assert ours == pytest.approx(ref, rel=1e-6), btype


# ---------------------------------------------------------------------------
# L5 calibration statistics
# ---------------------------------------------------------------------------


class TestCalcStatisticsParity:
    def test_stats_table_exact(self):
        import cs_historical_calibration as ref

        from finite_difference_tpu.calibration import calc_statistics

        rng = np.random.default_rng(5)
        idx = pd.bdate_range("2020-01-01", periods=600)
        df = pd.DataFrame(
            {
                "A,0.25": 100.0 * np.exp(np.cumsum(rng.normal(0, 0.01, 600))),
                "A,0.5": 90.0 * np.exp(np.cumsum(rng.normal(0, 0.012, 600))),
            },
            index=idx,
        )
        stats_ref, corr_ref, delta_ref = ref.calc_statistics(df, method="Log")
        stats_ours, corr_ours, delta_ours = calc_statistics(df, method="Log")
        for col in ("Volatility", "Drift", "Mean Reversion Speed",
                    "Reversion Volatility"):
            np.testing.assert_allclose(
                stats_ours[col].values, stats_ref[col].values, rtol=1e-10,
                err_msg=col,
            )
        np.testing.assert_allclose(corr_ours.values, corr_ref.values, rtol=1e-10)

    def test_calibrate_historical_exact(self):
        import cs_historical_calibration as ref

        from finite_difference_tpu.calibration import calibrate_historical

        rng = np.random.default_rng(9)
        idx = pd.bdate_range("2021-01-01", periods=700)
        df = pd.DataFrame(
            {"B,1.0": 80.0 * np.exp(np.cumsum(rng.normal(0.0002, 0.015, 700)))},
            index=idx,
        )
        want = ref.calibrate_historical(df)
        got = calibrate_historical(df)
        for k in ("Sigma", "Alpha", "Drift"):
            assert got[k] == pytest.approx(want[k], rel=1e-10), k


class TestGBMFXParity:
    def test_declining_variance_correction_exact(self):
        import gbm_fx_implied_calibration as ref

        from finite_difference_tpu.calibration import correct_declining_variance

        expiries = np.array([0.25, 0.5, 1.0, 2.0, 3.0])
        atm = np.array([0.30, 0.12, 0.09, 0.20, 0.08])
        want_avg, want_inst, want_flag, _ = ref.correct_declining_variance(
            expiries, atm
        )
        got_avg, got_inst, got_flag, _ = correct_declining_variance(expiries, atm)
        assert got_flag == want_flag
        np.testing.assert_allclose(got_avg, want_avg, rtol=1e-12)
        np.testing.assert_allclose(got_inst, want_inst, rtol=1e-12)

    def test_extract_atm_vols_exact(self):
        import gbm_fx_implied_calibration as ref

        from finite_difference_tpu.calibration import extract_atm_vols

        rows = []
        for T in (0.25, 1.0, 2.0):
            for m in (0.8, 0.95, 1.05, 1.2):
                rows.append([m, T, 0.1 + 0.05 * T + 0.02 * abs(m - 1)])
        arr = np.array(rows)
        want_e, want_v = ref.extract_atm_vols(arr)
        got_e, got_v = extract_atm_vols(arr)
        np.testing.assert_allclose(got_e, want_e)
        np.testing.assert_allclose(got_v, want_v, rtol=1e-12)


# ---------------------------------------------------------------------------
# L2 hybrid pricer decision logic
# ---------------------------------------------------------------------------


class TestHybridDecisionParity:
    def test_nlim_decision_and_bgk_shift(self):
        import discrete_barrier_analytic_pricer as ref_mod

        from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricerAnalytic
        from finite_difference_tpu.runners import build_flat_curve

        val = pd.Timestamp("2025-07-28")
        mat = pd.Timestamp("2026-07-28")
        mons = [val + pd.Timedelta(days=k) for k in range(1, 366, 1)]
        curve = build_flat_curve(0.08, val.date(), mat.date())

        ref = ref_mod.DiscreteBarrierFDMPricerAnalytic(
            trade_id="T", direction="long", quantity=1, contract_multiplier=1.0,
            option_type="call", barrier_type="up-and-out", strike=100.0,
            lower_barrier=None, upper_barrier=130.0, spot=100.0,
            volatility=0.25, valuation_date=val, maturity_date=mat,
            monitoring_dates=mons, discount_curve=curve,
            time_steps=100, space_nodes=100,
            n_desired_for_decision=50, n_lim_multiplier=5,
        )
        ours = DiscreteBarrierFDMPricerAnalytic(
            option_type="call", barrier_type="up-and-out", strike=100.0,
            upper_barrier=130.0, spot=100.0, volatility=0.25,
            valuation_date=val.date(), maturity_date=mat.date(),
            monitoring_dates=[d.date() for d in mons], discount_curve=curve,
            time_steps=100, space_nodes=100,
            n_desired_for_decision=50, n_lim_multiplier=5,
        )
        assert ours.use_continuous_window == ref.use_continuous_window
        if ref.use_continuous_window:
            assert ours.bgk_upper_barrier == pytest.approx(
                ref.bgk_upper_barrier, rel=1e-9
            )


class TestBGKMCParity:
    def test_torch_rng_mode_bit_identical(self):
        """Same seed + torch RNG parity mode -> bit-identical MC price
        (the RiskFlow reproduction path, discrete_barrier_bgk.py:751-768)."""
        import discrete_barrier_bgk as ref_mod

        from finite_difference_tpu.models.analytic import DiscreteBarrierBGKPricer

        val, mat = dt.date(2025, 7, 28), dt.date(2025, 10, 28)
        dates = pd.date_range(dt.date(2025, 7, 27), periods=420, freq="D")
        curve = pd.DataFrame({"Date": dates.strftime("%Y-%m-%d"), "NACA": 0.0755})
        mons = [val + dt.timedelta(days=3 * k) for k in range(1, 31)]
        kwargs = dict(
            spot=229.74, strike=220.0, valuation_date=val, maturity_date=mat,
            option_type="call", barrier_type="up-and-out", upper_barrier=260.0,
            monitor_dates=mons, discount_curve=curve, volatility=0.2879,
            pricing_method="mc", mc_n_paths=4096, mc_seed=42,
            mc_use_torch_rng=True,
        )
        p_ref = ref_mod.DiscreteBarrierBGKPricer(**kwargs).price()
        p_ours = DiscreteBarrierBGKPricer(**kwargs).price()
        assert p_ours == p_ref  # exact

    def test_standalone_mc_statistical_agreement(self):
        """Different RNG streams (numpy vs ours) must agree within stderr."""
        import mc_discrete_barrier_option as ref_mod

        from finite_difference_tpu.models.mc import MCConfig, price_discrete_barrier_mc
        from finite_difference_tpu.models.mc.discrete_barrier import BarrierSpec
        from finite_difference_tpu.utils.curves import flat_curve

        val, mat = dt.date(2025, 7, 28), dt.date(2025, 8, 28)
        mons = [val + dt.timedelta(days=2 * k) for k in range(1, 16)]
        dates = pd.date_range(dt.date(2025, 7, 27), periods=120, freq="D")
        curve_df = pd.DataFrame({"Date": dates.strftime("%Y-%m-%d"), "NACA": 0.0755})

        ref_curve = ref_mod.NacaCurve(curve_df, val)
        ref = ref_mod.price_discrete_barrier_mc(
            spot=229.74, strike=190.0, vol=0.2879, option_type="call",
            valuation=val, maturity=mat, discount_curve=ref_curve,
            monitor_dates=mons,
            barrier=ref_mod.BarrierSpec("up-and-out", level=260.0),
            cfg=ref_mod.MCConfig(n_paths=200_000, seed=3),
        )
        ours = price_discrete_barrier_mc(
            spot=229.74, strike=190.0, vol=0.2879, option_type="call",
            valuation=val, maturity=mat,
            discount_curve=flat_curve(0.0755, val),
            monitor_dates=mons,
            barrier=BarrierSpec("up-and-out", level=260.0),
            cfg=MCConfig(n_paths=200_000, seed=3),
        )
        se = max(ref["stderr"], ours["stderr"])
        assert abs(ours["price"] - ref["price"]) < 4 * se


class TestCSImpliedOptimizerParity:
    def test_same_objective_same_optimum(self):
        """Our jax-gradient L-BFGS-B and the reference's scipy optimizer
        minimize the same objective -> same (Sigma, Alpha) within optimizer
        tolerance."""
        import cs_implied_calibration as ref_mod

        from finite_difference_tpu.calibration import calibrate_implied, cs_variance
        from finite_difference_tpu.calibration.cs import black_european_option_price

        true_sigma, true_alpha = 0.38, 0.9
        options = []
        for T, S in [(0.25, 0.35), (0.75, 0.85), (1.5, 1.6)]:
            for K in (90.0, 100.0, 115.0):
                var = float(cs_variance(true_sigma, true_alpha, T, S))
                prem = float(
                    black_european_option_price(
                        100.0, K, 0.0, np.sqrt(var), 1.0, 1.0, 1.0
                    )
                ) * np.exp(-0.04 * T)
                options.append(
                    dict(Forward=100.0, Strike=K, r=0.04, T=T, S=S,
                         Premium=prem, Units=1.0, Option_Type="Call",
                         Weight=1.0)
                )
        ref = ref_mod.calibrate_implied([dict(o) for o in options])
        ours = calibrate_implied(options)
        assert ours["Sigma"] == pytest.approx(ref["Sigma"], abs=2e-3)
        assert ours["Alpha"] == pytest.approx(ref["Alpha"], abs=2e-2)
