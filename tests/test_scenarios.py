import json

import numpy as np
import pandas as pd
import pytest

from finite_difference_tpu.scenarios import (
    DAYS_IN_YEAR,
    build_cholesky,
    compare_scenario_outputs,
    date_to_excel_days,
    excel_days_to_date,
    export_scenarios_csv,
    extract_correlations,
    extract_forward_curve,
    extract_model_params,
    from_riskflow_dataframe,
    generate_paths,
    generate_random_numbers,
    load_market_data,
    load_riskflow_scenarios,
    load_scenarios_csv,
    parse_time_grid,
    precalculate,
    run_multi_factor_simulation_from_json,
    run_simulation_from_json,
    to_riskflow_dataframe,
)

RUN = pd.Timestamp("2025-01-06")


def _market_json(tmp_path, correlations=None, fmt="standalone"):
    base_excel = date_to_excel_days(RUN)
    curve_a = [[base_excel + 30 * (i + 1), 100.0 + 2.0 * i] for i in range(6)]
    curve_b = [[base_excel + 45 * (i + 1), 60.0 + i] for i in range(5)]
    md = {
        "Price Factors": {
            "ForwardPrice.BRENT.OIL": {
                "Curve": {".Curve": {"meta": [], "data": curve_a}},
                "Currency": "USD",
            },
            "ForwardPrice.GOLD": {
                "Curve": {".Curve": {"meta": [], "data": curve_b}},
                "Currency": "USD",
            },
            "CSForwardPriceModelParameters.GOLD": {
                "Sigma": {".Percent": 25.0},
                "Alpha": 1.2,
            },
        },
        "Price Models": {
            "CSForwardPriceModel.BRENT.OIL": {
                "Sigma": 0.35,
                "Alpha": 0.9,
                "Drift": 0.04,
            }
        },
        "Model Configuration": {},
        "Correlations": correlations
        or {
            "ClewlowStricklandProcess.ForwardPrice.BRENT.OIL": {
                "ClewlowStricklandProcess.ForwardPrice.GOLD": 0.6
            }
        },
        "Valuation Configuration": {
            "Run_Date": str(RUN.date()),
            "Time_grid": "0d 2d 1w(1w) 1m(1m)",
        },
    }
    if fmt == "standalone":
        path = tmp_path / "market.json"
        path.write_text(json.dumps({"MarketData": md}))
        return str(path)
    # deal format: base file + explicit override of BRENT sigma
    base_path = tmp_path / "base_market.json"
    base_path.write_text(json.dumps({"MarketData": md}))
    deal = {
        "Calc": {
            "MergeMarketData": {
                "MarketDataFile": "base_market.json",
                "ExplicitMarketData": {
                    "Price Models": {
                        "CSForwardPriceModel.BRENT.OIL": {
                            "Sigma": 0.5,
                            "Alpha": 0.9,
                            "Drift": 0.0,
                        }
                    }
                },
            }
        }
    }
    path = tmp_path / "deal.json"
    path.write_text(json.dumps(deal))
    return str(path)


class TestTimeGrid:
    def test_excel_round_trip(self):
        assert excel_days_to_date(date_to_excel_days(RUN)) == RUN
        # Known anchor: 1900-01-01 is Excel day 2 under the 1899-12-30 epoch
        assert date_to_excel_days(pd.Timestamp("1900-01-01")) == 2

    def test_simple_offsets(self):
        grid = parse_time_grid(RUN, RUN + pd.Timedelta(days=30), "0d 2d 5d")
        np.testing.assert_array_equal(grid, [0, 2, 5])

    def test_repeating_segment_handoff(self):
        """'1w(1w) 1m(1m)' — weekly until the 1-month segment starts."""
        grid = parse_time_grid(RUN, RUN + pd.DateOffset(months=3), "0d 1w(1w) 1m(1m)")
        assert 0 in grid and 7 in grid and 14 in grid and 21 in grid
        # monthly segment: Feb 6 and Mar 6 relative to Jan 6
        assert 31 in grid and 59 in grid
        # weekly must not run past the monthly start by more than one step
        weekly = [d for d in grid if d % 7 == 0 and d > 0]
        assert max(weekly) <= 35

    def test_max_date_truncates(self):
        grid = parse_time_grid(RUN, RUN + pd.Timedelta(days=10), "0d 1w(1w) 1m(1m)")
        assert grid.max() <= 10

    def test_compound_offset(self):
        grid = parse_time_grid(RUN, RUN + pd.DateOffset(years=2), "1y3m")
        d = ((RUN + pd.DateOffset(years=1, months=3)) - RUN).days
        np.testing.assert_array_equal(grid, [d])


class TestMarketData:
    def test_standalone_loader(self, tmp_path):
        md = load_market_data(_market_json(tmp_path))
        tenors, prices, ccy = extract_forward_curve(md, "ForwardPrice.BRENT.OIL")
        assert len(tenors) == 6 and ccy == "USD"
        assert prices[0] == 100.0 and np.all(np.diff(tenors) > 0)

    def test_percent_hook_and_implied_params(self, tmp_path):
        md = load_market_data(_market_json(tmp_path))
        params, mtype = extract_model_params(md, "ForwardPrice.GOLD")
        assert mtype == "implied"
        assert params["Sigma"] == pytest.approx(0.25)  # .Percent / 100
        assert params["Drift"] == 0.0

    def test_historical_params(self, tmp_path):
        md = load_market_data(_market_json(tmp_path))
        params, mtype = extract_model_params(md, "ForwardPrice.BRENT.OIL")
        assert mtype == "historical"
        assert params == {"Sigma": 0.35, "Alpha": 0.9, "Drift": 0.04}

    def test_deal_format_merges_overrides(self, tmp_path):
        md = load_market_data(_market_json(tmp_path, fmt="deal"))
        params, _ = extract_model_params(md, "ForwardPrice.BRENT.OIL")
        assert params["Sigma"] == 0.5  # overridden by ExplicitMarketData
        # base sections survive the merge
        tenors, _, _ = extract_forward_curve(md, "ForwardPrice.GOLD")
        assert len(tenors) == 5

    def test_correlations_flattened(self, tmp_path):
        md = load_market_data(_market_json(tmp_path))
        corr = extract_correlations(md)
        key = (
            "ClewlowStricklandProcess.ForwardPrice.BRENT.OIL",
            "ClewlowStricklandProcess.ForwardPrice.GOLD",
        )
        assert corr[key] == 0.6


class TestCholesky:
    def test_identity_when_uncorrelated(self):
        L = build_cholesky({}, ["a", "b", "c"])
        np.testing.assert_allclose(L, np.eye(3))

    def test_correlated_reconstruction(self):
        L = build_cholesky({("a", "b"): 0.7}, ["a", "b"])
        np.testing.assert_allclose(L @ L.T, [[1.0, 0.7], [0.7, 1.0]], atol=1e-12)

    def test_eigenvalue_healing(self):
        """A non-PSD 'correlation' matrix gets healed to a valid one."""
        corr = {("a", "b"): 0.9, ("a", "c"): 0.9, ("b", "c"): -0.9}
        L = build_cholesky(corr, ["a", "b", "c"])
        rebuilt = L @ L.T
        np.testing.assert_allclose(np.diag(rebuilt), 1.0, atol=1e-10)
        assert np.all(np.linalg.eigvalsh(rebuilt) > 0)


class TestPrecalculate:
    def test_matches_reference_formulas(self):
        """Direct recomputation of cs_simulation.py:556-683 step 1-6."""
        base = 45000
        tenors_excel = np.array([45100.0, 45200.0, 45300.0])
        scen = np.array([0, 10, 50, 120, 250])
        sigma, alpha, mu = 0.3, 1.1, 0.05
        pre = precalculate(
            np.array([10.0, 11.0, 12.0]), tenors_excel, scen, sigma, alpha, mu, base
        )

        excel_grid = scen + base
        tenors = (tenors_excel[None, :] - excel_grid[:, None]).clip(0) / DAYS_IN_YEAR
        tenor_rel = tenors_excel - base
        delta = tenor_rel[None, :].clip(scen[:-1, None], scen[1:, None]) - scen[:-1, None]
        dt = np.insert(delta, 0, 0, axis=0) / DAYS_IN_YEAR
        cum = dt.cumsum(axis=0)
        var_adj = (1 - np.exp(-2 * alpha * cum)) / (2 * alpha)
        var = sigma**2 * np.exp(-2 * alpha * tenors) * var_adj
        vol = np.sqrt(np.diff(np.insert(var, 0, 0, axis=0), axis=0))
        drift = mu * cum - 0.5 * var

        np.testing.assert_allclose(pre["vol"][:, :, 0], vol, atol=1e-14)
        np.testing.assert_allclose(pre["drift"][:, :, 0], drift, atol=1e-14)

    def test_variance_stops_at_delivery(self):
        pre = precalculate(
            np.array([10.0]), np.array([45030.0]), np.array([0, 15, 30, 60, 90]),
            0.3, 1.0, 0.0, 45000,
        )
        vol = pre["vol"][:, 0, 0]
        assert vol[1] > 0 and vol[2] > 0
        # after delivery (day 30) no more variance accumulates
        np.testing.assert_allclose(vol[3:], 0.0, atol=1e-14)


class TestRandomNumbers:
    def test_threefry_shape_and_antithetic(self):
        L = build_cholesky({("a", "b"): 0.5}, ["a", "b"])
        z = generate_random_numbers(L, 7, 64, use_antithetic=True, seed=0)
        assert z.shape == (2, 7, 64)
        np.testing.assert_allclose(z[:, :, :32], -z[:, :, 32:], atol=1e-12)

    def test_threefry_correlation(self):
        L = build_cholesky({("a", "b"): 0.8}, ["a", "b"])
        z = generate_random_numbers(L, 50, 4000, seed=3)
        rho = np.corrcoef(z[0].ravel(), z[1].ravel())[0, 1]
        assert rho == pytest.approx(0.8, abs=0.02)

    def test_torch_parity(self):
        """torch backend must reproduce RiskFlow's exact draw order."""
        torch = pytest.importorskip("torch")
        L = build_cholesky({("a", "b"): 0.5}, ["a", "b"])
        torch.manual_seed(42)
        z_ours = generate_random_numbers(
            L, 3, 8, use_antithetic=True, rng_backend="torch"
        )
        torch.manual_seed(42)
        ref = torch.matmul(
            torch.tensor(L, dtype=torch.float64),
            torch.randn(2, 4 * 3, dtype=torch.float64),
        ).reshape(2, 3, -1)
        ref = torch.concat([ref, -ref], dim=-1).numpy()
        np.testing.assert_allclose(z_ours, ref, rtol=1e-14)


class TestPipeline:
    def test_implied_martingale(self, tmp_path):
        """Q-measure (implied) model: E[F(t,T)] = F(0,T)."""
        sim, df, meta = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.GOLD",
            batch_size=4096, simulation_batches=2, random_seed=1,
        )
        F0 = meta["prices"]
        for i in range(len(F0)):
            assert sim[-1, i, :].mean() == pytest.approx(F0[i], rel=2e-2)

    def test_historical_drift(self, tmp_path):
        sim, _, meta = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.BRENT.OIL",
            batch_size=8192, simulation_batches=1, random_seed=2,
        )
        t = meta["scen_time_grid"][-1] / DAYS_IN_YEAR
        # last tenor delivers after the horizon -> pure OU lognormal mean
        expected = meta["prices"][-1] * np.exp(meta["params"]["Drift"] * t)
        assert sim[-1, -1, :].mean() == pytest.approx(expected, rel=2e-2)

    def test_multi_factor_correlation_recovery(self, tmp_path):
        results, dfs, metas = run_multi_factor_simulation_from_json(
            _market_json(tmp_path),
            ["ForwardPrice.BRENT.OIL", "ForwardPrice.GOLD"],
            batch_size=8192, simulation_batches=1, random_seed=4,
            time_grid_string="0d 2d 1w(1w)",
        )
        # the configured 0.6 must actually reach the cholesky: the JSON
        # key carries the ClewlowStricklandProcess prefix, which
        # extract_correlations strips to the factor name (the reference
        # silently got rho=0 here — documented correction). The old
        # assertion was a tautology (abs(rho) >= 0) that hid exactly that.
        a = np.log(results["ForwardPrice.BRENT.OIL"][1, -1, :])
        b = np.log(results["ForwardPrice.GOLD"][1, -1, :])
        rho = np.corrcoef(a, b)[0, 1]
        assert rho == pytest.approx(0.6, abs=0.05)

    def test_riskflow_dataframe_round_trip(self, tmp_path):
        sim, df, meta = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.GOLD",
            batch_size=64, simulation_batches=1,
        )
        assert isinstance(df.index, pd.MultiIndex)
        assert df.index.names == ["tenor", "scenario"]
        back, tenors, dates = from_riskflow_dataframe(df)
        np.testing.assert_allclose(back, sim, rtol=0, atol=0)
        np.testing.assert_array_equal(tenors, meta["tenors_excel"])

    def test_csv_export_and_reload(self, tmp_path):
        _, df, _ = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.GOLD",
            batch_size=16, simulation_batches=1,
        )
        out = tmp_path / "scen.csv"
        export_scenarios_csv(df, str(out))
        reloaded = pd.read_csv(out, index_col=[0, 1])
        assert reloaded.shape == df.shape
        # full round-trip: the loader is the exact inverse of the exporter
        rt = load_scenarios_csv(str(out))
        assert list(rt.index.names) == ["tenor", "scenario"]
        assert isinstance(rt.columns, pd.DatetimeIndex)
        # CSV decimal text costs the last ulp; pandas writes ~17 sig figs
        np.testing.assert_allclose(rt.values, df.values, rtol=1e-12)
        np.testing.assert_array_equal(
            rt.columns.values, pd.DatetimeIndex(df.columns).values
        )
        # and load_riskflow_scenarios accepts the path directly
        via_path = load_riskflow_scenarios(out, "ForwardPrice.GOLD")
        np.testing.assert_allclose(via_path.values, df.values)
        # a reloaded frame feeds straight back into the comparator
        cmp = compare_scenario_outputs(rt, rt, tol=1e-12)
        assert cmp["verdict"] == "MATCH"

    def test_load_riskflow_scenarios_nesting(self, tmp_path):
        _, df, _ = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.GOLD",
            batch_size=16, simulation_batches=1,
        )
        wrapped = {"Results": {"scenarios": {"ForwardPrice.GOLD": df}}}
        got = load_riskflow_scenarios(wrapped, "ForwardPrice.GOLD")
        assert got is df
        got2 = load_riskflow_scenarios({"scenarios": {"X.GOLD.Y": df}}, "GOLD")
        assert got2 is df


class TestComparator:
    def _df(self, tmp_path, seed, n=64):
        _, df, meta = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.GOLD",
            batch_size=n, simulation_batches=1, random_seed=seed,
        )
        return df

    def test_identical_match(self, tmp_path):
        df = self._df(tmp_path, 1)
        res = compare_scenario_outputs(df, df.copy())
        assert res["verdict"] == "MATCH"
        assert res["same_scenario_count"]

    def test_perturbed_mismatch(self, tmp_path):
        df = self._df(tmp_path, 1)
        res = compare_scenario_outputs(df, df * 1.001)
        assert res["verdict"] == "MISMATCH"

    def test_different_counts_ks(self, tmp_path):
        df1 = self._df(tmp_path, 1, n=64)
        df2 = self._df(tmp_path, 2, n=128)
        res = compare_scenario_outputs(df1, df2)
        assert res["verdict"] is None and res["ks_results"]
        # same distribution, different seeds: KS should mostly pass
        frac = np.mean([v["match"] for v in res["ks_results"].values()])
        assert frac > 0.5


class TestReviewHardening:
    """Regression tests for review findings in the MC/scenario stack."""

    def test_sobol_batches_are_distinct(self, tmp_path):
        """rng_backend='sobol_device' must advance the stream per batch
        (all batches were bit-identical copies) and honor random_seed."""
        sim2, _, _ = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.GOLD",
            batch_size=128, simulation_batches=2, random_seed=1,
            rng_backend="sobol_device",
        )
        b0, b1 = sim2[..., :128], sim2[..., 128:]
        assert not np.allclose(b0, b1), "batches must differ"
        sim_seed9, _, _ = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.GOLD",
            batch_size=128, simulation_batches=1, random_seed=9,
            rng_backend="sobol_device",
        )
        assert not np.allclose(sim2[..., :128], sim_seed9), \
            "random_seed must offset the stream"
        # batch 2 continues the stream at offset half=64 (antithetic):
        # a single-batch run whose seed starts there is bit-identical
        sim_cont, _, _ = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.GOLD",
            batch_size=128, simulation_batches=1, random_seed=1 + 64,
            rng_backend="sobol_device",
        )
        np.testing.assert_allclose(b1, sim_cont, rtol=0)

    def test_convergence_analysis_small_run(self, tmp_path):
        """n < 64 scenarios: a single-point ladder, not IndexError."""
        from finite_difference_tpu.scenarios.diagnostics import (
            convergence_analysis,
        )

        sim, _, meta = run_simulation_from_json(
            _market_json(tmp_path), "ForwardPrice.GOLD",
            batch_size=32, simulation_batches=1, random_seed=1,
        )
        df = convergence_analysis(sim, meta)
        assert list(df["n"])[-1] == 32

    def test_hw1f_rejects_nonpositive_alpha(self):
        from finite_difference_tpu.models.mc.hw1f import HW1FParams

        with pytest.raises(ValueError, match="alpha must be positive"):
            HW1FParams.flat(0.0, 0.01)

    def test_gbm_rejects_nonascending_grid(self):
        from finite_difference_tpu.models.mc.gbm import GBMParams, GBMSimulator

        sim = GBMSimulator(GBMParams(mu=0.05, sigma=0.2))
        z = np.zeros((4, 8))
        with pytest.raises(ValueError, match="ascending"):
            sim.simulate(100.0, np.array([0.0, 30.0, 20.0, 60.0]), z)

    def test_theoretical_moments_clip_at_delivery(self):
        from finite_difference_tpu.scenarios.simulation import (
            _theoretical_moments,
        )

        params = {"Sigma": 0.3, "Alpha": 1.2, "Drift": 0.04}
        base = 45000.0
        # tenor delivering at 0.5y, horizon 2y: moments freeze at delivery
        out = _theoretical_moments(
            [100.0], [base + 0.5 * 365.25], base, params, 2.0
        )
        out_at_delivery = _theoretical_moments(
            [100.0], [base + 0.5 * 365.25], base, params, 0.5
        )
        np.testing.assert_allclose(out, out_at_delivery, rtol=1e-12)
