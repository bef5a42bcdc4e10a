import json

import numpy as np
import pandas as pd
import pytest

from finite_difference_tpu.scenarios import (
    correlation_recovery,
    cs_log_variance,
    cs_theoretical_price_moments,
    date_to_excel_days,
    martingale_test,
    moment_matching,
    parameter_recovery,
    run_full_diagnostics,
    run_multi_factor_simulation_from_json,
    run_simulation_from_json,
    tail_analysis,
)

RUN = pd.Timestamp("2025-01-06")


@pytest.fixture(scope="module")
def sim_meta(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("diag")
    base_excel = date_to_excel_days(RUN)
    md = {
        "MarketData": {
            "Price Factors": {
                "ForwardPrice.BRENT": {
                    "Curve": {".Curve": {"meta": [], "data": [
                        [base_excel + 120, 100.0],
                        [base_excel + 240, 102.0],
                        [base_excel + 480, 104.0],
                    ]}},
                    "Currency": "USD",
                },
                "ForwardPrice.GOLD": {
                    "Curve": {".Curve": {"meta": [], "data": [
                        [base_excel + 120, 50.0],
                        [base_excel + 480, 52.0],
                    ]}},
                    "Currency": "USD",
                },
                "CSForwardPriceModelParameters.BRENT": {"Sigma": 0.4, "Alpha": 1.1},
                "CSForwardPriceModelParameters.GOLD": {"Sigma": 0.25, "Alpha": 0.8},
            },
            "Price Models": {},
            "Model Configuration": {},
            "Correlations": {
                "ClewlowStricklandProcess.ForwardPrice.BRENT": {
                    "ClewlowStricklandProcess.ForwardPrice.GOLD": 0.5
                }
            },
            "Valuation Configuration": {
                "Run_Date": str(RUN.date()),
                "Time_grid": "0d 2d 1w(1w) 1m(1m)",
            },
        }
    }
    p = tmp / "md.json"
    p.write_text(json.dumps(md))
    sim, df, meta = run_simulation_from_json(
        str(p), "ForwardPrice.BRENT", batch_size=8192, simulation_batches=2,
        random_seed=3, max_date=RUN + pd.Timedelta(days=100),
    )
    return str(p), sim, meta


class TestTheory:
    def test_log_variance_limits(self):
        assert cs_log_variance(0.3, 0.0, 2.0, 1.0) == pytest.approx(0.09)
        # variance stops at delivery
        assert cs_log_variance(0.3, 1.0, 1.0, 5.0) == cs_log_variance(0.3, 1.0, 1.0, 1.0)

    def test_price_moments_consistency(self):
        out = cs_theoretical_price_moments(100.0, 0.3, 1.0, 0.05, 2.0, 1.0)
        assert out["price_mean"] == pytest.approx(100.0 * np.exp(0.05))
        assert out["price_std"] > 0


class TestMartingale:
    def test_implied_passes(self, sim_meta):
        _, sim, meta = sim_meta
        df = martingale_test(sim, meta)
        # with 16k scenarios the vast majority of (t, T) cells must pass
        assert df["pass"].mean() > 0.8
        np.testing.assert_allclose(df["ratio"], 1.0, atol=0.02)


class TestMoments:
    def test_log_and_price_moments(self, sim_meta):
        _, sim, meta = sim_meta
        log_df, price_df = moment_matching(sim, meta)
        assert len(log_df) > 0
        np.testing.assert_allclose(log_df["sim_var"], log_df["theo_var"], rtol=0.1)
        np.testing.assert_allclose(
            price_df["sim_mean"], price_df["theo_mean"], rtol=0.02
        )


class TestTails:
    def test_ks_and_quantiles(self, sim_meta):
        _, sim, meta = sim_meta
        out = tail_analysis(sim, meta)
        assert out["ks_pvalue"] > 0.001  # threefry normals: lognormal holds
        for q, d in out["quantiles"].items():
            assert d["sim"] == pytest.approx(d["theo"], abs=0.05)


class TestRecovery:
    def test_parameter_recovery(self, sim_meta):
        _, sim, meta = sim_meta
        rec = parameter_recovery(sim, meta)
        assert rec["alpha"] == pytest.approx(meta["params"]["Alpha"], abs=0.3)
        assert rec["sigma"] == pytest.approx(meta["params"]["Sigma"], rel=0.15)
        assert rec["drift"] == pytest.approx(0.0, abs=0.05)

    def test_correlation_recovery(self, sim_meta):
        path, _, _ = sim_meta
        results, _, metas = run_multi_factor_simulation_from_json(
            path, ["ForwardPrice.BRENT", "ForwardPrice.GOLD"],
            batch_size=8192, simulation_batches=1, random_seed=5,
        )
        # the configured 0.5 must be applied (the process prefix is
        # stripped by extract_correlations) AND recovered by the
        # diagnostic — the old finiteness-only assertion passed even when
        # the prefix mismatch silently zeroed the correlation
        df = correlation_recovery(results, metas)
        assert df is not None and len(df) == 1
        assert df["rho_sim"].iloc[0] == pytest.approx(0.5, abs=0.05)


class TestFullSuite:
    def test_run_full_diagnostics(self, sim_meta):
        _, sim, meta = sim_meta
        out = run_full_diagnostics(sim, meta, sim_benchmark=sim)
        assert set(out) >= {
            "martingale", "moments", "tails", "recovery",
            "convergence", "standard_errors", "comparison",
        }
        assert out["comparison"]["max_abs_diff"] == 0.0
        conv = out["convergence"]
        # error at full sample below error at smallest sample (on average)
        assert conv["se"].iloc[-1] < conv["se"].iloc[0]
