import datetime as dt

import numpy as np
import pandas as pd
import pytest

from finite_difference_tpu.models.mc import CSParams
from finite_difference_tpu.runners import (
    build_flat_curve,
    run_all_american_scenarios,
    run_all_bgk_scenarios,
    run_all_bs_scenarios,
    run_all_scenarios,
    run_all_scenarios_batched,
    run_asset,
    run_bs_scenario,
)

VAL = dt.date(2025, 7, 28)
MAT = dt.date(2025, 8, 28)
# the reference's 24 ZA-business-day monitor schedule
# (run_config_scenarios.py:206-231) — the FA benchmarks were struck on it
MONITORS = [
    dt.date(2025, 7, 28), dt.date(2025, 7, 29), dt.date(2025, 7, 30),
    dt.date(2025, 7, 31), dt.date(2025, 8, 1), dt.date(2025, 8, 4),
    dt.date(2025, 8, 5), dt.date(2025, 8, 6), dt.date(2025, 8, 7),
    dt.date(2025, 8, 8), dt.date(2025, 8, 11), dt.date(2025, 8, 12),
    dt.date(2025, 8, 13), dt.date(2025, 8, 14), dt.date(2025, 8, 15),
    dt.date(2025, 8, 18), dt.date(2025, 8, 19), dt.date(2025, 8, 20),
    dt.date(2025, 8, 21), dt.date(2025, 8, 22), dt.date(2025, 8, 25),
    dt.date(2025, 8, 26), dt.date(2025, 8, 27), dt.date(2025, 8, 28),
]


def _barrier_config(tmp_path):
    df = pd.DataFrame(
        [
            {
                "scenario_name": "s1", "S0": 229.74, "K": 190.0,
                "sigma": 0.2879, "rate": 0.0731, "barrier_type": "up-and-out",
                "upper_barrier": 260.0, "lower_barrier": np.nan,
                "FA_price": 32.41, "FA_delta": np.nan, "FA_gamma": np.nan,
                "FA_vega": np.nan,
            },
            {
                "scenario_name": "s2", "S0": 229.74, "K": 190.0,
                "sigma": 0.2879, "rate": 0.0731, "barrier_type": "up-and-in",
                "upper_barrier": 260.0, "lower_barrier": np.nan,
                "FA_price": 8.52, "FA_delta": np.nan, "FA_gamma": np.nan,
                "FA_vega": np.nan,
            },
        ]
    )
    p = tmp_path / "config.csv"
    df.to_csv(p, index=False)
    return str(p)


BASE = dict(
    valuation=VAL,
    maturity=MAT,
    monitor_dates=MONITORS,
    opt_type="call",
    num_space_nodes=400,
    num_time_steps=400,
)


class TestBarrierRunner:
    def test_run_all_scenarios(self, tmp_path):
        out = tmp_path / "results.csv"
        df = run_all_scenarios(_barrier_config(tmp_path), str(out), BASE)
        assert len(df) == 2
        # model should be within ~2% of the FA-style benchmarks
        assert df["price_pct_diff"].iloc[0] < 2.0
        assert df["price_pct_diff"].iloc[1] < 2.0
        assert out.exists()
        reloaded = pd.read_csv(out)
        assert "price_pct_diff" in reloaded.columns

    def test_batched_matches_scalar(self, tmp_path):
        cfg = _barrier_config(tmp_path)
        base = dict(BASE, num_space_nodes=500, num_time_steps=500)
        scalar = run_all_scenarios(cfg, None, base)
        batched = run_all_scenarios_batched(cfg, None, base)
        np.testing.assert_allclose(
            batched["model_price"], scalar["model_price"], rtol=2e-2, atol=0.2
        )
        # KO + KI = vanilla holds in both paths
        assert batched["model_price"].sum() == pytest.approx(
            scalar["model_price"].sum(), rel=2e-2
        )

    def test_batched_rebate_matches_scalar(self, tmp_path):
        """rebate_amount/rebate_at_hit in base_params ride the batched
        path (wired into build_trade_batch; KI parity subtracts the
        rebate-carrying KO leg exactly like price_log2). Regression:
        the batched runner silently dropped them."""
        cfg = _barrier_config(tmp_path)
        base = dict(
            BASE, num_space_nodes=500, num_time_steps=500,
            rebate_amount=5.0, rebate_at_hit=False,
        )
        scalar = run_all_scenarios(cfg, None, base)
        batched = run_all_scenarios_batched(cfg, None, base)
        np.testing.assert_allclose(
            batched["model_price"], scalar["model_price"], rtol=2e-2,
            atol=0.2,
        )
        # the rebate leg is material: KO price must exceed the no-rebate run
        base0 = dict(base, rebate_amount=0.0)
        no_reb = run_all_scenarios_batched(cfg, None, base0)
        assert (
            batched["model_price"].iloc[0] > no_reb["model_price"].iloc[0]
        )

    def test_batched_rejects_unsupported_base_params(self, tmp_path):
        cfg = _barrier_config(tmp_path)
        for key, val in (
            ("divs", [(dt.date(2025, 8, 15), 1.0)]),
            ("already_hit", True),
            ("underlying_spot_days", 3),
            ("grid_type", "sinh"),
        ):
            with pytest.raises(ValueError, match="batched barrier runner"):
                run_all_scenarios_batched(cfg, None, dict(BASE, **{key: val}))

    def test_monitor_aligned_schedule_converges_to_uniform(self, tmp_path):
        """--schedule monitor-aligned (per-interval dt, monitors exactly
        on step boundaries) prices the same trades within discretization
        error of the uniform layout, and the batch it builds is genuinely
        non-uniform yet spectral-eligible."""
        cfg = _barrier_config(tmp_path)
        base = dict(BASE, num_space_nodes=300, num_time_steps=300)
        uni = run_all_scenarios_batched(cfg, None, base)
        mal = run_all_scenarios_batched(
            cfg, None, base, schedule="monitor-aligned"
        )
        np.testing.assert_allclose(
            mal["model_price"], uni["model_price"], rtol=5e-3, atol=5e-3
        )

    def test_hybrid_route_discrete_regime_equals_pde(self, tmp_path):
        """24 daily monitors over 1 month stay under the n_lim threshold, so
        route='hybrid' must take the CN path and reproduce route='pde'."""
        cfg = _barrier_config(tmp_path)
        base = dict(BASE, num_space_nodes=300, num_time_steps=300)
        pde = run_all_scenarios_batched(cfg, None, base, route="pde")
        hyb = run_all_scenarios_batched(cfg, None, base, route="hybrid")
        np.testing.assert_allclose(
            hyb["model_price"], pde["model_price"], rtol=1e-12
        )

    def test_hybrid_route_continuous_regime_matches_scalar_hybrid(self, tmp_path):
        """A 10y daily-monitor trade trips the FIS n_lim rule; the routed
        batched price must equal the scalar hybrid pricer's analytic branch
        (RR with BGK-shifted barriers)."""
        from finite_difference_tpu.models.pde.hybrid import (
            DiscreteBarrierFDMPricerAnalytic,
        )
        from finite_difference_tpu.utils.curves import flat_naca_dataframe

        mat = dt.date(2035, 7, 28)
        monitors = [
            VAL + dt.timedelta(days=i) for i in range(1, (mat - VAL).days + 1)
        ]
        base = dict(
            valuation=VAL, maturity=mat, monitor_dates=monitors,
            opt_type="call", num_space_nodes=200, num_time_steps=200,
        )
        cfg = _barrier_config(tmp_path)
        hyb = run_all_scenarios_batched(cfg, None, base, route="hybrid")

        curve = flat_naca_dataframe(0.0731, start=VAL, end=mat + dt.timedelta(days=5))
        for i, bt in enumerate(["up-and-out", "up-and-in"]):
            scalar = DiscreteBarrierFDMPricerAnalytic(
                option_type="call", barrier_type=bt, strike=190.0,
                upper_barrier=260.0, spot=229.74, volatility=0.2879,
                valuation_date=VAL, maturity_date=mat,
                monitoring_dates=monitors, discount_curve=curve,
            )
            assert scalar.use_continuous_window
            assert hyb["model_price"].iloc[i] == pytest.approx(
                scalar.price(), rel=5e-4
            ), bt


class TestAmericanRunner:
    def test_run_all(self, tmp_path):
        cfg = pd.DataFrame(
            [{
                "scenario_name": "am1", "S0": 176.39, "K": 170.0,
                "sigma": 0.2968, "rate": np.exp(0.0705) - 1.0,
                "FA_price": 2.9847, "FA_delta": -0.2979,
                "FA_gamma": 0.0231, "FA_vega": 0.1778,
            }]
        )
        p = tmp_path / "am.csv"
        cfg.to_csv(p, index=False)
        df = run_all_american_scenarios(
            str(p), None,
            dict(valuation=VAL, maturity=MAT, opt_type="put",
                 num_space_nodes=300, num_time_steps=300),
        )
        assert df["price_pct_diff"].iloc[0] < 2.0

    def test_batched_matches_scalar(self, tmp_path):
        """--batched (one device program, Richardson pair) agrees with the
        per-scenario AmericanFDMPricer loop."""
        from finite_difference_tpu.runners.american_scenarios import (
            run_all_american_scenarios_batched,
        )

        cfg = pd.DataFrame(
            [
                {
                    "scenario_name": "am1", "S0": 176.39, "K": 170.0,
                    "sigma": 0.2968, "rate": np.exp(0.0705) - 1.0,
                    "FA_price": 2.9847, "FA_delta": np.nan,
                    "FA_gamma": np.nan, "FA_vega": np.nan,
                },
                {
                    "scenario_name": "am2", "S0": 160.0, "K": 170.0,
                    "sigma": 0.25, "rate": np.exp(0.0705) - 1.0,
                    "FA_price": np.nan, "FA_delta": np.nan,
                    "FA_gamma": np.nan, "FA_vega": np.nan,
                },
            ]
        )
        p = tmp_path / "am.csv"
        cfg.to_csv(p, index=False)
        base = dict(valuation=VAL, maturity=MAT, opt_type="put",
                    num_space_nodes=300, num_time_steps=300)
        scalar = run_all_american_scenarios(str(p), None, base)
        batched = run_all_american_scenarios_batched(str(p), None, base)
        # same snapped grid + the same Richardson quirk -> exact prices;
        # greeks use a central stencil vs the scalar local-cubic (~1e-4)
        np.testing.assert_allclose(
            batched["model_price"], scalar["model_price"], rtol=1e-12
        )
        np.testing.assert_allclose(
            batched["model_delta"], scalar["model_delta"], atol=1e-3
        )
        np.testing.assert_allclose(
            batched["model_vega"], scalar["model_vega"], atol=1e-3
        )

    def test_batched_with_dividends_matches_scalar(self, tmp_path):
        """Discrete dividends in base_params ride the batched path
        (segmented schedule + spline jumps) and still match the scalar
        per-scenario loop."""
        import datetime as _dt

        from finite_difference_tpu.runners.american_scenarios import (
            run_all_american_scenarios_batched,
        )

        cfg = pd.DataFrame(
            [
                {
                    "scenario_name": "amdiv", "S0": 100.0, "K": 100.0,
                    "sigma": 0.3, "rate": 0.07, "FA_price": np.nan,
                    "FA_delta": np.nan, "FA_gamma": np.nan,
                    "FA_vega": np.nan,
                },
            ]
        )
        p = tmp_path / "amdiv.csv"
        cfg.to_csv(p, index=False)
        mat = _dt.date(2026, 1, 28)
        base = dict(
            valuation=VAL, maturity=mat, opt_type="put",
            divs=[(_dt.date(2025, 10, 15), 4.0)],
            num_space_nodes=200, num_time_steps=200,
        )
        scalar = run_all_american_scenarios(str(p), None, base)
        batched = run_all_american_scenarios_batched(str(p), None, base)
        np.testing.assert_allclose(
            batched["model_price"], scalar["model_price"], rtol=1e-10
        )


class TestBSRunner:
    def test_simple_path(self):
        res = run_bs_scenario(
            dict(trade_name="t1", S=100.0, K=95.0, sigma=0.25, T=0.5, r=0.06,
                 option_type="call", bench_price=None)
        )
        assert res["path"] == "simple"
        assert res["model_price"] > 5.0  # ITM call worth more than intrinsic-df

    def test_curve_path_and_diffs(self):
        curve = build_flat_curve(0.0731, VAL, MAT)
        res = run_bs_scenario(
            dict(trade_name="t2", S=176.39, K=170.0, sigma=0.2968,
                 valuation_date=VAL, maturity_date=MAT, option_type="put",
                 discount_curve=curve, underlying_spot_days=3,
                 bench_price=2.9847)
        )
        assert res["path"] == "curve"
        assert res["T_carry"] > 0 and res["F_eff"] > 0
        assert res["price_pct_diff"] < 5.0  # BS93 approx vs FA's FD number

    def test_run_all_csv(self, tmp_path):
        out = tmp_path / "bs.csv"
        trades = [
            dict(trade_name="a", S=100.0, K=100.0, sigma=0.2, T=1.0, r=0.05,
                 option_type="call"),
            dict(trade_name="b", S=100.0, K=100.0, sigma=0.2, T=1.0, r=0.05,
                 option_type="put"),
        ]
        results = run_all_bs_scenarios(trades, output_csv=str(out))
        assert len(results) == 2 and out.exists()


class TestBGKRunner:
    def test_flat_curve_builder(self):
        curve = build_flat_curve(0.085, VAL, MAT, pad_days=5)
        assert curve["Date"].iloc[0] == str(VAL - dt.timedelta(days=1))
        assert (curve["NACA"] == 0.085).all()

    def test_run_all(self):
        curve = build_flat_curve(0.0731, VAL, MAT)
        trades = [
            dict(trade_name="bgk1", S=229.74, K=190.0, sigma=0.2879,
                 valuation_date=VAL, maturity_date=MAT, option_type="call",
                 barrier_type="up-and-out", upper_barrier=260.0,
                 monitor_dates=MONITORS, discount_curve=curve,
                 pricing_method="bgk"),
            dict(trade_name="vanilla", S=229.74, K=190.0, sigma=0.2879,
                 valuation_date=VAL, maturity_date=MAT, option_type="call",
                 barrier_type="none", discount_curve=curve),
        ]
        results = run_all_bgk_scenarios(trades)
        assert all("error" not in r for r in results)
        ko, van = results[0], results[1]
        assert 0 < ko["model_price"] < van["model_price"]
        assert ko["pricing_method"] in ("BGK", "MC")

    def test_bad_trade_reports_error(self):
        results = run_all_bgk_scenarios([dict(trade_name="bad", S=-1.0)])
        assert "error" in results[0]


class TestXvaRunner:
    def test_run_asset(self):
        out = run_asset(
            "BRENT",
            initial_curve=np.array([100.0, 102.0, 104.0]),
            tenor_days=np.array([90.0, 180.0, 365.0]),
            cs_params=CSParams(alpha=1.0, sigma=0.3, mu=0.0),
            sim_cfg=None if False else __import__(
                "finite_difference_tpu.xva", fromlist=["SimulationConfig"]
            ).SimulationConfig(num_sims=5000, dt_days=10, horizon_days=180),
            rng_backend="threefry",
        )
        assert out["asset_code"] == "BRENT"
        assert out["cva"] > 0 and out["peak_pfe"] >= out["peak_ee"]


class TestReferenceModelParity:
    """Golden numbers: the reference's OWN committed model outputs
    (Scneario_results_summary.xlsx model block, BASELINE.md) — not just the
    FA tolerance band. Our CN pricer must reproduce them to ~1e-4 rel."""

    def test_xlsx_model_block(self, tmp_path):
        cfg = pd.DataFrame(
            [
                {"scenario_name": "uo_call_H260", "S0": 229.74, "K": 190.0,
                 "sigma": 0.28790, "rate": 0.073086,
                 "barrier_type": "up-and-out", "upper_barrier": 260.0,
                 "lower_barrier": np.nan, "FA_price": 32.413972,
                 "FA_delta": np.nan, "FA_gamma": np.nan, "FA_vega": np.nan},
                {"scenario_name": "uo_call_H420", "S0": 229.74, "K": 190.0,
                 "sigma": 0.28790, "rate": 0.073086,
                 "barrier_type": "up-and-out", "upper_barrier": 420.0,
                 "lower_barrier": np.nan, "FA_price": 40.9325556,
                 "FA_delta": np.nan, "FA_gamma": np.nan, "FA_vega": np.nan},
                {"scenario_name": "ui_call_H260", "S0": 229.74, "K": 190.0,
                 "sigma": 0.28790, "rate": 0.073086,
                 "barrier_type": "up-and-in", "upper_barrier": 260.0,
                 "lower_barrier": np.nan, "FA_price": 8.5185837,
                 "FA_delta": np.nan, "FA_gamma": np.nan, "FA_vega": np.nan},
            ]
        )
        p = tmp_path / "golden.csv"
        cfg.to_csv(p, index=False)
        df = run_all_scenarios(
            str(p), None,
            dict(valuation=VAL, maturity=MAT, monitor_dates=MONITORS,
                 opt_type="call", num_space_nodes=500, num_time_steps=500),
        )
        reference_model = {"uo_call_H260": 32.464175, "uo_call_H420": 40.9325761,
                           "ui_call_H260": 8.4683807}
        for _, row in df.iterrows():
            want = reference_model[row["scenario_name"]]
            assert row["model_price"] == pytest.approx(want, rel=1e-4), (
                row["scenario_name"]
            )
        # and the headline FA diff reproduces (0.1549%)
        assert df.set_index("scenario_name").loc["uo_call_H260", "price_pct_diff"] == (
            pytest.approx(0.1549, abs=0.01)
        )


class TestRunnerCLIs:
    def test_barrier_cli_writes_csv(self, tmp_path):
        from finite_difference_tpu.runners.barrier_scenarios import main

        out = tmp_path / "out.csv"
        df = main([_barrier_config(tmp_path), "-o", str(out)])
        assert out.exists()
        assert "model_price" in df.columns and len(df) >= 1

    def test_barrier_cli_batched_hybrid_route(self, tmp_path):
        from finite_difference_tpu.runners.barrier_scenarios import main

        out = tmp_path / "routed.csv"
        df = main([
            _barrier_config(tmp_path), "-o", str(out), "--batched",
            "--route", "hybrid", "--num-space-nodes", "200",
        ])
        assert out.exists()
        assert np.isfinite(df["model_price"]).all()

    def test_american_cli(self, tmp_path):
        import pandas as pd

        from finite_difference_tpu.runners.american_scenarios import main

        cfg = tmp_path / "amer.csv"
        pd.DataFrame(
            [{"scenario_name": "a1", "S0": 176.39, "K": 170.0,
              "sigma": 0.296783, "rate": 0.070538, "FA_price": 2.9847,
              "FA_delta": None, "FA_gamma": None, "FA_vega": None}]
        ).to_csv(cfg, index=False)
        df = main([str(cfg), "--opt-type", "put"])
        assert np.isfinite(df["model_price"]).all()

    def test_bs_cli_demo_and_csv(self, tmp_path, capsys):
        import pandas as pd

        from finite_difference_tpu.runners.bs_scenarios import main

        # demo book (no config): prints one line per trade
        main([])
        assert "ATM_Call_1Y_simple" in capsys.readouterr().out

        cfg = tmp_path / "bs.csv"
        pd.DataFrame([
            {"trade_name": "Simple1", "option_type": "call", "S": 100.0,
             "K": 100.0, "sigma": 0.25, "T": 1.0, "r": 0.07,
             "bench_price": 13.3639},
            {"trade_name": "CurvePut", "option_type": "put", "S": 100.0,
             "K": 100.0, "sigma": 0.25, "rate": 0.07,
             "valuation": "2025-08-28", "maturity": "2026-08-28",
             "fwd_rate": 0.08},
        ]).to_csv(cfg, index=False)
        out = tmp_path / "bs_out.csv"
        main([str(cfg), "-o", str(out)])
        df = pd.read_csv(out)
        assert len(df) == 2
        # simple path: reference demo trade, price pinned vs bench
        r0 = df.iloc[0]
        assert r0["path"] == "simple"
        assert abs(r0["model_price"] - 13.3639) < 5e-4
        assert r0["price_abs_diff"] < 5e-4
        # curve path resolved distinct carry (fwd 8%) vs disc (7%) rates
        r1 = df.iloc[1]
        assert r1["path"] == "curve"
        assert abs(r1["disc_rate"] - np.log(1.07)) < 1e-10
        assert r1["carry_rate"] > r1["disc_rate"]

    def test_bgk_cli_demo_and_csv(self, tmp_path, capsys):
        import pandas as pd

        from finite_difference_tpu.runners.bgk_scenarios import (
            main,
            run_bgk_scenario,
            trades_from_csv,
        )

        cfg = tmp_path / "bgk.csv"
        pd.DataFrame([
            {"trade_name": "D1", "option_type": "call",
             "barrier_type": "up-and-out", "S": 100.0, "K": 95.0,
             "sigma": 0.3, "rate": 0.085, "valuation": "2025-07-28",
             "maturity": "2026-07-28", "monitor_frequency": "daily",
             "upper_barrier": 130.0, "rebate_amount": 1.5},
            {"trade_name": "M1", "option_type": "put",
             "barrier_type": "down-and-in", "S": 100.0, "K": 105.0,
             "sigma": 0.28, "rate": 0.085, "valuation": "2025-07-28",
             "maturity": "2026-01-28", "monitor_frequency": "weekly",
             "lower_barrier": 85.0, "pricing_method": "mc",
             "mc_n_paths": 20000},
        ]).to_csv(cfg, index=False)
        out = tmp_path / "bgk_out.csv"
        main([str(cfg), "-o", str(out)])
        assert "D1" in capsys.readouterr().out
        df = pd.read_csv(out)
        assert list(df["pricing_method"]) == ["BGK", "MC"]
        # daily monitoring over a year -> ~251 business-day monitors
        assert 200 <= df.iloc[0]["n_monitors"] <= 260
        # the CSV route prices identically to a hand-built trade dict
        trades = trades_from_csv(str(cfg))
        direct = run_bgk_scenario(trades[0])
        assert abs(df.iloc[0]["model_price"] - direct["model_price"]) < 1e-12
