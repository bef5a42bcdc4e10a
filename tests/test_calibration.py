import json

import numpy as np
import pandas as pd
import pytest

from finite_difference_tpu.calibration import (
    bootstrap_from_json,
    bootstrap_fx_from_json,
    build_parser,
    calc_statistics,
    calibrate_historical,
    calibrate_hw1f_interest_rate,
    calibrate_implied,
    calibrate_pca_interest_rate,
    compare_gbm_fx_params,
    compare_hw1f_params,
    correct_declining_variance,
    cs_variance,
    extract_atm_vols,
    extract_gbm_fx_params,
    extract_hw1f_params,
    extract_pca_params,
    force_positive_shift,
    pca,
    run_gbm_fx_calibration,
)
from finite_difference_tpu.calibration.cs import black_european_option_price


def _ou_panel(alpha=1.5, sigma=0.4, mu=0.02, n_days=4000, n_cols=3, seed=7):
    rng = np.random.default_rng(seed)
    dt = 1.0 / 252.0
    theta = np.log(100.0)
    cols = {}
    for c in range(n_cols):
        x = np.empty(n_days)
        x[0] = theta
        for i in range(1, n_days):
            x[i] = (
                x[i - 1]
                + alpha * (theta - x[i - 1]) * dt
                + sigma * np.sqrt(dt) * rng.normal()
            )
        cols[f"A,{0.25 * (c + 1)}"] = np.exp(x)
    idx = pd.bdate_range("2010-01-01", periods=n_days)
    return pd.DataFrame(cols, index=idx)


class TestStatistics:
    def test_ou_parameter_recovery(self):
        df = _ou_panel(alpha=1.5, sigma=0.4)
        stats, corr, delta = calc_statistics(df, method="Log")
        assert stats["Mean Reversion Speed"].mean() == pytest.approx(1.5, rel=0.5)
        assert stats["Reversion Volatility"].mean() == pytest.approx(0.4, rel=0.1)
        assert corr.shape == (3, 3)
        np.testing.assert_allclose(np.diag(corr), 1.0)

    def test_force_positive(self):
        df = pd.DataFrame({"a": [0.01, -0.02, 0.03]})
        assert force_positive_shift(df) == pytest.approx(0.1)
        assert force_positive_shift(pd.DataFrame({"a": [0.01, 0.02]})) == 0.0

    def test_smooth_outlier_removal(self):
        df = _ou_panel(n_days=500, n_cols=1)
        df.iloc[250] *= 100.0  # inject outlier
        stats_s, _, _ = calc_statistics(df, smooth=3.0)
        stats_r, _, _ = calc_statistics(df)
        assert (
            stats_s["Reversion Volatility"].iloc[0]
            < stats_r["Reversion Volatility"].iloc[0]
        )


class TestCSCalibration:
    def test_historical_recovery(self):
        df = _ou_panel(alpha=1.0, sigma=0.4, n_cols=1)
        params = calibrate_historical(df)
        assert params["Alpha"] == pytest.approx(1.0, rel=0.6)
        assert params["Sigma"] == pytest.approx(0.4, rel=0.1)

    def test_cs_variance_limits(self):
        # alpha -> 0: V = sigma^2 * T
        assert float(cs_variance(0.3, 0.0, 2.0, 2.0)) == pytest.approx(0.09 * 2.0)
        # Samuelson damping: larger S -> less variance
        assert float(cs_variance(0.3, 1.0, 1.0, 3.0)) < float(
            cs_variance(0.3, 1.0, 1.0, 1.0)
        )

    def test_black_put_call_parity(self):
        F, K, r, vol, t = 100.0, 95.0, 0.05, 0.3, 1.0
        c = float(black_european_option_price(F, K, r, vol, t, 1.0, 1.0))
        p = float(black_european_option_price(F, K, r, vol, t, 1.0, -1.0))
        assert c - p == pytest.approx((F - K) * np.exp(-r * t), rel=1e-10)

    def test_implied_round_trip(self):
        """Premiums generated from known (sigma, alpha) must be recovered."""
        true_sigma, true_alpha = 0.45, 0.8
        options = []
        for T, S in [(0.25, 0.3), (0.5, 0.6), (1.0, 1.1), (1.5, 1.6), (2.0, 2.1)]:
            for K in (90.0, 100.0, 110.0):
                var = float(cs_variance(true_sigma, true_alpha, T, S))
                prem = float(
                    black_european_option_price(
                        100.0, K, 0.0, np.sqrt(var), 1.0, 1.0, 1.0
                    )
                ) * np.exp(-0.05 * T)
                options.append(
                    dict(Forward=100.0, Strike=K, r=0.05, T=T, S=S,
                         Premium=prem, Units=1.0, Option_Type="Call", Weight=1.0)
                )
        out = calibrate_implied(options)
        assert out["Sigma"] == pytest.approx(true_sigma, rel=1e-3)
        assert out["Alpha"] == pytest.approx(true_alpha, rel=1e-2)

    def test_bootstrap_from_json(self, tmp_path):
        base_excel = 45000
        fwd_data = [[base_excel + 30 * i, 100.0 + i] for i in range(1, 13)]
        vol_rows = []
        for T in (0.25, 0.5, 1.0):
            vol_rows.append([1.0, T, T + 0.08, 0.35])
        md = {
            "MarketData": {
                "Price Factors": {
                    "ForwardPrice.BRENT.OIL": {
                        "Curve": {".Curve": {"meta": [], "data": fwd_data}},
                        "Currency": "USD",
                    },
                    "InterestRate.USD-OIS": {
                        "Curve": {".Curve": {"meta": [], "data": [[0.0, 0.05], [5.0, 0.05]]}},
                        "Day_Count": "ACT_365",
                    },
                    "ForwardPriceVol.BRENT.VOL": {
                        "Surface": {".Curve": {"meta": [], "data": vol_rows}},
                    },
                },
                "Price Models": {},
                "Model Configuration": {},
                "Correlations": {},
                "System Parameters": {"Base_Date": "2023-03-15"},
                "Market Prices": {
                    "CSForwardPriceModelPrices.BRENT.OIL": {
                        "instrument": {
                            "Forward_Volatility": "BRENT.VOL",
                            "Energy": "BRENT.OIL",
                            "Discount_Rate": "USD-OIS",
                            "Energy_Futures_Options": [
                                {
                                    "Expiry_Date": "2023-06-15",
                                    "Settlement_Date": "2023-07-15",
                                    "Option_Type": "Call",
                                },
                                {
                                    "Expiry_Date": "2023-09-15",
                                    "Settlement_Date": "2023-10-15",
                                    "Option_Type": "Call",
                                },
                                {
                                    "Expiry_Date": "2024-03-15",
                                    "Settlement_Date": "2024-04-15",
                                    "Option_Type": "Call",
                                },
                            ],
                        }
                    }
                },
            }
        }
        p = tmp_path / "md.json"
        p.write_text(json.dumps(md))
        results = bootstrap_from_json(str(p))
        assert "BRENT.OIL" in results
        out = results["BRENT.OIL"]
        assert 0.001 < out["Sigma"] < 2.5
        assert -1.0 <= out["Alpha"] <= 2.0

        # same factors re-encoded as {"_type": "Curve"} with rows
        # REVERSED must bootstrap to the identical answer. Regression:
        # the _type branch skipped the ascending sort, so np.interp
        # silently produced garbage forwards/discounts for any
        # non-ascending JSON row order.
        md2 = json.loads(json.dumps(md))
        pf = md2["MarketData"]["Price Factors"]
        pf["ForwardPrice.BRENT.OIL"]["Curve"] = {
            "_type": "Curve", "array": list(reversed(fwd_data)),
        }
        pf["InterestRate.USD-OIS"]["Curve"] = {
            "_type": "Curve", "array": [[5.0, 0.05], [0.0, 0.05]],
        }
        p2 = tmp_path / "md_unsorted.json"
        p2.write_text(json.dumps(md2))
        out2 = bootstrap_from_json(str(p2))["BRENT.OIL"]
        assert out2["Sigma"] == pytest.approx(out["Sigma"], rel=1e-12)
        assert out2["Alpha"] == pytest.approx(out["Alpha"], rel=1e-12)


class TestHW1F:
    def test_calibrate_structure(self):
        df = _ou_panel(n_cols=3)
        param, corr, delta = calibrate_hw1f_interest_rate(df)
        assert set(param) >= {
            "Lambda", "Alpha", "Sigma", "Historical_Yield",
            "Quanto_FX_Correlation", "Force_Positive",
        }
        assert param["Force_Positive"] == 0.0
        sigma_pairs = param["Sigma"][".Curve"]["data"]
        assert len(sigma_pairs) == 3
        assert all(v > 0 for _, v in sigma_pairs)

    def test_all_nan_column_keeps_tenor_alignment(self):
        """A never-quoted (all-NaN) middle column is dropped inside
        calc_statistics; the calibrated Sigma/Historical_Yield pairs must
        carry the SURVIVING columns' tenors. Regression: tenors were
        parsed from the original panel columns, so zip() shifted every
        vol after the dropped column onto the preceding tenor label."""
        df = _ou_panel(n_cols=4)
        df_nan = df.copy()
        df_nan["A,0.5"] = np.nan  # drop the 2nd tenor entirely
        param, _, _ = calibrate_hw1f_interest_rate(df_nan)
        pairs = param["Sigma"][".Curve"]["data"]
        assert [t for t, _ in pairs] == [0.25, 0.75, 1.0]
        # surviving tenors keep the same vols as a panel without the
        # dropped column at all
        param_ref, _, _ = calibrate_hw1f_interest_rate(
            df[["A,0.25", "A,0.75", "A,1.0"]]
        )
        ref_pairs = param_ref["Sigma"][".Curve"]["data"]
        np.testing.assert_allclose(
            [v for _, v in pairs], [v for _, v in ref_pairs], rtol=1e-12
        )
        yld = param["Historical_Yield"]
        assert [t for t, _ in yld] == [0.25, 0.75, 1.0]

    def test_pca_all_nan_column_keeps_tenor_alignment(self):
        """Same misalignment regression for the PCA calibrator."""
        from finite_difference_tpu.calibration.pca import (
            calibrate_pca_interest_rate,
        )

        df = _ou_panel(n_cols=4)
        df["A,0.5"] = np.nan
        info = calibrate_pca_interest_rate(df)
        for key in ("Yield_Volatility", "Historical_Yield"):
            assert [t for t, _ in info.param[key]] == [0.25, 0.75, 1.0], key
        for ev in info.param["Eigenvectors"]:
            assert [t for t, _ in ev["Eigenvector"]] == [0.25, 0.75, 1.0]

    def test_negative_rates_shifted(self):
        df = _ou_panel(n_cols=2) / 1000.0 - 0.05  # force negatives
        param, _, _ = calibrate_hw1f_interest_rate(df)
        assert param["Force_Positive"] > 0

    def test_extract_and_compare(self, tmp_path):
        md = {
            "MarketData": {
                "Price Models": {
                    "HullWhite1FactorInterestRateModel.ZAR-SWAP": {
                        "Lambda": 0.0,
                        "Alpha": 1.2,
                        "Sigma": {".Curve": {"meta": [], "data": [[0.0, 0.1]]}},
                        "Quanto_FX_Correlation": 0.0,
                        "Quanto_FX_Volatility": 0.0,
                    }
                }
            }
        }
        p = tmp_path / "md.json"
        p.write_text(json.dumps(md))
        ext = extract_hw1f_params(str(p), "HullWhite1FactorInterestRateModel.ZAR-SWAP")
        got = ext["HullWhite1FactorInterestRateModel.ZAR-SWAP"]
        assert got["Alpha"] == 1.2 and got["Sigma"] == [[0.0, 0.1]]

        cal = {"Alpha": 1.25, "Sigma": {".Curve": {"meta": [], "data": [[0.0, 0.11]]}}}
        df = compare_hw1f_params(cal, ext, "HullWhite1FactorInterestRateModel.ZAR-SWAP")
        alpha_row = df[df["Parameter"].str.startswith("Alpha")].iloc[0]
        assert alpha_row["Abs_Diff"] == pytest.approx(0.05)


class TestPCA:
    def test_pca_reconstruction(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(4, 4))
        cov = A @ A.T
        aki, evecs, evals = pca(cov, 4)
        np.testing.assert_allclose(aki @ aki.T, cov, atol=1e-10)
        np.testing.assert_allclose(evecs.T @ evecs, np.eye(4), atol=1e-10)
        assert np.all(np.diff(evals) <= 1e-12)  # descending

    def test_calibrate_pca_structure(self):
        df = _ou_panel(n_cols=4)
        info = calibrate_pca_interest_rate(df, num_factors=2)
        assert len(info.param["Eigenvectors"]) == 2
        ev0 = info.param["Eigenvectors"][0]
        assert ev0["Eigenvalue"] >= info.param["Eigenvectors"][1]["Eigenvalue"]
        assert len(ev0["Eigenvector"]) == 4
        assert info.correlation_coef.shape == (2, 4)

    def test_extract_pca(self, tmp_path):
        md = {
            "MarketData": {
                "Price Models": {
                    "PCAInterestRateModel.ZAR-SWAP": {
                        "Reversion_Speed": 1.0,
                        "Historical_Yield": {".Curve": {"meta": [], "data": [[1.0, 0.07]]}},
                        "Yield_Volatility": {".Curve": {"meta": [], "data": [[1.0, 0.01]]}},
                        "Eigenvectors": [
                            {
                                "Eigenvalue": 0.9,
                                "Eigenvector": {".Curve": {"meta": [], "data": [[1.0, 0.5]]}},
                            }
                        ],
                        "Rate_Drift_Model": "Drift_To_Forward",
                    }
                }
            }
        }
        p = tmp_path / "md.json"
        p.write_text(json.dumps(md))
        out = extract_pca_params(str(p), "PCAInterestRateModel.ZAR-SWAP")
        got = out["PCAInterestRateModel.ZAR-SWAP"]
        assert got["Reversion_Speed"] == 1.0
        assert got["Eigenvectors"][0]["Eigenvalue"] == 0.9


class TestGBMFX:
    def _surface(self):
        rows = []
        for T, v in [(0.25, 0.15), (0.5, 0.14), (1.0, 0.12), (2.0, 0.13)]:
            for m in (0.9, 1.0, 1.1):
                rows.append([m, T, v + 0.01 * abs(m - 1.0) * 10])
        return np.array(rows)

    def test_extract_atm(self):
        expiries, atm = extract_atm_vols(self._surface())
        np.testing.assert_allclose(expiries, [0.25, 0.5, 1.0, 2.0])
        np.testing.assert_allclose(atm, [0.15, 0.14, 0.12, 0.13])

    def test_declining_variance_corrected(self):
        expiries = np.array([0.25, 0.5, 1.0, 2.0])
        atm = np.array([0.30, 0.10, 0.08, 0.25])  # sharply declining variance
        avg, inst, corrected, details = correct_declining_variance(expiries, atm)
        assert corrected
        var = np.array(avg) ** 2 * expiries
        assert np.all(np.diff(var) >= -1e-12)  # non-decreasing after fix
        assert all(s >= 0 for s in inst)

    def test_no_correction_when_increasing(self):
        expiries = np.array([0.5, 1.0, 2.0])
        atm = np.array([0.10, 0.12, 0.14])
        avg, inst, corrected, _ = correct_declining_variance(expiries, atm)
        assert not corrected
        np.testing.assert_allclose(avg, atm, rtol=1e-12)

    def _json(self, tmp_path):
        rows = self._surface().tolist()
        md = {
            "MarketData": {
                "Price Factors": {
                    "FXVol.EUR": {"Surface": {".Curve": {"meta": [], "data": rows}}},
                    "GBMAssetPriceTSModelParameters.EUR": {
                        "Vol": {".Curve": {"meta": [], "data": [[0.25, 0.15], [2.0, 0.14]]}},
                        "Quanto_FX_Correlation": 0.0,
                    },
                },
                "Price Models": {},
                "Model Configuration": {},
                "Correlations": {},
                "Market Prices": {
                    "GBMAssetPriceTSModelPrices.EUR": {
                        "instrument": {"Asset_Price_Volatility": "EUR"}
                    }
                },
            }
        }
        p = tmp_path / "md.json"
        p.write_text(json.dumps(md))
        return str(p)

    def test_bootstrap_and_compare(self, tmp_path):
        path = self._json(tmp_path)
        calibrated = bootstrap_fx_from_json(path)
        assert "EUR" in calibrated
        extracted = extract_gbm_fx_params(path)
        comparisons = compare_gbm_fx_params(calibrated, extracted)
        assert "EUR" in comparisons and len(comparisons["EUR"]) > 0

    def test_runner_and_cli(self, tmp_path):
        path = self._json(tmp_path)
        out_dir = str(tmp_path / "out")
        calibrated, comparisons = run_gbm_fx_calibration(path, output_dir=out_dir)
        import os

        assert os.path.exists(os.path.join(out_dir, "gbm_fx_EUR.csv"))
        args = build_parser().parse_args([path, "--fx", "EUR", "-v"])
        assert args.fx == ["EUR"]


class TestCSPipeline:
    def test_extract_and_compare(self, tmp_path):
        md = {
            "MarketData": {
                "Price Factors": {
                    "CSForwardPriceModelParameters.BRENT.OIL": {
                        "Sigma": 0.42, "Alpha": 1.1,
                    }
                },
                "Price Models": {}, "Model Configuration": {},
                "Correlations": {},
            }
        }
        p = tmp_path / "md.json"
        p.write_text(json.dumps(md))
        from finite_difference_tpu.calibration import compare_cs_params, extract_cs_params

        ext = extract_cs_params(str(p))
        assert ext["BRENT.OIL"]["Sigma"] == 0.42
        cal = {"BRENT.OIL": {"Sigma": 0.44, "Alpha": 1.05}}
        df = compare_cs_params(cal, ext)
        sig_row = df[(df["Parameter"] == "Sigma")].iloc[0]
        assert sig_row["Abs_Diff"] == pytest.approx(0.02)

    def test_create_rate_df_alias(self):
        from finite_difference_tpu.utils import create_rate_df

        df = create_rate_df(0.08)
        assert df["Date"].iloc[0] == "2025/07/28"
        assert (df["NACA"] == 0.08).all()
