"""Batched Black-76/BS implied vol: round-trip, edge semantics, AD.

The reference has no implied-vol solver (its calibrations consume quoted
vols, cs_implied_calibration.py:465); this kernel adds the inverse map for
price-quoted chains. Accuracy gates reflect the conditioning analysis in
the module docstring: lanes whose time value carries full precision invert
to ~1e-13; lanes within a few ulps of intrinsic are NaN by design.
"""
import numpy as np
import pytest

from finite_difference_tpu.models.analytic import (
    generalized_bs_price,
    implied_vol_black76,
    implied_vol_bs,
)


def _chain(seed=0, B=20000):
    rng = np.random.default_rng(seed)
    f = rng.uniform(50, 400, B)
    k = f * np.exp(rng.uniform(-3.0, 3.0, B))
    t = rng.uniform(0.02, 10.0, B)
    sigma = rng.uniform(0.02, 1.5, B)
    r = rng.uniform(0.0, 0.1, B)
    df = np.exp(-r * t)
    is_call = rng.integers(0, 2, B).astype(bool)
    price = np.asarray(
        df * generalized_bs_price(f, k, sigma, t, 0.0, 0.0, is_call)
    )
    return price, f, k, t, df, is_call, sigma


class TestImpliedVol:
    def test_round_trip_wide_domain(self):
        price, f, k, t, df, is_call, sigma = _chain()
        iv = np.asarray(implied_vol_black76(price, f, k, t, df, is_call))
        ok = np.isfinite(iv)
        assert ok.mean() > 0.9  # the rest are below the intrinsic ulp floor
        err = np.abs(iv[ok] - sigma[ok]) / sigma[ok]
        assert np.median(err) < 1e-14
        assert np.quantile(err, 0.99) < 1e-6
        # price-space round trip: the solver inverts the given price
        rt = np.asarray(
            df * generalized_bs_price(
                f, k, np.where(ok, iv, 0.3), t, 0.0, 0.0, is_call
            )
        )
        rel_p = np.abs(rt[ok] - price[ok]) / np.maximum(price[ok], 1e-300)
        assert np.quantile(rel_p, 0.99) < 1e-10

    def test_well_conditioned_lanes_hit_machine_precision(self):
        """OTM quotes carry full input precision (no intrinsic shed), so
        the solver must return ~machine-precision vols there. ITM quotes
        are limited by eps * intrinsic / timevalue — covered by the
        percentile gates in the round-trip test instead."""
        price, f, k, t, df, is_call, sigma = _chain(seed=1)
        x = np.log(f / k)
        v = sigma * np.sqrt(t)
        otm = is_call != (x > 0)
        good = (np.abs(x) / v < 5.0) & (v > 0.05) & (v < 2.0) & otm
        iv = np.asarray(
            implied_vol_black76(price[good], f[good], k[good], t[good],
                                df[good], is_call[good])
        )
        np.testing.assert_allclose(iv, sigma[good], rtol=5e-12)

    def test_arbitrage_violations_are_nan(self):
        f, k, t, df = 100.0, 100.0, 1.0, 0.95
        # above the v->inf bound (call worth more than F)
        assert np.isnan(float(implied_vol_black76(0.95 * 101.0, f, k, t, df, True)))
        # below intrinsic (ITM call below F - K)
        assert np.isnan(float(implied_vol_black76(0.95 * 9.0, f, 90.0, t, df, True)))
        # zero price
        assert np.isnan(float(implied_vol_black76(0.0, f, k, t, df, True)))
        # t = 0
        assert np.isnan(float(implied_vol_black76(5.0, f, k, 0.0, df, True)))

    def test_deep_itm_time_value_below_ulp_is_nan_not_noise(self):
        """A deep-ITM premium whose time value rounded away must NOT imply
        a plausible-looking vol from representation noise."""
        f, k, t = 100.0, np.exp(-2.8) * 100.0, 0.25
        price = f - k  # exactly intrinsic: time value lost
        assert np.isnan(float(implied_vol_black76(price, f, k, t, 1.0, True)))

    def test_put_symmetry(self):
        """Call and put quotes of the same trade invert to the same vol
        (moderate moneyness: one side is ITM, whose precision is bounded
        by eps * intrinsic / timevalue — keep lanes where that is tiny)."""
        price, f, k, t, df, is_call, sigma = _chain(seed=2, B=512)
        x = np.log(f / k)
        keep = (np.abs(x) < 1.0) & (sigma * np.sqrt(t) > 0.1)
        f, k, t, df, sigma = (a[keep] for a in (f, k, t, df, sigma))
        iv_c = np.asarray(
            implied_vol_black76(
                np.asarray(df * generalized_bs_price(f, k, sigma, t, 0.0, 0.0, True)),
                f, k, t, df, True,
            )
        )
        iv_p = np.asarray(
            implied_vol_black76(
                np.asarray(df * generalized_bs_price(f, k, sigma, t, 0.0, 0.0, False)),
                f, k, t, df, False,
            )
        )
        both = np.isfinite(iv_c) & np.isfinite(iv_p)
        np.testing.assert_allclose(iv_c[both], iv_p[both], rtol=1e-7)

    def test_bs_spot_form(self):
        s, kk, t, r, q, sig = 120.0, 100.0, 2.0, 0.06, 0.02, 0.33
        from finite_difference_tpu.models.analytic import bs_price

        p = float(bs_price(s, kk, sig, t, r, q, True))
        iv = float(implied_vol_bs(p, s, kk, t, r, q, True))
        assert iv == pytest.approx(sig, rel=1e-12)

    def test_jvp_through_solver(self):
        """d(sigma)/d(price) by forward AD equals 1/vega."""
        import jax
        import jax.numpy as jnp
        from finite_difference_tpu.models.analytic import bs_greeks

        s, kk, t, r, sig = 100.0, 110.0, 1.5, 0.05, 0.3
        from finite_difference_tpu.models.analytic import bs_price

        p = float(bs_price(s, kk, sig, t, r, 0.0, True))
        f = s * np.exp(r * t)
        df = np.exp(-r * t)
        fn = lambda p_: implied_vol_black76(p_, f, kk, t, df, True)
        _, dsig_dp = jax.jvp(fn, (jnp.asarray(p),), (jnp.ones(()),))
        g = bs_greeks(s, kk, sig, t, r, 0.0, True)
        vega = float(g["vega"])  # dP/dsigma
        assert float(dsig_dp) == pytest.approx(1.0 / vega, rel=1e-6)
