import numpy as np
import pytest
import jax
import jax.numpy as jnp

from finite_difference_tpu.models.analytic import (
    black76_price,
    bs_greeks,
    bs_price,
    generalized_bs_price,
)
from finite_difference_tpu.ops import norm_cdf, norm_icdf


class TestNorm:
    def test_cdf_icdf_roundtrip(self):
        u = jnp.linspace(0.001, 0.999, 101)
        np.testing.assert_allclose(norm_cdf(norm_icdf(u)), u, rtol=1e-10)

    def test_cdf_known(self):
        assert float(norm_cdf(jnp.asarray(0.0))) == pytest.approx(0.5)
        assert float(norm_cdf(jnp.asarray(1.959963984540054))) == pytest.approx(
            0.975, abs=1e-12
        )


class TestBlackScholes:
    def test_known_value(self):
        # Hull-style: S=100 K=100 sigma=0.2 T=1 r=0.05 q=0 call
        p = float(bs_price(100.0, 100.0, 0.2, 1.0, 0.05, 0.0, True))
        assert p == pytest.approx(10.450583572185565, rel=1e-10)

    def test_put_call_parity(self):
        s, k, sig, t, r, q = 105.0, 95.0, 0.3, 0.7, 0.06, 0.02
        c = float(bs_price(s, k, sig, t, r, q, True))
        p = float(bs_price(s, k, sig, t, r, q, False))
        assert c - p == pytest.approx(
            s * np.exp(-q * t) - k * np.exp(-r * t), rel=1e-12
        )

    def test_greeks_vs_autodiff(self):
        s, k, sig, t, r, q = 100.0, 110.0, 0.25, 0.5, 0.04, 0.01
        g = bs_greeks(s, k, sig, t, r, q, False)
        f = lambda s_: bs_price(s_, k, sig, t, r, q, False)
        assert float(g["delta"]) == pytest.approx(float(jax.grad(f)(s)), rel=1e-9)
        assert float(g["gamma"]) == pytest.approx(
            float(jax.grad(jax.grad(f))(s)), rel=1e-8
        )
        fv = lambda v_: bs_price(s, k, v_, t, r, q, False)
        assert float(g["vega"]) == pytest.approx(float(jax.grad(fv)(sig)), rel=1e-9)
        ft = lambda t_: bs_price(s, k, sig, t_, r, q, False)
        assert float(g["theta"]) == pytest.approx(-float(jax.grad(ft)(t)), rel=1e-8)

    def test_black76_forward_consistency(self):
        f, k, sig, t, r = 80.0, 75.0, 0.35, 1.25, 0.07
        df = np.exp(-r * t)
        p_b76 = float(black76_price(f, k, sig, t, df, True))
        p_gbs = float(generalized_bs_price(f, k, sig, t, r, 0.0, True))
        assert p_b76 == pytest.approx(p_gbs, rel=1e-12)

    def test_degenerate_intrinsic(self):
        assert float(black76_price(120.0, 100.0, 0.2, 0.0, 1.0, True)) == 20.0
        assert float(black76_price(120.0, 100.0, 0.0, 1.0, 0.9, False)) == 0.0

    def test_batched(self):
        spots = jnp.linspace(50, 150, 32)
        prices = bs_price(spots, 100.0, 0.2, 1.0, 0.05, 0.0, True)
        assert prices.shape == (32,)
        assert bool(jnp.all(jnp.diff(prices) > 0))
