import numpy as np
import pytest
import jax
import jax.numpy as jnp

from finite_difference_tpu.models.pde.batch import build_trade_batch, price_batch_kernel
from finite_difference_tpu.models.pde.pallas_kernel import (
    cn_barrier_solve_hoisted,
    price_barrier_batch_pallas,
)


@pytest.fixture(scope="module")
def small_batch():
    rng = np.random.default_rng(0)
    B = 8
    t = 31.0 / 365.0
    return build_trade_batch(
        spots=list(rng.uniform(180.0, 250.0, B)),
        strikes=[190.0] * B,
        sigmas=list(rng.uniform(0.2, 0.35, B)),
        t_expiry=[t] * B,
        r=[0.0705] * B,
        b=[0.0705] * B,
        is_call=[True] * B,
        n_time_steps=64,
        monitor_times=[[t * (k + 1) / 8.0 for k in range(8)]] * B,
        upper=[260.0] * B,
        num_space_nodes=255,
    )


class TestPallasCNKernel:
    def test_interpret_matches_xla_path(self, small_batch):
        """The fused kernel must reproduce the production cn_solve path
        bit-for-bit-ish (f64 interpret mode on CPU)."""
        dev = jax.tree.map(jnp.asarray, small_batch)
        ref = price_batch_kernel(dev, n_nodes=256, with_greeks=True)
        got = price_barrier_batch_pallas(
            small_batch, n_nodes=256, with_greeks=True, trade_block=8,
            interpret=True,
        )
        for k in ("price", "delta", "gamma", "vega", "theta"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-9, atol=1e-9,
                err_msg=k,
            )

    def test_hoisted_xla_variant_matches(self, small_batch):
        dev = jax.tree.map(jnp.asarray, small_batch)
        ref = price_batch_kernel(dev, n_nodes=256, with_greeks=False)
        v, s = cn_barrier_solve_hoisted(dev, dev.sigma, n_nodes=256, n_steps=64)
        price = np.asarray(jax.vmap(jnp.interp)(dev.s_eff, s, v))
        np.testing.assert_allclose(price, np.asarray(ref["price"]), rtol=1e-9)

    def test_rebate_at_expiry(self):
        """Rebate projection inside the kernel matches the stepper."""
        B = 8
        t = 0.25
        tb = build_trade_batch(
            spots=[100.0] * B,
            strikes=[100.0] * B,
            sigmas=[0.3] * B,
            t_expiry=[t] * B,
            r=[0.05] * B,
            b=[0.05] * B,
            is_call=[True] * B,
            n_time_steps=32,
            monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
            upper=[120.0] * B,
            rebate=[5.0] * B,
            num_space_nodes=127,
        )
        dev = jax.tree.map(jnp.asarray, tb)
        ref = price_batch_kernel(dev, n_nodes=128, with_greeks=False)
        got = price_barrier_batch_pallas(
            tb, n_nodes=128, with_greeks=False, trade_block=8, interpret=True
        )
        np.testing.assert_allclose(got["price"], np.asarray(ref["price"]), rtol=1e-9)
        # rebate floor: KO near-certain trades still worth ~PV(rebate)
        assert (np.asarray(got["price"]) > 0).all()
