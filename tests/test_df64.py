"""Double-float (df64) arithmetic: error-free transforms and pair ops.

The on-chip premise (TPU VPU f32 + - * are correctly rounded) is pinned
separately by the pallas probe test in test_pallas_kernel.py (TPU-only);
here the algorithms themselves are validated on CPU, where jax f32 is
IEEE round-to-nearest by construction.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from finite_difference_tpu.ops import df64
from finite_difference_tpu.ops.df64 import (
    DF, add2, add2_fast, from_f64, lt2, max2, mul2, mul2_f32, sub2,
    to_f64, two_prod, two_sum, where2,
)


def _rand_f32(n, seed, spread=15.0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal(n) * np.exp(rng.uniform(-spread, spread, n))
    ).astype(np.float32)


class TestErrorFreeTransforms:
    def test_two_sum_exact(self):
        # exponent spread kept < ~50 bits so the f64 oracle is itself
        # exact: f64 holds the full double-length sum of two f32s then
        a = _rand_f32(4096, 0)
        b = _rand_f32(4096, 1)
        s, e = jax.jit(two_sum)(jnp.asarray(a), jnp.asarray(b))
        s, e = np.asarray(s, np.float64), np.asarray(e, np.float64)
        exact = a.astype(np.float64) + b.astype(np.float64)
        assert np.all(s + e == exact)
        # s is the correctly-rounded f32 sum
        assert np.all(np.asarray(s, np.float32) == (a + b))

    def test_two_prod_exact(self):
        # product of two f32s always fits f64 exactly (48 < 53 bits)
        a = _rand_f32(4096, 2, spread=30.0)
        b = _rand_f32(4096, 3, spread=30.0)
        p, e = jax.jit(two_prod)(jnp.asarray(a), jnp.asarray(b))
        p, e = np.asarray(p, np.float64), np.asarray(e, np.float64)
        exact = a.astype(np.float64) * b.astype(np.float64)
        assert np.all(p + e == exact)
        assert np.all(np.asarray(p, np.float32) == (a * b))

    def test_split_reconstructs(self):
        a = _rand_f32(4096, 4, spread=30.0)
        hi, lo = jax.jit(df64._split)(jnp.asarray(a))
        assert np.all(
            np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
            == a.astype(np.float64)
        )


class TestPairOps:
    def _pairs(self, n, seed):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(n) * np.exp(rng.uniform(-8, 8, n))
        y = rng.standard_normal(n) * np.exp(rng.uniform(-8, 8, n))
        return x, y

    def test_roundtrip_within_pair_precision(self):
        # a df64 pair holds ~49 bits: from_f64 loses only the sub-pair tail
        x, _ = self._pairs(4096, 5)
        d = from_f64(jnp.asarray(x))
        rel = np.abs(np.asarray(to_f64(d)) - x) / np.abs(x)
        assert rel.max() < 2.0**-48

    @pytest.mark.parametrize("op,ref", [
        (add2, np.add), (sub2, np.subtract), (mul2, np.multiply),
    ])
    def test_accurate_ops_near_f64(self, op, ref):
        # judge against the EXACT pair values (from_f64 itself truncates
        # at 2^-50, which near-cancellation would amplify in the oracle)
        x, y = self._pairs(8192, 6)
        da, db = from_f64(jnp.asarray(x)), from_f64(jnp.asarray(y))
        xp, yp = np.asarray(to_f64(da)), np.asarray(to_f64(db))
        got = np.asarray(to_f64(jax.jit(op)(da, db)))
        want = ref(xp, yp)
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
        # accurate grades are ~2 ulp of the RESULT even under cancellation
        assert rel.max() < 2.0**-46, rel.max()

    def test_mul2_f32(self):
        x, y = self._pairs(8192, 7)
        y32 = y.astype(np.float32)
        da = from_f64(jnp.asarray(x))
        xp = np.asarray(to_f64(da))
        got = np.asarray(to_f64(mul2_f32(da, jnp.asarray(y32))))
        want = xp * y32.astype(np.float64)
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
        assert rel.max() < 2.0**-46

    def test_add2_fast_well_conditioned(self):
        # same-sign accumulation (the CN march's dominant add shape):
        # sloppy add keeps near-full df64 accuracy
        x = np.abs(self._pairs(8192, 8)[0])
        y = np.abs(self._pairs(8192, 9)[0])
        da, db = from_f64(jnp.asarray(x)), from_f64(jnp.asarray(y))
        want = np.asarray(to_f64(da)) + np.asarray(to_f64(db))
        got = np.asarray(to_f64(add2_fast(da, db)))
        rel = np.abs(got - want) / want
        assert rel.max() < 2.0**-45

    def test_select_and_max(self):
        x, y = self._pairs(4096, 10)
        da, db = from_f64(jnp.asarray(x)), from_f64(jnp.asarray(y))
        xp, yp = np.asarray(to_f64(da)), np.asarray(to_f64(db))
        assert np.all(np.asarray(to_f64(max2(da, db))) == np.maximum(xp, yp))
        assert np.all(np.asarray(lt2(da, db)) == (xp < yp))
        c = jnp.asarray(x > 0)
        w = np.asarray(to_f64(where2(c, da, db)))
        assert np.all(w == np.where(x > 0, xp, yp))

    def test_lt2_breaks_hi_ties_on_lo(self):
        hi = jnp.asarray(np.float32(1.0))
        a = DF(hi, jnp.asarray(np.float32(-1e-12)))
        b = DF(hi, jnp.asarray(np.float32(1e-12)))
        assert bool(lt2(a, b)) and not bool(lt2(b, a))


class TestAccumulationChains:
    """The kernel's failure mode is drift over ~512 dependent steps —
    model it directly: Horner chains and dot-product accumulations."""

    def test_affine_chain_matches_f64(self):
        # y <- a*y + b, 512 dependent steps (the Thomas/march shape)
        rng = np.random.default_rng(11)
        n = 2048
        a = rng.uniform(0.3, 0.9, (512, n))
        b = rng.standard_normal((512, n))
        y64 = np.zeros(n)
        for k in range(512):
            y64 = a[k] * y64 + b[k]

        def chain(a_all, b_all):
            def body(y, ab):
                ak, bk = ab
                y = add2(mul2(from_f64(ak), y), from_f64(bk))
                return y, None
            y0 = DF(jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32))
            y, _ = jax.lax.scan(body, y0, (a_all, b_all))
            return to_f64(y)

        got = np.asarray(jax.jit(chain)(jnp.asarray(a), jnp.asarray(b)))
        rel = np.abs(got - y64) / np.maximum(np.abs(y64), 1e-30)
        assert rel.max() < 1e-11, rel.max()

    def test_fast_add_chain_stays_within_budget(self):
        # same chain on the sloppy adder: must stay far below the 1e-6
        # rung budget even if it trails the accurate grade
        rng = np.random.default_rng(12)
        n = 2048
        a = rng.uniform(0.3, 0.9, (512, n))
        b = rng.standard_normal((512, n))
        y64 = np.zeros(n)
        for k in range(512):
            y64 = a[k] * y64 + b[k]

        def chain(a_all, b_all):
            def body(y, ab):
                ak, bk = ab
                y = add2_fast(mul2(from_f64(ak), y), from_f64(bk))
                return y, None
            y0 = DF(jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32))
            y, _ = jax.lax.scan(body, y0, (a_all, b_all))
            return to_f64(y)

        got = np.asarray(jax.jit(chain)(jnp.asarray(a), jnp.asarray(b)))
        rel = np.abs(got - y64) / np.maximum(np.abs(y64), 1e-30)
        assert rel.max() < 1e-9, rel.max()
