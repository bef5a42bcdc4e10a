import numpy as np
import pytest
import jax.numpy as jnp

from finite_difference_tpu.ops import (
    thomas_solve,
    thomas_solve_const,
    tridiag_matvec,
)


def _random_dd_system(rng, batch, n):
    """Random diagonally-dominant tridiagonal systems."""
    dl = rng.uniform(-1.0, 1.0, (batch, n))
    du = rng.uniform(-1.0, 1.0, (batch, n))
    d = np.abs(dl) + np.abs(du) + rng.uniform(1.0, 2.0, (batch, n))
    rhs = rng.standard_normal((batch, n))
    return dl, d, du, rhs


class TestThomasGeneral:
    def test_vs_numpy(self):
        rng = np.random.default_rng(0)
        dl, d, du, rhs = _random_dd_system(rng, 4, 64)
        x = np.asarray(thomas_solve(dl, d, du, rhs))
        for b in range(4):
            T = np.diag(d[b]) + np.diag(dl[b][1:], -1) + np.diag(du[b][:-1], 1)
            expected = np.linalg.solve(T, rhs[b])
            np.testing.assert_allclose(x[b], expected, rtol=1e-10)

    def test_matvec_roundtrip(self):
        rng = np.random.default_rng(1)
        dl, d, du, rhs = _random_dd_system(rng, 2, 128)
        x = thomas_solve(dl, d, du, rhs)
        back = np.asarray(tridiag_matvec(jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du), x))
        np.testing.assert_allclose(back, rhs, rtol=1e-9, atol=1e-12)


class TestThomasConst:
    @pytest.mark.parametrize("n", [8, 64, 513, 1024])
    def test_matches_general(self, n):
        rng = np.random.default_rng(2)
        batch = 8
        # CN-like coefficients: a_c ~ 1 + positive, |a_l|,|a_u| < a_c/2
        a_l = rng.uniform(-0.45, -0.05, batch)
        a_u = rng.uniform(-0.45, -0.05, batch)
        a_c = 1.0 + np.abs(a_l) + np.abs(a_u) + rng.uniform(0.0, 0.3, batch)
        rhs = rng.standard_normal((batch, n))

        x_const = np.asarray(thomas_solve_const(a_l, a_c, a_u, rhs))
        dl = np.broadcast_to(a_l[:, None], (batch, n))
        d = np.broadcast_to(a_c[:, None], (batch, n))
        du = np.broadcast_to(a_u[:, None], (batch, n))
        x_gen = np.asarray(thomas_solve(dl, d, du, rhs))
        np.testing.assert_allclose(x_const, x_gen, rtol=1e-9, atol=1e-12)

    def test_advection_dominated_sign(self):
        # a_l * a_u < 0 (negative rho branch: signed powers must not NaN)
        rng = np.random.default_rng(3)
        n, batch = 256, 4
        a_l = rng.uniform(0.05, 0.2, batch)
        a_u = rng.uniform(-0.4, -0.1, batch)
        a_c = 1.0 + np.abs(a_l) + np.abs(a_u)
        rhs = rng.standard_normal((batch, n))
        x_const = np.asarray(thomas_solve_const(a_l, a_c, a_u, rhs))
        assert np.isfinite(x_const).all()
        dl = np.broadcast_to(a_l[:, None], (batch, n))
        d = np.broadcast_to(a_c[:, None], (batch, n))
        du = np.broadcast_to(a_u[:, None], (batch, n))
        x_gen = np.asarray(thomas_solve(dl, d, du, rhs))
        np.testing.assert_allclose(x_const, x_gen, rtol=1e-9, atol=1e-12)

    def test_scalar_broadcast(self):
        rhs = np.ones((16,))
        x = np.asarray(thomas_solve_const(-0.2, 1.5, -0.2, rhs))
        T = np.diag(np.full(16, 1.5)) + np.diag(np.full(15, -0.2), -1) + np.diag(
            np.full(15, -0.2), 1
        )
        np.testing.assert_allclose(x, np.linalg.solve(T, np.ones(16)), rtol=1e-10)
