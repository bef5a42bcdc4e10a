import numpy as np
import pytest
import jax.numpy as jnp

from finite_difference_tpu.ops import (
    thomas_solve,
    thomas_solve_const,
    thomas_solve_pscan,
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


class TestThomasPscan:
    """The log-depth homography-scan general solve (dividend-jump spline
    hot path) must match the sequential Thomas on every system family it
    serves."""

    @pytest.mark.parametrize("n", [3, 8, 64, 513, 1024])
    def test_matches_sequential(self, n):
        rng = np.random.default_rng(4)
        dl, d, du, rhs = _random_dd_system(rng, 6, n)
        x_p = np.asarray(thomas_solve_pscan(dl, d, du, rhs))
        x_s = np.asarray(thomas_solve(dl, d, du, rhs))
        np.testing.assert_allclose(x_p, x_s, rtol=1e-10, atol=1e-12)

    def test_spline_system_shape(self):
        """The exact system natural_cubic_spline builds: h-weighted SPD
        tridiagonal from a non-uniform (exp-of-uniform) grid."""
        rng = np.random.default_rng(5)
        B, n = 4, 257
        x = np.exp(np.cumsum(rng.uniform(0.005, 0.02, (B, n)), axis=1))
        y = rng.standard_normal((B, n))
        h = np.diff(x, axis=1)
        dl = h[:, :-1]
        du = h[:, 1:]
        dm = 2.0 * (h[:, :-1] + h[:, 1:])
        dy = np.diff(y, axis=1)
        alpha = 3.0 * (dy[:, 1:] / h[:, 1:] - dy[:, :-1] / h[:, :-1])
        x_p = np.asarray(thomas_solve_pscan(dl, dm, du, alpha))
        x_s = np.asarray(thomas_solve(dl, dm, du, alpha))
        np.testing.assert_allclose(x_p, x_s, rtol=1e-9, atol=1e-12)

    def test_ignored_corners_are_inert(self):
        """dl[..., 0] / du[..., -1] must not change the answer even when
        set to huge values (the contract shared with thomas_solve)."""
        rng = np.random.default_rng(6)
        dl, d, du, rhs = _random_dd_system(rng, 2, 32)
        base = np.asarray(thomas_solve_pscan(dl, d, du, rhs))
        dl2 = dl.copy()
        du2 = du.copy()
        dl2[:, 0] = 1e30
        du2[:, -1] = -1e30
        poisoned = np.asarray(thomas_solve_pscan(dl2, d, du2, rhs))
        np.testing.assert_allclose(poisoned, base, rtol=0, atol=0)
