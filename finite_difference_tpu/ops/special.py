"""Special functions used across the analytic layer (pure jnp, vmappable).

Replaces the reference's scipy.stats.norm / torch.erfinv usage
(barrier_engine.py, rng.py:7) with JAX-native equivalents so every analytic
pricer is jit/vmap/grad-able on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SQRT2 = 1.4142135623730951
_INV_SQRT_2PI = 0.3989422804014327


def norm_pdf(x):
    return _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)


def norm_cdf(x):
    """Standard normal CDF to full double precision (Hart 1968 rationals,
    as popularized by West, "Better approximations to cumulative normal
    functions"). JAX's own erf/ndtr are only ~1e-8/3e-10 accurate on CPU,
    which is too coarse for the f64 pricing oracle this library tests
    against; this implementation is ~1e-15.
    """
    x = jnp.asarray(x)
    xa = jnp.abs(x)
    e = jnp.exp(-0.5 * xa * xa)

    # Central branch: |x| < 7.07106781186547
    num = 3.52624965998911e-2 * xa + 0.700383064443688
    num = num * xa + 6.37396220353165
    num = num * xa + 33.912866078383
    num = num * xa + 112.079291497871
    num = num * xa + 221.213596169931
    num = num * xa + 220.206867912376
    den = 8.83883476483184e-2 * xa + 1.75566716318264
    den = den * xa + 16.064177579207
    den = den * xa + 86.7807322029461
    den = den * xa + 296.564248779674
    den = den * xa + 637.333633378831
    den = den * xa + 793.826512519948
    den = den * xa + 440.413735824752
    central = e * num / den

    # Tail branch: continued fraction
    build = xa + 0.65
    build = xa + 4.0 / build
    build = xa + 3.0 / build
    build = xa + 2.0 / build
    build = xa + 1.0 / build
    tail = e / (build * 2.506628274631000502)

    cum = jnp.where(xa < 7.07106781186547, central, tail)
    cum = jnp.where(xa > 37.0, 0.0, cum)
    return jnp.where(x > 0.0, 1.0 - cum, cum)


def norm_icdf(u):
    """Inverse standard-normal CDF via erfinv (reference rng.py:7)."""
    return _SQRT2 * jax.lax.erf_inv(2.0 * u - 1.0)


def bivariate_norm_cdf(a, b, rho, n_points: int = 128):
    """P(X <= a, Y <= b) for standard bivariate normal with correlation rho.

    Gauss–Legendre integration of Drezner–Wesolowsky's single-integral form:

        Phi2(a, b, rho) = Phi(a) Phi(b)
            + (1 / 2 pi) * ∫_0^rho exp(-(a^2 - 2 r a b + b^2) / (2 (1 - r^2)))
                           / sqrt(1 - r^2) dr

    Fixed-shape quadrature (no adaptive control flow) so it jits and vmaps —
    the reference instead used an adaptive-Simpson bivariate normal
    (bjerk_stens_new.py:450), which is host-only by construction.
    """
    a = jnp.asarray(a)
    dtype = a.dtype
    nodes, weights = _gauss_legendre(n_points, dtype)
    # map nodes from [-1, 1] to [0, rho]
    r = 0.5 * rho * (nodes + 1.0)
    w = 0.5 * rho * weights
    rr = 1.0 - r * r
    integrand = jnp.exp(-(a * a - 2.0 * r * a * b + b * b) / (2.0 * rr)) / jnp.sqrt(rr)
    corr = jnp.sum(w * integrand, axis=-1) / (2.0 * jnp.pi)
    return norm_cdf(a) * norm_cdf(b) + corr


def _gauss_legendre(n: int, dtype):
    import numpy as np

    x, w = np.polynomial.legendre.leggauss(n)
    return jnp.asarray(x, dtype=dtype), jnp.asarray(w, dtype=dtype)
