"""Interpolation primitives (pure jnp, vmappable).

- ``linear_interp``: clamped linear interpolation (the reference's
  ``_interp_price`` bisection, discrete_barrier_fdm_pricer.py:629-646, is a
  scalar binary search; here it's ``jnp.interp`` semantics over batches).
- ``natural_cubic_spline``: natural cubic spline coefficients + evaluation,
  used for the dividend-jump mapping V(t-, S) = V(t+, S - D)
  (fd_american_equity.py:479-558, 732-776). The spline's second-derivative
  system is tridiagonal and solved with the batched Thomas kernel.

All functions operate along the LAST axis; batching is by leading axes on
every array (same shape rules everywhere).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .tridiag import thomas_solve_pscan


def linear_interp(xq, x, y):
    """Piecewise-linear interp of y(x) at xq, clamped to end values (1-D)."""
    return jnp.interp(xq, x, y)


class SplineCoeffs(NamedTuple):
    x: jnp.ndarray  # (..., n) knots
    y: jnp.ndarray  # (..., n) values at knots
    b: jnp.ndarray  # (..., n-1) slope coefficients
    c: jnp.ndarray  # (..., n-1) curvature coefficients
    d: jnp.ndarray  # (..., n-1) cubic coefficients


def natural_cubic_spline(x, y) -> SplineCoeffs:
    """Natural cubic spline through (x_i, y_i) along the last axis.

    Same tridiagonal construction the reference hand-rolls
    (fd_american_equity.py:479-558), with natural boundary conditions
    c_0 = c_{n-1} = 0; solved with the log-depth homography-scan Thomas
    kernel (``thomas_solve_pscan``) — the spline rides inside dividend
    jumps on the TPU hot path, where a sequential n-step scan would cost
    more than the whole time-march.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    h = jnp.diff(x, axis=-1)  # (..., n-1)
    dy = jnp.diff(y, axis=-1)
    alpha = 3.0 * (dy[..., 1:] / h[..., 1:] - dy[..., :-1] / h[..., :-1])

    # Interior system: h[i-1] c[i-1] + 2(h[i-1]+h[i]) c[i] + h[i] c[i+1] = alpha
    dl = h[..., :-1]
    du = h[..., 1:]
    dm = 2.0 * (h[..., :-1] + h[..., 1:])
    c_int = thomas_solve_pscan(dl, dm, du, alpha)
    zeros = jnp.zeros_like(x[..., :1])
    c_full = jnp.concatenate([zeros, c_int, zeros], axis=-1)  # (..., n)

    b = dy / h - h * (c_full[..., 1:] + 2.0 * c_full[..., :-1]) / 3.0
    d = (c_full[..., 1:] - c_full[..., :-1]) / (3.0 * h)
    return SplineCoeffs(x=x, y=y, b=b, c=c_full[..., :-1], d=d)


def cubic_spline_eval(coeffs: SplineCoeffs, xq, idx=None):
    """Evaluate the spline at ``xq``. 1-D knots (use ``jax.vmap`` to batch);
    ``xq`` any shape. Outside the knot span the value clamps to the end
    knot values (reference dividend-jump behavior,
    fd_american_equity.py:752-758).

    ``idx``: optional precomputed interval indices (same shape as ``xq``)
    for structured grids where the bracketing interval has a closed form
    — e.g. log-uniform PDE grids, ``floor((log(xq) - x_min) / dx)``.
    Skips the ``searchsorted``, which dominates the dividend-jump cost on
    TPU. An off-by-one at an exact knot is harmless (the spline is C^2,
    so adjacent-interval polynomials agree there to rounding); indices
    are clipped to the valid range.
    """
    x, y = coeffs.x, coeffs.y
    if x.ndim != 1:
        raise ValueError("cubic_spline_eval expects 1-D knots; vmap to batch.")
    n = x.shape[-1]
    xq = jnp.asarray(xq)
    if idx is None:
        idx = jnp.searchsorted(x, xq, side="right") - 1
    idx = jnp.clip(idx, 0, n - 2)

    # one gather of the packed rows instead of five independent gathers
    packed = jnp.stack([x[:-1], y[:-1], coeffs.b, coeffs.c, coeffs.d])
    xg, yg, bg, cg, dg = packed[:, idx]
    z = xq - xg
    val = yg + z * (bg + z * (cg + z * dg))
    val = jnp.where(xq <= x[0], y[0], val)
    val = jnp.where(xq >= x[-1], y[-1], val)
    return val
