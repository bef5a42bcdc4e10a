"""Delta/gamma stencils on FD value grids (pure jnp, vmappable).

The reference computes "model delta/gamma" several ways; all are
reproduced here as array ops:

- ``nonuniform_central``: 3-point non-uniform central stencil
  (discrete_barrier_fdm_pricer.py:905-960, the live production path).
- ``nonuniform_forward`` / ``nonuniform_backward``: one-sided 3-point
  stencils pointing away from a barrier (the barrier-aware variant,
  discrete_barrier_fdm_pricer.py:549-612 and the archived
  _delta_gamma_from_grid).
- ``local_cubic_fit``: 4-point local cubic polynomial fit around spot
  (fd_american_equity.py:876-911).

Gamma is clamped to +/-1e5 in barrier-aware mode, as in the reference
(discrete_barrier_fdm_pricer.py:610).
"""
from __future__ import annotations

import jax.numpy as jnp

GAMMA_CLAMP = 1e5


def nearest_index(s_nodes, s0, lo: int = 0, hi_offset: int = 0):
    """Index of the node closest to s0 within [lo, n-1-hi_offset]."""
    n = s_nodes.shape[-1]
    idx = jnp.argmin(jnp.abs(s_nodes - s0), axis=-1)
    return jnp.clip(idx, lo, n - 1 - hi_offset)


def _gather3(arr, idx):
    return arr[idx - 1], arr[idx], arr[idx + 1]


def nonuniform_central(s, v, idx):
    """3-point non-uniform central delta/gamma at node ``idx`` (interior)."""
    s_m, s_0, s_p = _gather3(s, idx)
    v_m, v_0, v_p = _gather3(v, idx)
    h1 = s_0 - s_m
    h2 = s_p - s_0
    delta = (
        -h2 / (h1 * (h1 + h2)) * v_m
        + (h2 - h1) / (h1 * h2) * v_0
        + h1 / (h2 * (h1 + h2)) * v_p
    )
    gamma = 2.0 * (
        v_m / (h1 * (h1 + h2)) - v_0 / (h1 * h2) + v_p / (h2 * (h1 + h2))
    )
    return delta, gamma


def nonuniform_forward(s, v, idx):
    """One-sided forward stencil using nodes idx, idx+1, idx+2 (away from a
    lower barrier)."""
    s0, s1, s2 = s[idx], s[idx + 1], s[idx + 2]
    v0, v1, v2 = v[idx], v[idx + 1], v[idx + 2]
    h1 = s1 - s0
    h2 = s2 - s1
    a0 = (-2.0 * h1 - h2) / (h1 * h1 + h1 * h2)
    a1 = (h1 + h2) / (h1 * h2)
    a2 = -h1 / (h1 * h2 + h2 * h2)
    b0 = 2.0 / (h1 * h1 + h1 * h2)
    b1 = -2.0 / (h1 * h2)
    b2 = 2.0 / (h1 * h2 + h2 * h2)
    return a0 * v0 + a1 * v1 + a2 * v2, b0 * v0 + b1 * v1 + b2 * v2


def nonuniform_backward(s, v, idx):
    """One-sided backward stencil using nodes idx, idx-1, idx-2 (away from
    an upper barrier)."""
    s0, s1, s2 = s[idx], s[idx - 1], s[idx - 2]
    v0, v1, v2 = v[idx], v[idx - 1], v[idx - 2]
    h1 = s0 - s1
    h2 = s1 - s2
    c0 = (2.0 * h1 + h2) / (h1 * h1 + h1 * h2)
    c1 = -(h1 + h2) / (h1 * h2)
    c2 = h1 / (h1 * h2 + h2 * h2)
    d0 = 2.0 / (h1 * h1 + h1 * h2)
    d1 = -2.0 / (h1 * h2)
    d2 = 2.0 / (h1 * h2 + h2 * h2)
    return c0 * v0 + c1 * v1 + c2 * v2, d0 * v0 + d1 * v1 + d2 * v2


def local_cubic_fit(s, v, s0, idx):
    """4-point local cubic fit around ``idx``; returns (delta, gamma) at s0.

    Solves the 4x4 Vandermonde in (s - s0) powers, exactly like
    fd_american_equity.py:876-911 (idx is pre-clamped to [1, n-3]).
    """
    cols = jnp.stack([s[idx - 1], s[idx], s[idx + 1], s[idx + 2]]) - s0
    y = jnp.stack([v[idx - 1], v[idx], v[idx + 1], v[idx + 2]])
    design = jnp.stack([cols**3, cols**2, cols, jnp.ones_like(cols)], axis=-1)
    coef = jnp.linalg.solve(design, y)
    delta = coef[2]
    gamma = 2.0 * coef[1]
    return delta, gamma


def barrier_aware_delta_gamma(
    s,
    v,
    s0,
    lower_barrier=None,
    upper_barrier=None,
    band_nodes: int = 2,
    one_sided: bool = True,
):
    """Delta/gamma at s0 with optional one-sided stencils near a KO barrier.

    Central stencil by default; within ``band_nodes`` grid nodes of a
    barrier (and ``one_sided``), switch to the stencil pointing away from
    the barrier and clamp gamma to +/-1e5
    (discrete_barrier_fdm_pricer.py:549-612).
    """
    n = s.shape[-1]
    idx = nearest_index(s, s0, lo=1, hi_offset=1)
    delta_c, gamma_c = nonuniform_central(s, v, idx)
    if not one_sided or (lower_barrier is None and upper_barrier is None):
        return delta_c, gamma_c

    # Distance (in index space) to the nearest barrier node
    use_lower = lower_barrier is not None
    h_level = lower_barrier if use_lower else upper_barrier
    j = jnp.clip(nearest_index(s, h_level), 0, n - 2)
    near = jnp.abs(idx - j) <= band_nodes

    if use_lower:
        i2 = jnp.clip(j + 1, 2, n - 3)
        delta_1, gamma_1 = nonuniform_forward(s, v, i2)
    else:
        i2 = jnp.clip(j, 2, n - 3)
        delta_1, gamma_1 = nonuniform_backward(s, v, i2)
    gamma_1 = jnp.clip(gamma_1, -GAMMA_CLAMP, GAMMA_CLAMP)

    delta = jnp.where(near, delta_1, delta_c)
    gamma = jnp.where(near, gamma_1, gamma_c)
    return delta, gamma
