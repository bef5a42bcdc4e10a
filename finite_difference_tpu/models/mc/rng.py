"""Random-number generation for the MC layer.

Two generators, mirroring the reference's split (rng.py:16-44) but
TPU-native:

- ``threefry_normals``: the production path — JAX's counter-based threefry
  PRNG, fully on-device, reproducible across shardings (each path derives
  its own counter, so results are independent of batch/chip layout).
- ``SobolNormalRng``: scrambled Sobol -> U(0,1) -> N(0,1) via
  sqrt(2)*erfinv(2u-1) with the RiskFlow epsilon-shift away from {0,1} and
  ``fast_forward`` stream resumption. Host-side generation through
  scipy.stats.qmc by default; ``backend="torch"`` reproduces RiskFlow's
  torch.quasirandom.SobolEngine sequences bit-for-bit for parity tests.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.special import norm_icdf


def threefry_normals(key, shape, dtype=jnp.float64):
    """Counter-based standard normals (device-native)."""
    return jax.random.normal(key, shape, dtype=dtype)


@dataclass
class SobolNormalRng:
    """Scrambled Sobol -> N(0,1); returns (dimension, n) like the reference."""

    seed: int
    fast_forward: int = 0
    backend: str = "scipy"  # "scipy" | "torch" (RiskFlow parity)
    dtype: type = np.float64

    def draw_uniforms(self, dimension: int, n: int) -> np.ndarray:
        if self.backend == "torch":
            import torch

            engine = torch.quasirandom.SobolEngine(
                dimension=dimension, scramble=True, seed=self.seed
            )
            if self.fast_forward > 0:
                engine.fast_forward(self.fast_forward)
            return engine.draw(n, dtype=torch.float64).numpy().astype(self.dtype)
        from scipy.stats import qmc

        engine = qmc.Sobol(d=dimension, scramble=True, seed=self.seed)
        if self.fast_forward > 0:
            engine.fast_forward(self.fast_forward)
        return engine.random(n).astype(self.dtype)

    def draw_normals(self, dimension: int, n: int) -> np.ndarray:
        """(dimension, n) standard normals (rng.py:26-44)."""
        sobol = self.draw_uniforms(dimension, n)  # (n, dimension)
        eps = np.finfo(self.dtype).eps
        u = 0.5 + (1.0 - eps) * (sobol - 0.5)
        z = np.asarray(norm_icdf(jnp.asarray(u)))
        return np.ascontiguousarray(z.T)


def _bit_reverse_u32(x: "jnp.ndarray") -> "jnp.ndarray":
    """Bitwise reversal of uint32 (5 masked swaps)."""
    x = ((x >> 1) & jnp.uint32(0x55555555)) | ((x & jnp.uint32(0x55555555)) << 1)
    x = ((x >> 2) & jnp.uint32(0x33333333)) | ((x & jnp.uint32(0x33333333)) << 2)
    x = ((x >> 4) & jnp.uint32(0x0F0F0F0F)) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & jnp.uint32(0x00FF00FF)) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def sobol1d_uniforms(n: int, fast_forward: int = 0) -> "jnp.ndarray":
    """Device-native dimension-1 Sobol (= van der Corput base 2) points.

    The reference's QRNG is torch's CPU SobolEngine (rng.py:26-44); this is
    the TPU-resident, jit-able counterpart for the dimension-1 case the XVA
    engine actually uses (engine.py draws (1, n) and reshapes). Unscrambled:
    point i is the radical inverse of the counter, computed as a uint32 bit
    reversal — counter-based like threefry, so ``fast_forward`` is just an
    offset and the stream shards trivially.
    """
    idx = jnp.arange(fast_forward, fast_forward + n, dtype=jnp.uint32)
    gray = idx ^ (idx >> 1)  # standard Sobol (Gray-code) ordering
    return _bit_reverse_u32(gray).astype(jnp.float64) * (0.5 ** 32)


def sobol1d_normals(n: int, fast_forward: int = 0) -> "jnp.ndarray":
    """N(0,1) from :func:`sobol1d_uniforms` with the RiskFlow eps-shift
    away from {0, 1} before the inverse CDF."""
    u = sobol1d_uniforms(n, fast_forward)
    eps = jnp.finfo(jnp.float64).eps
    u = 0.5 + (1.0 - eps) * (u - 0.5)
    from jax.scipy.special import ndtri

    return ndtri(u)


def sobol_direction_matrix(dimension: int) -> np.ndarray:
    """(dimension, n_bits) uint32 Sobol direction integers.

    Seeded from scipy's Joe-Kuo table (a regular dependency of this
    package); falls back to a tiny built-in d=1 table if the private
    attribute moves in a future scipy.
    """
    try:
        from scipy.stats import qmc

        sv = np.asarray(qmc.Sobol(d=dimension, scramble=False)._sv)
        return sv.astype(np.uint32)
    except Exception:
        if dimension != 1:
            raise
        bits = 30
        return (np.uint32(1) << (bits - 1 - np.arange(bits, dtype=np.uint32)))[None, :]


def sobol_uniforms(
    n: int, dimension: int, fast_forward: int = 0
) -> "jnp.ndarray":
    """(n, dimension) device-native unscrambled Sobol points.

    Gray-code construction: point k is the XOR of the direction integers
    selected by the bits of gray(k) — 30 static XOR steps inside jit, all
    device-resident. Matches scipy's ``qmc.Sobol(scramble=False)`` exactly
    (tested); ``fast_forward`` is a counter offset.
    """
    sv = jnp.asarray(sobol_direction_matrix(dimension))  # (d, bits)
    n_bits = sv.shape[1]
    idx = jnp.arange(fast_forward, fast_forward + n, dtype=jnp.uint32)
    gray = idx ^ (idx >> 1)
    acc = jnp.zeros((n, dimension), dtype=jnp.uint32)
    for j in range(n_bits):
        bit = ((gray >> j) & jnp.uint32(1)).astype(jnp.uint32)
        acc = acc ^ (bit[:, None] * sv[None, :, j])
    # scipy scales points by 2^-bits with bits == sv.shape[1] (30 today,
    # but the constructor accepts other widths) — keep the scale tied to
    # the actual matrix width
    return acc.astype(jnp.float64) * (0.5 ** int(n_bits))


def sobol_normals(n: int, dimension: int, fast_forward: int = 0) -> "jnp.ndarray":
    """(n, dimension) N(0,1) via the RiskFlow eps-shift + inverse CDF."""
    u = sobol_uniforms(n, dimension, fast_forward)
    eps = jnp.finfo(jnp.float64).eps
    u = 0.5 + (1.0 - eps) * (u - 0.5)
    from jax.scipy.special import ndtri

    return ndtri(u)
