"""Double-float (df64) arithmetic on f32 pairs for TPU pallas kernels.

A df64 value is the UNEVALUATED SUM of two f32s ``(hi, lo)`` with
``|lo| <= ulp(hi)/2``, giving ~2^-49 relative precision on hardware with
no native f64 — the TPU VPU. Mosaic rejects f64 outright, and XLA's own
x64 emulation is only available OUTSIDE pallas; this module is what lets
the fused SPIKE kernel (models/pde/pallas_kernel.py) run the <=1e-6
accuracy rung of the north-star workload on-chip instead of falling back
to the ~3x slower XLA scan.

All algorithms are the classical error-free transformations (Dekker 1971,
Knuth TAOCP v2, Hida/Li/Bailey QD): they require ONLY correctly-rounded
(round-to-nearest) f32 ``+ - *`` and no FMA. The TPU VPU satisfies this —
verified on-chip bit-for-bit against host IEEE chains in
tests/test_df64.py::TestVpuRounding (sum/product/Dekker-split/TwoProd all
exact on 8k random exponent-spread lanes).

Two precision grades are provided for the pair-pair ops:

- ``add2``/``mul2`` — the accurate grades (20 / 24 flops): relative error
  ~2^-49 regardless of cancellation.
- ``add2_fast`` — Dekker's "sloppy" add (11 flops): error bounded
  relative to the INPUTS, not the result, so catastrophic cancellation
  can surface input-scale noise. The CN time-march is dominated by
  well-conditioned accumulations (v + O(dt)·Lv), so the fast grade is
  offered as a measured option; the kernel pins its accuracy vs the
  accurate grade in tests before it is allowed on the rung.

No division or transcendentals are provided on purpose: the SPIKE
kernel's schedule precomputes every reciprocal (1/dt) and exponential
(boundary/discount terms) OUTSIDE the kernel in XLA x64, where true f64
is available (pallas_kernel._spike_df64_* plumbing). Values here are
jax tracers; everything is branch-free and vectorizes over any shape.

Overflow note: ``_split`` multiplies by 2^12+1, so |x| must stay below
~2^115 (f32 max / 2^12). Option-pricing magnitudes (<=1e8) are ~26
orders of magnitude inside the bound.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_SPLITTER = 4097.0  # 2^12 + 1 (f32: 24-bit mantissa splits at 12)


class DF(NamedTuple):
    """A double-float value: hi + lo, |lo| <= ulp(hi)/2. Pytree-compatible.

    Operator sugar covers the accurate grades; the kernel's hot loops call
    the explicit functions so the chosen grade is visible at the callsite.
    """

    hi: jnp.ndarray
    lo: jnp.ndarray

    def __add__(self, other):
        return add2(self, other)

    def __sub__(self, other):
        return sub2(self, other)

    def __mul__(self, other):
        return mul2(self, other)

    def __neg__(self):
        return DF(-self.hi, -self.lo)


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s = fl(a+b), s + e == a + b."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def quick_two_sum(a, b):
    """Error-free sum REQUIRING |a| >= |b| (or a == 0): 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split: a == hi + lo with 12-bit-mantissa halves."""
    c = a * _SPLITTER
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: (p, e) with p = fl(a*b), p + e == a*b."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def from_f64(x) -> DF:
    """Split an f64 array into a df64 pair (requires x64 enabled)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def to_f64(a: DF):
    """Recombine to f64 (requires x64 enabled)."""
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


def from_f32(x) -> DF:
    """Lift an exact f32 array into df64."""
    return DF(x, jnp.zeros_like(x))


def add2(a: DF, b: DF) -> DF:
    """Accurate df64 + df64 (QD ieee_add): ~2^-49 relative error."""
    s1, s2 = two_sum(a.hi, b.hi)
    t1, t2 = two_sum(a.lo, b.lo)
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return DF(*quick_two_sum(s1, s2))


def add2_fast(a: DF, b: DF) -> DF:
    """Dekker sloppy add (11 flops): error relative to inputs — see
    module docstring before using in a new context."""
    s, e = two_sum(a.hi, b.hi)
    e = e + (a.lo + b.lo)
    return DF(*quick_two_sum(s, e))


def sub2(a: DF, b: DF) -> DF:
    return add2(a, DF(-b.hi, -b.lo))


def mul2(a: DF, b: DF) -> DF:
    """df64 * df64 (QD mul): drops only the lo*lo term (~2^-49)."""
    p1, p2 = two_prod(a.hi, b.hi)
    p2 = p2 + (a.hi * b.lo + a.lo * b.hi)
    return DF(*quick_two_sum(p1, p2))


def mul2_f32(a: DF, b) -> DF:
    """df64 * exact-f32 (QD mul_d): cheaper than lifting b to df64."""
    p1, p2 = two_prod(a.hi, b)
    p2 = p2 + a.lo * b
    return DF(*quick_two_sum(p1, p2))


def where2(cond, a: DF, b: DF) -> DF:
    return DF(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def lt2(a: DF, b: DF):
    """a < b for normalized pairs (hi decides; lo breaks hi ties)."""
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def max2(a: DF, b: DF) -> DF:
    return where2(lt2(a, b), b, a)


def zeros_like2(a: DF) -> DF:
    return DF(jnp.zeros_like(a.hi), jnp.zeros_like(a.lo))
