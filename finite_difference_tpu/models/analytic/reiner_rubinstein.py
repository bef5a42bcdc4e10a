"""Reiner–Rubinstein (1991) continuous single-barrier engine (pure jnp).

Capability parity with the reference's ``BarrierEngine``
(barrier_engine.py:17-193): the full A–F factor decomposition with phi/eta
sign conventions, selectable rebate timing (IN: expiry|hit, OUT: hit|expiry),
and ``barrier_status='crossed'`` conditioning. All inputs broadcast
elementwise, so a scenario table prices in one call.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ...ops.special import norm_cdf as N


class BarrierFactors(NamedTuple):
    A: jnp.ndarray
    B: jnp.ndarray
    C: jnp.ndarray
    D: jnp.ndarray
    E: jnp.ndarray
    F: jnp.ndarray


def barrier_factors(s, x, h, k, t, r, b, sigma, phi, eta) -> BarrierFactors:
    """The six Reiner–Rubinstein factors (barrier_engine.py:79-135).

    phi: +1 call / -1 put; eta: +1 down / -1 up; k = rebate amount.
    """
    sqrt_t = jnp.sqrt(t)
    sig_rt = sigma * sqrt_t
    ebmt = jnp.exp((b - r) * t)
    ert = jnp.exp(-r * t)

    mu = (b - 0.5 * sigma * sigma) / (sigma * sigma)
    lam = jnp.sqrt(mu * mu + 2.0 * r / (sigma * sigma))

    x1 = jnp.log(s / x) / sig_rt + (1.0 + mu) * sig_rt
    x2 = jnp.log(s / h) / sig_rt + (1.0 + mu) * sig_rt
    y1 = jnp.log(h * h / (s * x)) / sig_rt + (1.0 + mu) * sig_rt
    y2 = jnp.log(h / s) / sig_rt + (1.0 + mu) * sig_rt
    z = jnp.log(h / s) / sig_rt + lam * sig_rt

    hs_2mu1 = (h / s) ** (2.0 * (mu + 1.0))
    hs_2mu = (h / s) ** (2.0 * mu)
    hs_mlp = (h / s) ** (mu + lam)
    hs_mlm = (h / s) ** (mu - lam)

    A = phi * s * ebmt * N(phi * x1) - phi * x * ert * N(phi * (x1 - sig_rt))
    B = phi * s * ebmt * N(phi * x2) - phi * x * ert * N(phi * (x2 - sig_rt))
    C = phi * s * ebmt * hs_2mu1 * N(eta * y1) - phi * x * ert * hs_2mu * N(
        eta * (y1 - sig_rt)
    )
    D = phi * s * ebmt * hs_2mu1 * N(eta * y2) - phi * x * ert * hs_2mu * N(
        eta * (y2 - sig_rt)
    )
    E = k * ert * (N(eta * (x2 - sig_rt)) - hs_2mu * N(eta * (y2 - sig_rt)))
    F = k * (hs_mlp * N(eta * z) + hs_mlm * N(eta * (z - 2.0 * lam * sig_rt)))
    return BarrierFactors(A, B, C, D, E, F)


def barrier_price(
    s,
    x,
    h,
    t,
    r,
    b,
    sigma,
    is_call,
    is_up,
    is_in,
    rebate=0.0,
    rebate_timing_in: str = "expiry",
    rebate_timing_out: str = "hit",
    crossed=False,
):
    """Continuous-barrier price with the reference's piecewise A–F table
    (barrier_engine.py:146-186) and crossed-state conditioning (:140-147).

    ``is_call/is_up/is_in/crossed`` are boolean arrays (broadcastable);
    the rebate timing strings are static.
    """
    s, x, h, t, r, b, sigma = jnp.broadcast_arrays(
        *map(jnp.asarray, (s, x, h, t, r, b, sigma))
    )
    is_call = jnp.asarray(is_call)
    phi = jnp.where(is_call, 1.0, -1.0)
    eta = jnp.where(is_up, -1.0, 1.0)
    k = jnp.asarray(rebate)
    f = barrier_factors(s, x, h, k, t, r, b, sigma, phi, eta)
    A, B, C, D, E, F = f

    ert = jnp.exp(-r * t)
    rebate_in = E if rebate_timing_in == "expiry" else F
    rebate_out = F if rebate_timing_out == "hit" else (k * ert - E)

    x_gt_h = (x - h) > 1e-14

    # piecewise base values (call/put x up/down x in/out x strike-side)
    dic = jnp.where(x_gt_h, C, A - B + D)
    doc = jnp.where(x_gt_h, A - C, B - D)
    uic = jnp.where(x_gt_h, A, B - C + D)
    uoc = jnp.where(x_gt_h, jnp.zeros_like(A), A - B + C - D)
    dip = jnp.where(x_gt_h, B - C + D, A)
    dop = jnp.where(x_gt_h, A - B + C - D, jnp.zeros_like(A))
    uip = jnp.where(x_gt_h, A - B + D, C)
    uop = jnp.where(x_gt_h, B - D, A - C)

    base_in = jnp.where(is_call, jnp.where(is_up, uic, dic), jnp.where(is_up, uip, dip))
    base_out = jnp.where(is_call, jnp.where(is_up, uoc, doc), jnp.where(is_up, uop, dop))

    price = jnp.where(is_in, base_in + rebate_in, base_out + rebate_out)

    # crossed conditioning: IN -> vanilla; OUT -> rebate now/at expiry
    crossed_out = k if rebate_timing_out == "hit" else k * ert
    price_crossed = jnp.where(is_in, A, crossed_out)
    return jnp.where(crossed, price_crossed, price)


class BarrierEngine:
    """Scalar wrapper matching the reference class API (barrier_engine.py:17)."""

    def __init__(
        self,
        s: float,
        b: float,
        r: float,
        t: float,
        x: float,
        sigma: float,
        h: float,
        optionflag: str,
        directionflag: str,
        in_out_flag: str,
        k: float,
        barrier_status: Optional[str] = None,
        rebate_timing_in: Optional[str] = None,
        rebate_timing_out: Optional[str] = None,
    ) -> None:
        if sigma <= 0 or t <= 0:
            raise ValueError("sigma and t must be positive.")
        for flag, opts in ((optionflag, "cp"), (directionflag, "ud"), (in_out_flag, "io")):
            if flag.lower() not in opts:
                raise ValueError(f"invalid flag {flag!r}")
        if barrier_status not in (None, "crossed", "not_crossed"):
            raise ValueError("barrier_status must be None, 'crossed', or 'not_crossed'.")

        def _timing(v, default):
            if v is None:
                return default
            v = v.strip().lower()
            if v in ("hit", "pay at hit", "at hit"):
                return "hit"
            if v in ("expiry", "exp", "maturity", "pay at expiry", "at expiry"):
                return "expiry"
            raise ValueError("rebate timing must be 'hit' or 'expiry'")

        is_call = optionflag.lower() == "c"
        is_up = directionflag.lower() == "u"
        is_in = in_out_flag.lower() == "i"
        crossed = barrier_status == "crossed"

        self.phi = 1 if is_call else -1
        self.eta = -1 if is_up else 1
        fac = barrier_factors(
            jnp.float64(s), jnp.float64(x), jnp.float64(h), jnp.float64(k),
            jnp.float64(t), jnp.float64(r), jnp.float64(b), jnp.float64(sigma),
            float(self.phi), float(self.eta),
        )
        self.factors = {n: float(v) for n, v in zip("ABCDEF", fac)}
        self.price_value = float(
            barrier_price(
                s, x, h, t, r, b, sigma, is_call, is_up, is_in,
                rebate=k,
                rebate_timing_in=_timing(rebate_timing_in, "expiry"),
                rebate_timing_out=_timing(rebate_timing_out, "hit"),
                crossed=crossed,
            )
        )
        self.vanilla_value = self.factors["A"]

    def get_factors(self):
        return self.factors

    def price(self) -> float:
        return self.price_value

    def vanilla(self) -> float:
        return self.vanilla_value
