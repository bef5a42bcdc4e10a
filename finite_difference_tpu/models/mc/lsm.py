"""Longstaff-Schwartz (LSM) American Monte Carlo on device (pure JAX).

The reference has no American MC at all — its American prices come only
from the CN PDE engines (fd_american_equity.py) and the BS93/BS2002
approximations, and its exposure engine documents a precompute hook "for
PDE/LSM/surrogate instruments" without shipping an LSM
(/root/reference/exposure_engine.py:157-164, instrument.py:44-74). This
module supplies that pricer as an INDEPENDENT cross-check of the CN
engine (the test-strategy tier-2 pattern, SURVEY.md §4) and as the
regression-based continuation-value machinery XVA needs for American
trades.

TPU-native shape: one threefry-keyed GBM simulation, then a single
``lax.scan`` backward over exercise dates. The per-step regression of
discounted continuation values on a polynomial basis of the ITM paths is
a tiny (d x d) normal-equations solve whose Gram matrix contracts over
the path axis on the MXU; masks replace data-dependent path selection so
every shape is static. Antithetic pairing halves variance at no extra
draw cost.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _basis(s_norm, degree: int):
    """Polynomial-in-moneyness regressors (n_paths, degree+1)."""
    return jnp.stack([s_norm**i for i in range(degree + 1)], axis=-1)


@partial(
    jax.jit,
    static_argnames=("n_paths", "n_steps", "degree", "antithetic", "is_call"),
)
def _lsm_kernel(
    key, s0, strike, sigma, t, r, q,
    is_call: bool, n_paths: int, n_steps: int, degree: int, antithetic: bool,
):
    dtype = jnp.result_type(
        jnp.asarray(s0).dtype, jnp.asarray(sigma).dtype, jnp.float32
    )
    dt = jnp.asarray(t / n_steps, dtype)
    n_draw = n_paths // 2 if antithetic else n_paths
    z = jax.random.normal(key, (n_steps, n_draw), dtype)
    if antithetic:
        z = jnp.concatenate([z, -z], axis=1)
    drift = (r - q - 0.5 * sigma * sigma) * dt
    vol = sigma * jnp.sqrt(dt)
    log_s = jnp.log(s0) + jnp.cumsum(drift + vol * z, axis=0)
    s = jnp.exp(log_s)  # (n_steps, n_paths): t_1 .. t_n

    def payoff(sv):
        return jnp.where(
            is_call, jnp.maximum(sv - strike, 0.0), jnp.maximum(strike - sv, 0.0)
        )

    disc = jnp.exp(-r * dt)
    cf_T = payoff(s[-1])

    def step(cf_next, s_t):
        """One backward induction step at an interior exercise date."""
        cf_disc = disc * cf_next  # continuation cashflow PV'd to t
        ex = payoff(s_t)
        itm = ex > 0.0
        w = itm.astype(dtype)
        x = _basis(s_t / strike, degree)  # (n_paths, d)
        xw = x * w[:, None]
        gram = xw.T @ x  # (d, d) — MXU contraction over paths
        rhs = xw.T @ cf_disc
        # ridge keeps the solve well-posed when few paths are ITM
        eye = jnp.eye(degree + 1, dtype=dtype)
        beta = jnp.linalg.solve(gram + 1e-8 * eye, rhs)
        cont = x @ beta
        exercise = itm & (ex > cont)
        cf = jnp.where(exercise, ex, cf_disc)
        return cf, None

    # interior dates t_{n-1} .. t_1 (maturity handled by cf_T; no exercise
    # at t_0 — the valuation date — matching the CN engine's convention)
    cf, _ = jax.lax.scan(step, cf_T, s[:-1], reverse=True)
    pv = disc * cf  # discount t_1 -> t_0
    # the holder may also exercise AT the valuation date: floor at payoff(S0)
    price = jnp.maximum(jnp.mean(pv), payoff(jnp.asarray(s0, dtype)))
    if antithetic:
        # mirrored paths are (negatively) correlated — the independent
        # samples are the n_paths/2 PAIR MEANS, so estimate the MC error
        # of the mean from those
        n_half = n_paths // 2
        pair_mean = 0.5 * (pv[:n_half] + pv[n_half:])
        stderr = jnp.std(pair_mean) / jnp.sqrt(jnp.asarray(n_half, dtype))
    else:
        stderr = jnp.std(pv) / jnp.sqrt(jnp.asarray(n_paths, dtype))
    return price, stderr


def price_american_lsm(
    s0, strike, sigma, t, r, q=0.0, is_call: bool = False,
    n_paths: int = 200_000, n_steps: int = 50, degree: int = 3,
    antithetic: bool = True, seed: int = 0, key: Optional[jax.Array] = None,
) -> Tuple[float, float]:
    """American option price by Longstaff-Schwartz regression MC.

    GBM under (r, q) with ``n_steps`` equally spaced exercise dates.
    Returns ``(price, stderr)``. Note the usual LSM caveats: the in-sample
    regression induces a small upward bias at low path counts, and the
    exercise policy is only as rich as the polynomial basis (``degree``).
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    price, stderr = _lsm_kernel(
        key,
        jnp.asarray(float(s0)), jnp.asarray(float(strike)),
        jnp.asarray(float(sigma)), jnp.asarray(float(t)),
        jnp.asarray(float(r)), jnp.asarray(float(q)),
        bool(is_call), int(n_paths), int(n_steps), int(degree),
        bool(antithetic),
    )
    return float(price), float(stderr)
