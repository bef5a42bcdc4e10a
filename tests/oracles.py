"""Slow, obviously-correct numpy oracles used only by the test suite."""
import numpy as np


def crr_american(spot, strike, sigma, t, r, b, is_call, n_steps=2000):
    """Cox–Ross–Rubinstein binomial American price (vectorized backward
    induction). b = cost of carry (b = r for non-dividend equity)."""
    dt = t / n_steps
    u = np.exp(sigma * np.sqrt(dt))
    d = 1.0 / u
    disc = np.exp(-r * dt)
    p = (np.exp(b * dt) - d) / (u - d)
    j = np.arange(n_steps + 1)
    s_T = spot * u ** (2 * j - n_steps)
    payoff = lambda s: np.maximum(s - strike, 0.0) if is_call else np.maximum(strike - s, 0.0)
    v = payoff(s_T)
    for m in range(n_steps - 1, -1, -1):
        v = disc * (p * v[1:] + (1 - p) * v[:-1])
        s_m = spot * u ** (2 * np.arange(m + 1) - m)
        v = np.maximum(v, payoff(s_m))
    return float(v[0])


def mc_discrete_barrier_ko(
    spot, strike, sigma, t, r, b, is_call, barrier, is_up, n_monitors,
    n_paths=400_000, seed=7,
):
    """Brute-force GBM Monte Carlo knock-OUT price with equally spaced
    monitor dates (the last at maturity). Antithetic; returns (price, se)."""
    rng = np.random.default_rng(seed)
    dt = t / n_monitors
    half = n_paths // 2
    z = rng.standard_normal((half, n_monitors))
    z = np.concatenate([z, -z], axis=0)
    drift = (b - 0.5 * sigma**2) * dt
    vol = sigma * np.sqrt(dt)
    logs = np.log(spot) + np.cumsum(drift + vol * z, axis=1)
    s = np.exp(logs)
    alive = np.all(s < barrier, axis=1) if is_up else np.all(s > barrier, axis=1)
    sT = s[:, -1]
    pay = np.maximum(sT - strike, 0.0) if is_call else np.maximum(strike - sT, 0.0)
    disc_pay = np.exp(-r * t) * pay * alive
    return float(disc_pay.mean()), float(disc_pay.std(ddof=1) / np.sqrt(n_paths))
