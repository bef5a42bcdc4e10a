"""Longstaff-Schwartz American MC vs the CN PDE engine and analytic limits.

The reference has no American MC; this pricer is the independent tier-2
cross-check (SURVEY.md §4) for the CN American engine — two completely
different numerical methods agreeing on the same trade.
"""
import numpy as np
import pytest

from finite_difference_tpu.models.analytic import bs_price
from finite_difference_tpu.models.mc import price_american_lsm
from finite_difference_tpu.models.pde.batch import (
    build_trade_batch,
    price_american_batch,
)


def _cn_american(s0, k, sigma, t, r, q, is_call, n=800):
    tb = build_trade_batch(
        spots=[s0], strikes=[k], sigmas=[sigma], t_expiry=[t],
        r=[r], b=[r - q], is_call=[is_call],
        n_time_steps=n, monitor_times=[[]],
        num_space_nodes=n - 1,
    )
    out = price_american_batch(tb, n_nodes=n, with_greeks=False)
    return float(np.asarray(out["price"])[0])


class TestLSM:
    def test_american_call_no_dividends_equals_european(self):
        """q=0 American call is never exercised early -> BS closed form."""
        c, se = price_american_lsm(
            100.0, 100.0, 0.25, 1.0, 0.05, 0.0, True,
            n_paths=200_000, n_steps=50, seed=1,
        )
        euro = float(bs_price(100.0, 100.0, 0.25, 1.0, 0.05, 0.0, True))
        assert c == pytest.approx(euro, abs=4.0 * se)

    def test_put_cross_checks_cn_engine(self):
        """Two independent methods (regression MC vs CN+Ikonen-Toivanen)
        agree within MC noise + LSM policy bias (<0.5%)."""
        s0, k, sigma, t, r = 100.0, 100.0, 0.25, 1.0, 0.05
        lsm, se = price_american_lsm(
            s0, k, sigma, t, r, 0.0, False,
            n_paths=200_000, n_steps=50, seed=2,
        )
        cn = _cn_american(s0, k, sigma, t, r, 0.0, False)
        assert lsm == pytest.approx(cn, rel=5e-3)
        assert abs(lsm - cn) < max(4.0 * se, 5e-3 * cn)

    def test_itm_put_with_dividend_yield(self):
        s0, k, sigma, t, r, q = 90.0, 100.0, 0.3, 2.0, 0.06, 0.03
        lsm, se = price_american_lsm(
            s0, k, sigma, t, r, q, False,
            n_paths=200_000, n_steps=50, seed=3,
        )
        cn = _cn_american(s0, k, sigma, t, r, q, False)
        assert lsm == pytest.approx(cn, rel=6e-3)

    def test_early_exercise_premium_positive(self):
        p, _ = price_american_lsm(
            100.0, 100.0, 0.25, 1.0, 0.05, 0.0, False,
            n_paths=100_000, seed=4,
        )
        euro = float(bs_price(100.0, 100.0, 0.25, 1.0, 0.05, 0.0, False))
        assert p > euro

    def test_deterministic_for_fixed_seed(self):
        a = price_american_lsm(100.0, 95.0, 0.2, 0.5, 0.04, 0.0, False,
                               n_paths=50_000, seed=7)
        b = price_american_lsm(100.0, 95.0, 0.2, 0.5, 0.04, 0.0, False,
                               n_paths=50_000, seed=7)
        assert a == b

    def test_deep_itm_put_floor(self):
        """Deep ITM American put is worth at least intrinsic."""
        p, _ = price_american_lsm(60.0, 100.0, 0.2, 1.0, 0.08, 0.0, False,
                                  n_paths=50_000, seed=5)
        assert p >= 40.0 - 1e-9
