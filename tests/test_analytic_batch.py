"""Batched analytic sweep layer vs the scalar engines (fuzz + jit/vmap).

The SURVEY marks Reiner-Rubinstein (barrier_engine.py:17) and BGK
(discrete_barrier_bgk.py:99) as batch targets; these tests pin the batched
struct-of-arrays sweeps to the scalar class implementations lane-by-lane
over randomized mixed trade tables.
"""
import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.models.analytic import (
    BarrierEngine,
    DiscreteBarrierBGKPricer,
    DoubleBarrier,
    BjerksundStenslandOptionPricer,
    BjerksundStensland2002Pricer,
    bgk_discrete_sweep,
    bs93_sweep,
    bs93_sweep_greeks,
    bs2002_sweep,
    continuous_barrier_sweep,
    continuous_barrier_sweep_greeks,
    generalized_bs_price,
    monitoring_decision,
)
from finite_difference_tpu.utils.curves import flat_naca_dataframe
from finite_difference_tpu.runners.bgk_scenarios import build_monitoring_dates


def _random_single_table(rng, B):
    s = rng.uniform(80.0, 120.0, B)
    k = rng.uniform(80.0, 120.0, B)
    t = rng.uniform(0.1, 2.0, B)
    r = rng.uniform(0.0, 0.1, B)
    b = rng.uniform(-0.05, 0.1, B)
    sigma = rng.uniform(0.1, 0.5, B)
    is_call = rng.random(B) < 0.5
    is_in = rng.random(B) < 0.5
    is_up = rng.random(B) < 0.5
    rebate = np.where(rng.random(B) < 0.5, rng.uniform(0.0, 5.0, B), 0.0)
    crossed = rng.random(B) < 0.2
    h = np.where(is_up, s * rng.uniform(1.05, 1.6, B), s * rng.uniform(0.6, 0.95, B))
    return s, k, t, r, b, sigma, is_call, is_in, is_up, rebate, crossed, h


class TestContinuousSweep:
    def test_fuzz_singles_vs_scalar_engine(self):
        rng = np.random.default_rng(7)
        B = 64
        s, k, t, r, b, sigma, is_call, is_in, is_up, rebate, crossed, h = (
            _random_single_table(rng, B)
        )
        lower = [None if up else float(x) for up, x in zip(is_up, h)]
        upper = [float(x) if up else None for up, x in zip(is_up, h)]
        batched = np.asarray(
            continuous_barrier_sweep(
                s, k, t, r, b, sigma, lower=lower, upper=upper,
                is_call=is_call, is_in=is_in, rebate=rebate, crossed=crossed,
            )
        )
        for i in range(B):
            scalar = BarrierEngine(
                s=float(s[i]), b=float(b[i]), r=float(r[i]), t=float(t[i]),
                x=float(k[i]), sigma=float(sigma[i]), h=float(h[i]),
                optionflag="c" if is_call[i] else "p",
                directionflag="u" if is_up[i] else "d",
                in_out_flag="i" if is_in[i] else "o",
                k=float(rebate[i]),
                barrier_status="crossed" if crossed[i] else None,
            ).price()
            assert batched[i] == pytest.approx(scalar, rel=1e-10, abs=1e-12), i

    def test_doubles_and_vanilla_lanes(self):
        rng = np.random.default_rng(8)
        B = 16
        s = rng.uniform(90.0, 110.0, B)
        k = rng.uniform(90.0, 110.0, B)
        t, r, b, sigma = 0.5, 0.06, 0.03, np.asarray(rng.uniform(0.15, 0.4, B))
        lo = s * 0.8
        up = s * 1.25
        is_call = rng.random(B) < 0.5
        is_in = rng.random(B) < 0.5
        # lanes 0..B/2: double; rest: no barrier (vanilla)
        half = B // 2
        lower = [float(x) for x in lo[:half]] + [None] * (B - half)
        upper = [float(x) for x in up[:half]] + [None] * (B - half)
        batched = np.asarray(
            continuous_barrier_sweep(
                s, k, t, r, b, sigma, lower=lower, upper=upper,
                is_call=is_call, is_in=is_in, double_m=4,
            )
        )
        for i in range(half):
            scalar = DoubleBarrier(
                S=float(s[i]), X=float(k[i]), L=float(lo[i]), U=float(up[i]),
                sigma=float(sigma[i]),
                callflag="c" if is_call[i] else "p",
                inflag="in" if is_in[i] else "out",
                m=4,
            ).price(b=b, r=r, T=t)
            assert batched[i] == pytest.approx(scalar, rel=1e-10, abs=1e-12), i
        vanilla = np.asarray(
            generalized_bs_price(s[half:], k[half:], sigma[half:], t, r, b, is_call[half:])
        )
        np.testing.assert_allclose(batched[half:], vanilla, rtol=1e-12)

    def test_greeks_match_scalar_bumps(self):
        rng = np.random.default_rng(9)
        B = 8
        s, k, t, r, b, sigma, is_call, is_in, is_up, rebate, crossed, h = (
            _random_single_table(rng, B)
        )
        crossed[:] = False
        lower = [None if up else float(x) for up, x in zip(is_up, h)]
        upper = [float(x) if up else None for up, x in zip(is_up, h)]
        g = continuous_barrier_sweep_greeks(
            s, k, t, r, b, sigma, lower=lower, upper=upper,
            is_call=is_call, is_in=is_in, rebate=rebate,
        )
        for i in range(B):
            mk = lambda s_, sig_: BarrierEngine(
                s=s_, b=float(b[i]), r=float(r[i]), t=float(t[i]),
                x=float(k[i]), sigma=sig_, h=float(h[i]),
                optionflag="c" if is_call[i] else "p",
                directionflag="u" if is_up[i] else "d",
                in_out_flag="i" if is_in[i] else "o",
                k=float(rebate[i]),
            ).price()
            ds = 1e-4 * s[i]
            base = mk(float(s[i]), float(sigma[i]))
            up_px = mk(float(s[i] + ds), float(sigma[i]))
            dn_px = mk(float(s[i] - ds), float(sigma[i]))
            assert float(g["price"][i]) == pytest.approx(base, rel=1e-10)
            assert float(g["delta"][i]) == pytest.approx(
                (up_px - dn_px) / (2 * ds), rel=1e-6, abs=1e-8
            )
            v_up = mk(float(s[i]), float(sigma[i]) + 1e-4)
            assert float(g["vega"][i]) == pytest.approx(
                (v_up - base) / (1e-4 * 100.0), rel=1e-6, abs=1e-10
            )

    def test_ad_greeks_match_tight_central_bumps(self):
        """greeks_mode='ad' = exact derivatives: agree with tight central
        differences of the batched pricer itself (f64) on a mixed table
        (singles, a double, vanillas)."""
        rng = np.random.default_rng(11)
        B = 8
        s, k, t, r, b, sigma, is_call, is_in, is_up, rebate, crossed, h = (
            _random_single_table(rng, B)
        )
        crossed[:] = False
        lower = [None if up else float(x) for up, x in zip(is_up, h)]
        upper = [float(x) if up else None for up, x in zip(is_up, h)]
        # lane 5: double barrier; lanes 6-7: vanilla
        lower[5], upper[5] = float(0.6 * s[5]), float(1.7 * s[5])
        is_in[5] = False
        rebate[5] = 0.0
        for i in (6, 7):
            lower[i] = upper[i] = None
        kw = dict(
            lower=lower, upper=upper, is_call=is_call, is_in=is_in,
            rebate=rebate,
        )
        g = continuous_barrier_sweep_greeks(
            s, k, t, r, b, sigma, greeks_mode="ad", **kw
        )
        px = lambda s_, sig_: np.asarray(
            continuous_barrier_sweep(s_, k, t, r, b, sig_, **kw)
        )
        hs = 1e-5 * s
        hv = 1e-6
        base = px(s, sigma)
        up_px, dn_px = px(s + hs, sigma), px(s - hs, sigma)
        v_up, v_dn = px(s, sigma + hv), px(s, sigma - hv)
        np.testing.assert_allclose(np.asarray(g["price"]), base, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(g["delta"]), (up_px - dn_px) / (2 * hs),
            rtol=1e-5, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(g["gamma"]), (up_px - 2 * base + dn_px) / hs**2,
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(g["vega"]), (v_up - v_dn) / (2 * hv * 100.0),
            rtol=1e-5, atol=1e-10,
        )


VAL = dt.date(2025, 7, 28)
MAT = dt.date(2025, 8, 28)


class TestBGKSweep:
    def _scalar(self, **kw):
        base = dict(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT,
            option_type="call", volatility=0.28790,
            discount_curve=flat_naca_dataframe(0.073085649282),
            monitor_dates=build_monitoring_dates(VAL, MAT, "daily"),
            pricing_method="bgk",
        )
        base.update(kw)
        return DiscreteBarrierBGKPricer(**base)

    def test_batch_dim_from_barrier_or_flag_arrays(self):
        """B must be inferred from EVERY batched argument: scalar numerics
        with the batch dimension carried only by `lower` (or only by a
        flag array) used to mis-shape the placeholder monitor grid and
        crash vmap with inconsistent sizes."""
        out = np.asarray(
            bgk_discrete_sweep(
                s_eff=100.0, strike=100.0, forward=101.0, mu=0.01,
                sigma=0.2, t=1.0, df=0.95, m=12.0,
                lower=[90.0, 85.0, 80.0],
            )
        )
        assert out.shape == (3,)
        assert np.all(np.diff(out) > 0)  # farther barrier -> dearer KO
        out2 = np.asarray(
            bgk_discrete_sweep(
                s_eff=100.0, strike=100.0, forward=101.0, mu=0.01,
                sigma=0.2, t=1.0, df=0.95, m=12.0, upper=260.0,
                is_in=[False, True],
            )
        )
        assert out2.shape == (2,)

    def test_sweep_matches_scalar_pricer_lanes(self):
        """One batched launch reproduces scalar BGK prices across barrier
        types, moneyness and rebate conventions (incl. already_hit)."""
        cases = []
        for bt, lo, up in (
            ("up-and-out", None, 260.0),
            ("up-and-in", None, 260.0),
            ("down-and-out", 200.0, None),
            ("down-and-in", 210.0, None),
            ("double-out", 200.0, 260.0),
            ("none", None, None),
        ):
            for rebate, at_hit in ((0.0, False), (3.0, False), (3.0, True)):
                if "in" in bt and rebate:
                    continue  # scalar rebate leg is OUT-only
                cases.append((bt, lo, up, rebate, at_hit, False))
        cases.append(("up-and-out", None, 260.0, 2.0, True, True))  # already_hit
        cases.append(("up-and-in", None, 260.0, 0.0, False, True))

        scal, rows = [], []
        for bt, lo, up, rebate, at_hit, hit in cases:
            pr = self._scalar(
                barrier_type=bt, lower_barrier=lo, upper_barrier=up,
                rebate_amount=rebate, rebate_at_hit=at_hit, already_hit=hit,
            )
            # the scalar price() now short-circuits already_hit with the
            # production CN semantics (OUT -> rebate PV, IN -> vanilla),
            # matching the batched sweep — the reference's analytic route
            # priced a dead KO as alive (documented fix, bgk_pricer.price)
            scal.append(pr.price())
            cum_t = np.cumsum(pr._compute_dt_years())
            dfs = np.exp(-pr.discount_rate * cum_t)
            rows.append(
                dict(
                    s_eff=pr.spot_price_eff, spot=pr.spot_price,
                    forward=pr.forward_price, mu=pr._mu(),
                    t=pr.tenor_years,
                    df=np.exp(-pr.discount_rate * pr.discount_years),
                    m=float(pr.m), lo=lo, up=up,
                    is_in="in" in bt and bt != "none",
                    rebate=rebate, at_hit=at_hit, hit=hit,
                    cum_t=cum_t, dfs=dfs,
                )
            )
        M = max(len(r["cum_t"]) for r in rows)
        pad = lambda v, fill: np.concatenate([v, np.full(M - len(v), fill)])
        batched = np.asarray(
            bgk_discrete_sweep(
                s_eff=[r["s_eff"] for r in rows],
                strike=190.0,
                forward=[r["forward"] for r in rows],
                mu=[r["mu"] for r in rows],
                sigma=0.28790,
                t=[r["t"] for r in rows],
                df=[r["df"] for r in rows],
                m=[r["m"] for r in rows],
                lower=[r["lo"] for r in rows],
                upper=[r["up"] for r in rows],
                is_call=True,
                is_in=[r["is_in"] for r in rows],
                spot=[r["spot"] for r in rows],
                already_hit=[r["hit"] for r in rows],
                rebate=[r["rebate"] for r in rows],
                rebate_at_hit=[r["at_hit"] for r in rows],
                monitor_cum_t=np.stack([pad(r["cum_t"], r["cum_t"][-1]) for r in rows]),
                monitor_dfs=np.stack([pad(r["dfs"], 0.0) for r in rows]),
            )
        )
        for i, (expected, case) in enumerate(zip(scal, cases)):
            assert batched[i] == pytest.approx(expected, rel=1e-9, abs=1e-10), (
                i, case,
            )


class TestAmericanSweeps:
    def test_bs93_sweep_matches_scalar(self):
        rng = np.random.default_rng(11)
        B = 32
        s = rng.uniform(80.0, 120.0, B)
        k = rng.uniform(80.0, 120.0, B)
        t = rng.uniform(0.1, 2.0, B)
        r = rng.uniform(0.01, 0.1, B)
        q = rng.uniform(0.0, 0.12, B)
        sigma = rng.uniform(0.1, 0.5, B)
        is_call = rng.random(B) < 0.5
        f = s * np.exp((r - q) * t)
        batched = np.asarray(bs93_sweep(s, f, k, t, r, sigma, is_call))
        for i in range(B):
            pr = BjerksundStenslandOptionPricer(
                float(s[i]), float(k[i]), float(t[i]), float(r[i]),
                float(sigma[i]), forward=float(f[i]),
            )
            scalar = pr.price_call() if is_call[i] else pr.price_put()
            assert batched[i] == pytest.approx(scalar, rel=1e-10, abs=1e-12), i

    def test_bs93_greeks_sweep(self):
        g = bs93_sweep_greeks(
            np.array([100.0]), np.array([98.0]), np.array([100.0]),
            np.array([0.5]), np.array([0.08]), np.array([0.25]),
            np.array([True]),
        )
        ref = BjerksundStenslandOptionPricer(
            100.0, 100.0, 0.5, 0.08, 0.25, forward=98.0
        ).greeks_call()
        assert float(g["price"][0]) == pytest.approx(ref["price"], rel=1e-10)
        assert float(g["delta"][0]) == pytest.approx(ref["delta"], rel=1e-5)
        assert float(g["vega"][0]) == pytest.approx(ref["vega"], rel=1e-4)

    def test_bs2002_sweep_matches_scalar(self):
        rng = np.random.default_rng(12)
        B = 16
        s = rng.uniform(80.0, 120.0, B)
        k = rng.uniform(80.0, 120.0, B)
        t = rng.uniform(0.25, 2.0, B)
        r = rng.uniform(0.02, 0.1, B)
        b = rng.uniform(-0.04, 0.04, B)
        sigma = rng.uniform(0.15, 0.4, B)
        batched = np.asarray(bs2002_sweep(s, k, r, b, sigma, t))
        from finite_difference_tpu.models.analytic import american_call_two_step_2002

        for i in range(B):
            scalar = float(
                american_call_two_step_2002(
                    float(s[i]), float(k[i]), float(r[i]), float(b[i]),
                    float(sigma[i]), float(t[i]),
                )[0]
            )
            assert batched[i] == pytest.approx(scalar, rel=1e-12), i


class TestMonitoringDecision:
    def test_routes_by_frequency(self):
        t = np.array([1.0, 1.0])
        # trade 0: daily (250 monitors over 1y, intervals 1/250 vs dt_eq=1/400
        # -> ~2 steps each, sum ~500 < 2000) => discrete
        # trade 1: hourly-dense schedule -> sum of per-interval minimum steps
        # exceeds 5*400 => continuous
        daily = list(np.linspace(1 / 250, 1.0, 250))
        dense = list(np.linspace(1e-4, 1.0, 8000))
        use_cont, adj = monitoring_decision(t, [daily, dense], sigma=[0.3, 0.3])
        assert not use_cont[0]
        assert use_cont[1]
        # shift factor: exp(beta*sigma*sqrt(avg_dt)) just above 1
        avg_dt = float(np.mean(np.diff(dense)))
        assert adj[1] == pytest.approx(
            np.exp(0.5826 * 0.3 * np.sqrt(avg_dt)), rel=1e-10
        )

    def test_matches_scalar_hybrid_decision(self):
        from finite_difference_tpu.models.pde.hybrid import (
            DiscreteBarrierFDMPricerAnalytic,
        )

        monitors = build_monitoring_dates(VAL, MAT, "daily")
        pr = DiscreteBarrierFDMPricerAnalytic(
            option_type="call", barrier_type="up-and-out", strike=190.0,
            upper_barrier=260.0, spot=229.74, volatility=0.2879,
            valuation_date=VAL, maturity_date=MAT,
            monitoring_dates=monitors,
            discount_curve=flat_naca_dataframe(0.0731),
        )
        from finite_difference_tpu.utils.daycount import year_fraction

        mts = [year_fraction(VAL, d, "ACT/365") for d in monitors if VAL < d <= MAT]
        t_exp = year_fraction(VAL, MAT, "ACT/365")
        use_cont, adj = monitoring_decision([t_exp], [mts], sigma=[0.2879])
        assert bool(use_cont[0]) == pr.use_continuous_window
