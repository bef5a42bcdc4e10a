import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.models.analytic import bs_price
from finite_difference_tpu.models.pde import AmericanFDMPricer, DiscreteBarrierFDMPricer
from finite_difference_tpu.utils.calendars import build_monitoring_dates
from finite_difference_tpu.utils.curves import flat_curve, flat_naca_dataframe

from oracles import crr_american, mc_discrete_barrier_ko

VAL = dt.date(2025, 7, 28)
MAT_1M = dt.date(2025, 8, 28)
MAT_6M = dt.date(2026, 1, 28)


def _curve(naca):
    return flat_curve(naca, VAL)


class TestAmericanPricer:
    def test_american_call_no_div_equals_european(self):
        # With b = r and no dividends an American call is never exercised early
        pr = AmericanFDMPricer(
            spot=100.0, strike=95.0, valuation_date=VAL, maturity_date=MAT_6M,
            sigma=0.25, option_type="call", discount_curve=_curve(0.06),
            num_space_nodes=300, num_time_steps=300,
        )
        p = pr.price_log()
        r = pr.discount_rate_nacc
        t = pr.time_to_expiry
        euro = float(bs_price(pr.spot_snapped, pr.strike_snapped, 0.25, t, r, 0.0, True))
        assert p == pytest.approx(euro, rel=2e-4)

    def test_american_put_vs_binomial(self):
        pr = AmericanFDMPricer(
            spot=100.0, strike=110.0, valuation_date=VAL, maturity_date=MAT_6M,
            sigma=0.30, option_type="put", discount_curve=_curve(0.08),
            num_space_nodes=400, num_time_steps=400,
        )
        p = pr.price_log2(use_richardson=True)
        oracle = crr_american(
            pr.spot_snapped, pr.strike_snapped, 0.30, pr.time_to_expiry,
            pr.discount_rate_nacc, pr.discount_rate_nacc, False, n_steps=4000,
        )
        assert p == pytest.approx(oracle, rel=5e-4)

    def test_fa_benchmark_american_put(self):
        """Trade 201870944 from the validation notebook (cell 3): cash-settled
        American put, S0=176.39, K=170, sigma=0.296783211249, flat NACC
        r=0.070538282720, val 2025-07-28 -> mat 2025-08-28, underlying spot
        lag 3bd. Gate = the reference workflow's 1% FA materiality
        (TSDO.txt p3); FA's own number carries ~0.6% N=30 FD truncation."""
        from finite_difference_tpu.models.pde.vanilla_fis import VanillaOptionPricerFIS

        r_nacc = 0.070538282720
        df = flat_naca_dataframe(np.exp(r_nacc) - 1.0)
        pr = VanillaOptionPricerFIS(
            spot_price=176.39, strike_price=170.0, volatility=0.296783211249,
            valuation_date=VAL, maturity_date=MAT_1M, discount_curve=df,
            option_type="put", exercise_type="american", settlement_type="cash",
            underlying_spot_days=3, option_spot_days=0, option_settlement_days=0,
        )
        g = pr.calculate_greeks(300)
        fa = {
            "Price": 2.9846891127,
            "Delta": -0.2978815582,
            "Gamma": 0.0230742255,
            "Vega": 0.1778185529,
            "Theta (Annual)": -27.96921280,
        }
        for key, fa_val in fa.items():
            assert g[key] == pytest.approx(fa_val, rel=1e-2), key

    def test_vanilla_fis_european_excludes_early_exercise(self):
        """exercise_type='european' must price WITHOUT the IT projection
        (the reference builds the QL exercise object from this flag,
        vanilla_option_pricer_test.py:271-280). Regression: the flag was
        accepted and silently ignored — every 'european' trade carried
        the full American premium."""
        from finite_difference_tpu.models.pde.vanilla_fis import (
            VanillaOptionPricerFIS,
        )

        r_nacc = 0.0705
        df = flat_naca_dataframe(np.exp(r_nacc) - 1.0)
        common = dict(
            spot_price=100.0, strike_price=115.0, volatility=0.25,
            valuation_date=VAL, maturity_date=MAT_6M, discount_curve=df,
            option_type="put", settlement_type="cash",
            underlying_spot_days=0,
        )
        euro = VanillaOptionPricerFIS(exercise_type="european", **common)
        amer = VanillaOptionPricerFIS(exercise_type="american", **common)
        p_euro, p_amer = euro.price(300), amer.price(300)
        # deep-ITM put on a positive-rate curve has a material premium
        assert p_amer > p_euro + 0.05
        # European matches Black-Scholes (cash settlement, no lags)
        from finite_difference_tpu.models.analytic import bs_price as _bs

        tau = (MAT_6M - VAL).days / 365.0
        bs = float(_bs(100.0, 115.0, 0.25, tau, r_nacc, 0.0, False))
        assert p_euro == pytest.approx(bs, rel=2e-3)

    def test_dividend_jump_put(self):
        """A large known dividend raises an American put's value."""
        div_date = dt.date(2025, 10, 15)
        base = dict(
            spot=100.0, strike=100.0, valuation_date=VAL, maturity_date=MAT_6M,
            sigma=0.25, option_type="put", discount_curve=_curve(0.06),
            num_space_nodes=300, num_time_steps=300,
        )
        p_nodiv = AmericanFDMPricer(**base).price_log()
        p_div = AmericanFDMPricer(**base, dividend_schedule=[(div_date, 5.0)]).price_log()
        assert p_div > p_nodiv + 1.0


class TestDiscreteBarrierPricer:
    def _mk(self, **kw):
        base = dict(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT_1M,
            sigma=0.28790, option_type="call",
            discount_curve=flat_naca_dataframe(0.073086),
            underlying_spot_days=3,
            num_time_steps=200,
        )
        base.update(kw)
        return DiscreteBarrierFDMPricer(**base)

    def test_vanilla_routing(self):
        from finite_difference_tpu.models.analytic import black76_price

        pr = self._mk(barrier_type="none")
        p = pr.price_log2()
        # Black-76 with three time measures
        fwd = pr.spot * np.exp(pr.carry_rate_nacc * pr.time_to_carry)
        df = np.exp(-pr.discount_rate_nacc * pr.time_to_discount)
        expected = float(
            black76_price(fwd, 190.0, 0.28790, pr.time_to_expiry, df, True)
        )
        assert p == pytest.approx(expected, rel=1e-10)

    def test_far_barrier_equals_pde_european(self):
        """A KO barrier far above the grid's reach must reproduce the PDE's
        own European value (generalized BS at the PDE's r/b/t_expiry)."""
        from finite_difference_tpu.models.analytic import generalized_bs_price

        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        pr = self._mk(
            barrier_type="up-and-out", upper_barrier=10_000.0, monitor_dates=monitors,
            underlying_spot_days=0,
        )
        p_ko = pr.price_log2()
        expected = float(
            generalized_bs_price(
                pr.spot, pr.strike, pr.sigma, pr.time_to_expiry,
                pr.discount_rate_nacc, pr.carry_rate_nacc, True,
            )
        )
        assert p_ko == pytest.approx(expected, rel=5e-5)

    def test_fa_xlsx_up_and_out_call_far_barrier(self):
        """Scneario_results_summary.xlsx sheet1 H=420: model 40.9325761 /
        FA 40.9325556 (5e-7% diff) on the production 500-step grid with 24
        daily ZA monitors, zero lags. FA itself is the benchmark here, but
        the two agree to 5.2e-6 so the gate is 1e-5."""
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        pr = self._mk(
            barrier_type="up-and-out", upper_barrier=420.0, monitor_dates=monitors,
            underlying_spot_days=0, num_time_steps=500,
        )
        p = pr.price_log2()
        assert p == pytest.approx(40.9325761, rel=1e-5)  # reference model
        assert p == pytest.approx(40.9325556, rel=1e-5)  # FA

    def test_fa_xlsx_up_and_out_call_near_barrier(self):
        """xlsx sheet1 H=260: reference model 32.464175, FA 32.413972
        (0.155% apart). The default grid reproduces the reference MODEL to
        8.6e-7 (gate 2e-6); the FA gate stays at 3e-3 because the 0.155%
        model-vs-FA gap is the reference's own committed headline diff."""
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        pr = self._mk(
            barrier_type="up-and-out", upper_barrier=260.0, monitor_dates=monitors,
            underlying_spot_days=0, num_time_steps=500,
        )
        p = pr.price_log2()
        assert p == pytest.approx(32.464175, rel=2e-6)
        assert p == pytest.approx(32.413972, rel=3e-3)

    def test_apply_ko_false_prices_vanilla_pde(self):
        """price_log2(apply_KO=False) skips the monitor projection and must
        reproduce the far-barrier European PDE value."""
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        near = self._mk(
            barrier_type="up-and-out", upper_barrier=260.0, monitor_dates=monitors,
            underlying_spot_days=0, num_time_steps=500,
        )
        p_vanilla_pde = near.price_log2(apply_KO=False)
        far = self._mk(
            barrier_type="up-and-out", upper_barrier=420.0, monitor_dates=monitors,
            underlying_spot_days=0, num_time_steps=500,
        )
        # same dynamics, different grids; both European to ~grid accuracy
        assert p_vanilla_pde == pytest.approx(far.price_log2(), rel=1e-4)
        assert p_vanilla_pde > near.price_log2()

    def test_use_richardson_improves_time_convergence(self):
        """(4 P_2N - P_N)/3 at N=250 must land closer to the N=2000 truth
        than the plain N=250 run (grid pinned so only dt varies)."""
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        mk = lambda n: self._mk(
            barrier_type="up-and-out", upper_barrier=260.0,
            monitor_dates=monitors, underlying_spot_days=0,
            num_time_steps=n, fixed_num_space_nodes=501,
        )
        truth = mk(2000).price_log2()
        plain = mk(250).price_log2()
        rich = mk(250).price_log2(use_richardson=True)
        assert abs(rich - truth) < abs(plain - truth)
        g = mk(250).greeks_log2(use_richardson=True)
        g_plain = mk(250).greeks_log2()
        assert g["price"] == pytest.approx(rich, rel=1e-12)
        for k in ("delta", "gamma", "vega", "theta"):
            assert np.isfinite(g[k])
            assert g[k] == pytest.approx(g_plain[k], rel=0.2, abs=1e-3), k

    def test_ko_below_vanilla_and_monotone_in_barrier(self):
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        prices = []
        for H in (240.0, 260.0, 300.0, 420.0):
            pr = self._mk(
                barrier_type="up-and-out", upper_barrier=H, monitor_dates=monitors
            )
            prices.append(pr.price_log2())
        van = self._mk(barrier_type="none").price_log2()
        assert all(p <= van + 1e-9 for p in prices)
        assert all(prices[i] < prices[i + 1] for i in range(len(prices) - 1))

    def test_in_out_parity(self):
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        ko = self._mk(
            barrier_type="up-and-out", upper_barrier=260.0, monitor_dates=monitors
        ).price_log2()
        ki = self._mk(
            barrier_type="up-and-in", upper_barrier=260.0, monitor_dates=monitors
        ).price_log2()
        van = self._mk(barrier_type="none").price_log2()
        assert ko + ki == pytest.approx(van, rel=1e-9)

    def test_vs_monte_carlo(self):
        """KO PDE price vs a brute-force numpy MC with the same discrete
        monitors (both on the pure year-fraction layout: zero lags)."""
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        pr = self._mk(
            barrier_type="up-and-out", upper_barrier=260.0, monitor_dates=monitors,
            underlying_spot_days=0, num_time_steps=400,
        )
        p_pde = pr.price_log2()
        t = pr.time_to_expiry
        # MC with monitor times == pricer's monitor times:
        # use the same count of equally-spaced monitors as an approximation
        n_mon = len(pr.monitor_times)
        p_mc, se = mc_discrete_barrier_ko(
            pr.spot, pr.strike, pr.sigma, t, pr.discount_rate_nacc,
            pr.carry_rate_nacc, True, 260.0, True, n_mon, n_paths=400_000,
        )
        assert p_pde == pytest.approx(p_mc, abs=4 * se + 0.05)

    def test_already_states(self):
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        pr = self._mk(
            barrier_type="up-and-out", upper_barrier=260.0, monitor_dates=monitors,
            already_hit=True, rebate_amount=3.0,
        )
        df = pr.discount_curve.get_discount_factor(pr.discount_end_date)
        assert pr.price_log2() == pytest.approx(3.0 * df, rel=1e-12)
        pr_in = self._mk(
            barrier_type="up-and-in", upper_barrier=260.0, monitor_dates=monitors,
            already_in=True,
        )
        assert pr_in.price_log2() == pytest.approx(pr_in._vanilla_black76_price())

    def test_rebate_raises_ko_value(self):
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        p0 = self._mk(
            barrier_type="up-and-out", upper_barrier=260.0, monitor_dates=monitors
        ).price_log2()
        p_reb = self._mk(
            barrier_type="up-and-out", upper_barrier=260.0, monitor_dates=monitors,
            rebate_amount=5.0, rebate_at_hit=True,
        ).price_log2()
        assert p_reb > p0 + 0.01

    def test_ki_rebate_far_barrier_is_rebate_pv(self):
        """KI(R) = vanilla - KO(R at expiry) + R*DF (RR term E, the
        framework-wide identity). Far barrier: never knocked in, so the
        KI is (almost) only the never-in rebate leg. Regression: the
        reference's parity (vanilla - KO(R)) drops the +R*DF term, which
        priced this trade at ~0 instead of ~R*DF."""
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        # the parity mixes the closed-form vanilla (three lagged time
        # measures) with the PDE KO, so with a settlement lag the
        # far-barrier limit carries the engines' lag basis (~0.09 — the
        # reference KI structure, present with or without rebates); pin
        # zero lag and a fine grid to isolate the rebate identity
        fine = dict(
            num_time_steps=500, num_space_nodes=800, underlying_spot_days=0,
        )
        pr = self._mk(
            barrier_type="up-and-in", upper_barrier=900.0,
            monitor_dates=monitors, rebate_amount=5.0, **fine,
        )
        df = pr.discount_curve.get_discount_factor(pr.discount_end_date)
        assert pr.price_log2() == pytest.approx(5.0 * df, rel=5e-3)
        g = pr.greeks_log2()
        assert g["price"] == pytest.approx(5.0 * df, rel=5e-3)
        # the leg is (near-)flat in spot and vol
        assert abs(g["delta"]) < 5e-3 and abs(g["vega"]) < 5e-2
        # at-hit timing must not leak into the IN complement: same price
        pr_hit = self._mk(
            barrier_type="up-and-in", upper_barrier=900.0,
            monitor_dates=monitors, rebate_amount=5.0, rebate_at_hit=True,
            **fine,
        )
        assert pr_hit.price_log2() == pytest.approx(pr.price_log2(), rel=1e-12)

    def test_greeks_shape_and_signs(self):
        monitors = build_monitoring_dates(VAL, MAT_1M, "daily")
        g = self._mk(
            barrier_type="up-and-out", upper_barrier=420.0, monitor_dates=monitors
        ).greeks_log2()
        # far barrier: behaves like a vanilla deep-ITM call
        assert 0.8 < g["delta"] <= 1.05
        assert g["gamma"] >= -1e-4
