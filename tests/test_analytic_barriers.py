import datetime as dt

import numpy as np
import pytest
import jax.numpy as jnp

from finite_difference_tpu.models.analytic import (
    BarrierEngine,
    BjerksundStenslandOptionPricer,
    DiscreteBarrierBGKPricer,
    DoubleBarrier,
    barrier_price,
    bs_price,
    double_barrier_ko_price,
    generalized_bs_price,
    american_call_bs93,
    american_put_bs93,
)
from finite_difference_tpu.utils.curves import flat_naca_dataframe
from finite_difference_tpu.utils.calendars import build_monitoring_dates

from oracles import crr_american


class TestReinerRubinstein:
    # Haug, Option Pricing Formulas, standard-barrier table:
    # S=100, T=0.5, r=0.08, b=0.04, sigma=0.25, rebate=3
    HAUG = [
        # (is_call, is_up, is_in, K, H, expected)
        (True, False, False, 90, 95, 9.0246),
        (True, False, False, 100, 95, 6.7924),
        (True, False, False, 110, 95, 4.8759),
        (True, True, False, 90, 105, 2.6789),
        (True, True, False, 100, 105, 2.3580),
        (True, True, False, 110, 105, 2.3453),
        (True, False, True, 90, 95, 7.7627),
        (True, False, True, 100, 95, 4.0109),
        (True, False, True, 110, 95, 2.0576),
        (True, True, True, 90, 105, 14.1112),
        (False, False, False, 90, 95, 2.2798),
        (False, False, False, 100, 95, 2.2947),
        (False, True, False, 90, 105, 3.7760),
        (False, True, False, 100, 105, 5.4932),
        (False, False, True, 90, 95, 2.9586),
    ]

    @pytest.mark.parametrize("is_call,is_up,is_in,k,h,expected", HAUG)
    def test_haug_values(self, is_call, is_up, is_in, k, h, expected):
        p = float(
            barrier_price(
                100.0, float(k), float(h), 0.5, 0.08, 0.04, 0.25,
                is_call, is_up, is_in, rebate=3.0,
            )
        )
        assert p == pytest.approx(expected, abs=2e-4)

    def test_in_out_parity_no_rebate(self):
        for is_call in (True, False):
            for is_up, h in ((True, 115.0), (False, 85.0)):
                ko = float(barrier_price(100, 100, h, 0.5, 0.08, 0.04, 0.25, is_call, is_up, False))
                ki = float(barrier_price(100, 100, h, 0.5, 0.08, 0.04, 0.25, is_call, is_up, True))
                van = float(generalized_bs_price(100, 100, 0.25, 0.5, 0.08, 0.04, is_call))
                assert ko + ki == pytest.approx(van, rel=1e-10)

    def test_crossed_conditioning(self):
        eng = BarrierEngine(100, 0.04, 0.08, 0.5, 100, 0.25, 95, "c", "d", "i", 0.0,
                            barrier_status="crossed")
        assert eng.price() == pytest.approx(eng.vanilla(), rel=1e-12)
        eng_o = BarrierEngine(100, 0.04, 0.08, 0.5, 100, 0.25, 95, "c", "d", "o", 3.0,
                              barrier_status="crossed")
        assert eng_o.price() == pytest.approx(3.0)


class TestDoubleBarrier:
    # Haug / Ikeda-Kunitomo flat double-barrier calls:
    # S=100, K=100, T=0.25, r=0.1, b=0.1, delta1=delta2=0
    # sigma=0.15 rows and the wide-corridor rows are Haug/Ikeda-Kunitomo
    # textbook values; the tight-corridor higher-vol rows are regression
    # values independently verified against a 4000-step 120k-path MC
    # (2.6725 +- 0.013 and 1.5129 +- 0.010 with ~+0.03 discrete bias).
    IK = [
        (50.0, 150.0, 0.15, 4.3515),
        (60.0, 140.0, 0.15, 4.3505),
        (70.0, 130.0, 0.15, 4.3139),
        (80.0, 120.0, 0.15, 3.7516),
        (90.0, 110.0, 0.15, 1.2055),
        (50.0, 150.0, 0.25, 6.1644),
        (60.0, 140.0, 0.25, 5.850021),
        (70.0, 130.0, 0.25, 4.829317),
        (80.0, 120.0, 0.25, 2.638713),
        (90.0, 110.0, 0.25, 0.309824),
        (50.0, 150.0, 0.35, 7.0373),
        (80.0, 120.0, 0.35, 1.490279),
        (90.0, 110.0, 0.35, 0.047742),
    ]

    @pytest.mark.parametrize("l,u,sigma,expected", IK)
    def test_ikeda_kunitomo_calls(self, l, u, sigma, expected):
        p = float(double_barrier_ko_price(100.0, 100.0, l, u, 0.25, 0.1, 0.1, sigma, True, m=6))
        assert p == pytest.approx(expected, abs=2e-4)

    def test_single_barrier_limits(self):
        # U huge -> down-and-out; L tiny -> up-and-out
        dko = float(double_barrier_ko_price(100, 100, 85.0, 1e5, 0.5, 0.08, 0.04, 0.25, True, m=6))
        rr_do = float(barrier_price(100, 100, 85.0, 0.5, 0.08, 0.04, 0.25, True, False, False))
        assert dko == pytest.approx(rr_do, rel=1e-6)

        uko = float(double_barrier_ko_price(100, 100, 1e-3, 115.0, 0.5, 0.08, 0.04, 0.25, True, m=24))
        rr_uo = float(barrier_price(100, 100, 115.0, 0.5, 0.08, 0.04, 0.25, True, True, False))
        assert uko == pytest.approx(rr_uo, rel=1e-5)

    def test_put_via_class_and_parity(self):
        pricer = DoubleBarrier(100, 105, 80, 120, 0.25, "p", "out", m=6)
        ko = pricer.price(b=0.04, r=0.08, T=0.5)
        ki = DoubleBarrier(100, 105, 80, 120, 0.25, "p", "in", m=6).price(0.04, 0.08, 0.5)
        van = float(generalized_bs_price(100, 105, 0.25, 0.5, 0.08, 0.04, False))
        assert ko + ki == pytest.approx(van, rel=1e-9)
        assert 0.0 < ko < van


class TestBjerksundStensland:
    @pytest.mark.parametrize(
        "s,k,t,r,q,sigma,is_call",
        [
            (100, 100, 0.5, 0.08, 0.12, 0.2, True),   # b<r: early exercise zone
            (90, 100, 0.5, 0.1, 0.0, 0.15, False),
            (100, 90, 1.0, 0.06, 0.03, 0.3, False),
            (110, 100, 0.25, 0.07, 0.1, 0.25, True),
            (42, 40, 0.75, 0.04, 0.08, 0.35, True),
        ],
    )
    def test_vs_binomial(self, s, k, t, r, q, sigma, is_call):
        f = s * np.exp((r - q) * t)
        bs93 = float(
            american_call_bs93(s, f, k, t, r, sigma)
            if is_call
            else american_put_bs93(s, f, k, t, r, sigma)
        )
        crr = crr_american(s, k, sigma, t, r, r - q, is_call, n_steps=2000)
        # BS93 is an approximation; its error vs binomial can reach ~1.5%
        # (our implementation matches the reference's to 1e-12)
        assert bs93 == pytest.approx(crr, rel=2.5e-2, abs=2e-2)

    def test_no_carry_equals_european(self):
        # b >= r -> American call is European
        p = BjerksundStenslandOptionPricer(100, 95, 0.5, 0.05, 0.25).price_call()
        euro = float(bs_price(100, 95, 0.25, 0.5, 0.05, 0.0, True))
        assert p == pytest.approx(euro, rel=1e-10)

    def test_reference_regression_values(self):
        # Values produced identically by the reference implementation
        # (bjerksund_stensland.py) — checked side-by-side during the port.
        p1 = BjerksundStenslandOptionPricer(100, 100, 0.5, 0.08, 0.2, div_yield=0.12).price_call()
        assert p1 == pytest.approx(4.648428, abs=1e-5)
        p2 = BjerksundStenslandOptionPricer(100, 90, 1.0, 0.06, 0.3, div_yield=0.03).price_put()
        assert p2 == pytest.approx(5.890171, abs=1e-5)

    def test_greeks_api(self):
        # NOTE: delta/gamma hold the curve-implied forward FIXED while
        # bumping spot (forward-frame convention, bjerksund_stensland.py:47),
        # so delta is not the usual spot delta.
        g = BjerksundStenslandOptionPricer(
            100, 100, 0.5, 0.08, 0.25, div_yield=0.12
        ).greeks_call()
        assert g["vega"] > 0
        assert abs(g["delta"]) < 1.5


VAL = dt.date(2025, 7, 28)
MAT = dt.date(2025, 8, 28)


class TestBGK:
    def _mk(self, **kw):
        base = dict(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT,
            option_type="call", volatility=0.28790,
            discount_curve=flat_naca_dataframe(0.073085649282),
            monitor_dates=build_monitoring_dates(VAL, MAT, "daily"),
        )
        base.update(kw)
        return DiscreteBarrierBGKPricer(**base)

    def test_vanilla_routing(self):
        pr = self._mk(barrier_type="none")
        df = np.exp(-pr.discount_rate * pr.discount_years)
        from finite_difference_tpu.models.analytic import black76_price

        expected = float(black76_price(pr.forward_price, 190.0, 0.28790, pr.tenor_years, df, True))
        assert pr.price() == pytest.approx(expected, rel=1e-12)

    def test_bgk_matches_pde_near_barrier(self):
        """BGK up-and-out call vs the CN FDM engine on the FA xlsx trade —
        the two independent models should agree to ~0.5%."""
        from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricer

        pr = self._mk(barrier_type="up-and-out", upper_barrier=260.0)
        p_bgk = pr.price()
        fdm = DiscreteBarrierFDMPricer(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT,
            sigma=0.28790, option_type="call", barrier_type="up-and-out",
            upper_barrier=260.0, monitor_dates=pr.monitor_dates,
            discount_curve=flat_naca_dataframe(0.073085649282),
            underlying_spot_days=0, num_time_steps=500,
        )
        p_fdm = fdm.price_log2()
        assert p_bgk == pytest.approx(p_fdm, rel=7e-3)

    def test_continuous_limit_matches_reiner_rubinstein(self):
        """m very large -> BGK converges to the continuous RR barrier price."""
        t = 31 / 365
        monitors = [VAL + dt.timedelta(days=0)]  # placeholder; use synthetic schedule
        pr = self._mk(barrier_type="up-and-out", upper_barrier=260.0,
                      monitor_dates=build_monitoring_dates(VAL, MAT, "daily"))
        # Use the functional kernel directly with huge m
        from finite_difference_tpu.models.analytic.bgk_horfelt import (
            single_barrier_out_price,
        )

        mu = pr.carry_rate_nacc
        df = np.exp(-pr.discount_rate * pr.discount_years)
        p_inf = float(
            single_barrier_out_price(
                pr.spot_price_eff, 190.0, 260.0, pr.forward_price, mu,
                0.28790, pr.tenor_years, df, 1e12, True, True,
            )
        )
        rr = float(
            barrier_price(
                229.74, 190.0, 260.0, pr.tenor_years, pr.discount_rate,
                pr.carry_rate_nacc, 0.28790, True, True, False,
            )
        )
        assert p_inf == pytest.approx(rr, rel=2e-3)

    def test_in_out_parity(self):
        ko = self._mk(barrier_type="up-and-out", upper_barrier=260.0).price()
        ki = self._mk(barrier_type="up-and-in", upper_barrier=260.0).price()
        van = self._mk(barrier_type="none").price()
        assert ko + ki == pytest.approx(van, rel=1e-10)

    def test_auto_routes_sparse_to_mc(self):
        pr = self._mk(
            barrier_type="up-and-out", upper_barrier=260.0,
            monitor_dates=[dt.date(2025, 8, 28)],
        )
        assert pr._select_method() == "mc"
        p_mc = pr.price()
        assert 0.0 < p_mc < pr._vanilla_b76() * 1.05
        assert pr._last_mc_std_error > 0

    def test_mc_matches_bgk_daily(self):
        pr_bgk = self._mk(barrier_type="up-and-out", upper_barrier=280.0,
                          pricing_method="bgk")
        pr_mc = self._mk(barrier_type="up-and-out", upper_barrier=280.0,
                         pricing_method="mc", mc_n_paths=200_000,
                         mc_smooth_barrier_eps=0.0, mc_smooth_payoff_eps=0.0,
                         mc_use_torch_rng=False)
        p1, p2 = pr_bgk.price(), pr_mc.price()
        assert p1 == pytest.approx(p2, abs=5 * pr_mc._last_mc_std_error + 0.02)

    def test_rebate_hazard_leg(self):
        pr = self._mk(
            barrier_type="up-and-out", upper_barrier=250.0,
            rebate_amount=5.0, rebate_at_hit=True,
        )
        mets = pr.barrier_hit_metrics()
        assert 0.0 < mets["P_hit"] < 1.0
        assert mets["rebate_pv_at_hit"] > 0.0
        assert mets["P_hit"] + mets["survival_to_T"] == pytest.approx(1.0, abs=1e-9)
        p_with = pr.price()
        p_without = self._mk(barrier_type="up-and-out", upper_barrier=250.0).price()
        assert p_with == pytest.approx(p_without + mets["rebate_pv_at_hit"], rel=1e-9)
