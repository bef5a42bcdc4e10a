import datetime as dt
import math

import numpy as np
import pytest

from finite_difference_tpu.models.analytic import (
    BjerksundStensland2002Pricer,
    BjerksundStenslandOptionPricer,
    bs_price,
)
from finite_difference_tpu.models.pde import (
    AmericanFwdFDMPricer,
    DiscreteBarrierCrankNicolsonLog,
    DiscreteBarrierFDMPricer,
    DiscreteBarrierFDMPricerAnalytic,
    compute_empirical_order,
    diagnose_order_of_accuracy,
    front_arena_style_spot_curve,
    risk_reprice_spot,
    risk_spot_scenario,
)
from finite_difference_tpu.utils.curves import flat_curve

VAL = dt.date(2025, 7, 28)
MAT_1M = dt.date(2025, 8, 28)
MAT_6M = dt.date(2026, 1, 28)


class TestAmericanBlack76:
    def test_no_early_exercise_call_equals_black76(self):
        """Driftless forward: an American call is never exercised early only
        when r <= 0; with r > 0 it can be. Check the European limit at r=0."""
        pr = AmericanFwdFDMPricer(
            forward=100.0, strike=95.0, valuation_date=VAL, maturity_date=MAT_6M,
            sigma=0.25, option_type="call", discount_curve=flat_curve(0.0, VAL),
            num_space_nodes=300, num_time_steps=300,
        )
        p = pr.price_log()
        t = pr.time_to_expiry
        euro = float(
            bs_price(pr.spot_snapped, pr.strike_snapped, 0.25, t, 0.0, 0.0, True)
        )
        assert p == pytest.approx(euro, rel=3e-4)

    def test_american_put_premium_over_european(self):
        pr = AmericanFwdFDMPricer(
            forward=100.0, strike=110.0, valuation_date=VAL, maturity_date=MAT_6M,
            sigma=0.30, option_type="put", discount_curve=flat_curve(0.08, VAL),
            num_space_nodes=300, num_time_steps=300,
        )
        p = pr.price_log()
        r = pr.discount_rate_nacc
        t = pr.time_to_expiry
        # European put on the forward (Black-76)
        euro = float(
            bs_price(pr.spot_snapped, pr.strike_snapped, 0.30, t, r, r, False)
        )
        assert p > euro  # early exercise premium
        assert pr.carry_rate_nacc == 0.0


class TestCnLogPricer:
    def _mk(self, **kw):
        base = dict(
            S0=100.0, K=100.0, T=0.5, sigma=0.25, r_disc=0.06, b_carry=0.06,
            option_type="call", barrier_type="none",
        )
        base.update(kw)
        return DiscreteBarrierCrankNicolsonLog(**base)

    def test_auto_grid_rules(self):
        p = self._mk(monitor_times=[0.1, 0.2, 0.3, 0.4])
        p.configure_grid()
        assert p.N_space >= 300
        assert p.N_time >= max(p.N_space, 50)

    def test_vanilla_matches_closed_form(self):
        p = self._mk()
        pde = p.price()
        cf = p._vanilla_bs_price_and_greeks()["price"]
        assert pde == pytest.approx(cf, rel=2e-3)

    def test_in_out_parity(self):
        mons = [0.1 * k for k in range(1, 6)]
        ko = self._mk(barrier_type="up-and-out", upper_barrier=130.0,
                      monitor_times=mons)
        ki = self._mk(barrier_type="up-and-in", upper_barrier=130.0,
                      monitor_times=mons)
        vanilla = ko._vanilla_bs_price_and_greeks()["price"]
        assert ko.price() + ki.price() == pytest.approx(vanilla, rel=1e-9)

    def test_greeks_parity(self):
        """KO + KI greeks == vanilla greeks per component (in-out parity
        differentiates) — the old assertion only checked finiteness,
        which a wrong bump sign or 10x scaling also satisfies."""
        mons = [0.1 * k for k in range(1, 6)]
        ko = self._mk(barrier_type="up-and-out", upper_barrier=130.0,
                      monitor_times=mons)
        ki = self._mk(barrier_type="up-and-in", upper_barrier=130.0,
                      monitor_times=mons)
        g_ko, g_ki = ko.greeks(), ki.greeks()
        g_van = ko._vanilla_bs_price_and_greeks()
        for k in ("delta", "gamma", "vega"):
            assert g_ko[k] + g_ki[k] == pytest.approx(
                g_van[k], rel=5e-3, abs=5e-4
            ), k


class TestHybridPricer:
    def _mk(self, monitors_per_day=1, **kw):
        n_days = (MAT_1M - VAL).days
        mons = [
            VAL + dt.timedelta(days=k)
            for k in range(1, n_days + 1)
            for _ in range(1)
        ]
        base = dict(
            trade_id="T1", direction="long", quantity=1, contract_multiplier=1.0,
            option_type="call", barrier_type="up-and-out",
            strike=190.0, lower_barrier=None, upper_barrier=260.0,
            spot=229.74, volatility=0.2879,
            valuation_date=VAL, maturity_date=MAT_1M,
            monitoring_dates=mons,
            discount_curve=flat_curve(0.0731, VAL),
            time_steps=300, space_nodes=300,
        )
        base.update(kw)
        return DiscreteBarrierFDMPricerAnalytic(**base)

    def test_discrete_branch_matches_production_pricer(self):
        """With few monitors the n_lim rule keeps the discrete branch; the
        hybrid CN price must track DiscreteBarrierFDMPricer."""
        # production pricer always monitors at expiry; pass it explicitly
        # so both engines see the same schedule
        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)] + [MAT_1M]
        hybrid = self._mk(monitoring_dates=mons)
        assert not hybrid.use_continuous_window
        p_hybrid = hybrid.price()
        ref = DiscreteBarrierFDMPricer(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT_1M,
            sigma=0.2879, option_type="call", barrier_type="up-and-out",
            upper_barrier=260.0, monitor_dates=mons,
            discount_curve=flat_curve(0.0731, VAL),
            num_space_nodes=300, num_time_steps=300,
        ).price_log2()
        assert p_hybrid == pytest.approx(ref, rel=2e-2)

    def test_continuous_window_triggers_with_dense_monitoring(self):
        """Dense daily monitors + tiny n budget trips the n_lim rule."""
        hybrid = self._mk(
            n_desired_for_decision=2, n_lim_multiplier=1,
        )
        assert hybrid.use_continuous_window
        # BGK shift widens the upper barrier
        assert hybrid.bgk_upper_barrier > 260.0
        p = hybrid.price()
        assert 0 < p < 60.0

    def test_continuous_analytic_close_to_cn_fallback(self):
        hybrid = self._mk(n_desired_for_decision=2, n_lim_multiplier=1)
        S_eff = hybrid._escrowed_spot()
        p_analytic = hybrid._continuous_branch_analytic(S_eff)
        p_cn = hybrid._continuous_branch_cn(S_eff)
        assert p_analytic == pytest.approx(p_cn, rel=0.08)

    def test_knock_in_parity(self):
        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)]
        ko = self._mk(monitoring_dates=mons)
        ki = self._mk(monitoring_dates=mons, barrier_type="up-and-in")
        vanilla = ko._cn_price(None, None, {}, ko._escrowed_spot())
        assert ko.price() + ki.price() == pytest.approx(vanilla, rel=1e-6)

    def test_ki_rebate_far_barrier_is_rebate_pv(self):
        """Hybrid discrete branch: far-barrier KI(R) -> R*DF (the
        never-knocked-in leg). Regression: parity dropped the +R*DF term
        (reference discrete_barrier_analytic_pricer.py:545-552)."""
        import math

        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)]
        ki = self._mk(
            monitoring_dates=mons, barrier_type="up-and-in",
            upper_barrier=900.0, rebate_amount=5.0,
        )
        expected = 5.0 * math.exp(-ki.flat_rate_r * ki.tenor_years)
        assert ki.price() == pytest.approx(expected, rel=1e-3)

    def test_vega_moves_the_bgk_shift(self):
        """Continuous-window vega must reprice with the sigma-bumped BGK
        barrier shift (the reference bumps in place with a stale shift,
        discrete_barrier_analytic_pricer.py:573-607): the shifted barrier
        after greeks() must equal the base-sigma shift again (state
        restored), and vega is finite near the barrier."""
        kw = dict(spot=255.0, n_desired_for_decision=2, n_lim_multiplier=1)
        pr = self._mk(**kw)
        assert pr.use_continuous_window
        h0 = pr.bgk_upper_barrier
        g = pr.greeks()
        # state restored after the bumps
        assert pr.bgk_upper_barrier == pytest.approx(h0, rel=1e-15)
        # the REGRESSION LOCK: vega must equal a central FD across
        # freshly-CONSTRUCTED sigma-bumped pricers (whose __init__
        # recomputes the BGK window). A greeks() that bumps sigma in
        # place with a STALE window — the reference behavior — fails this
        # because the fresh pricers' windows move with sigma.
        dv = 1e-4
        p_up = self._mk(volatility=0.2879 + dv, **kw).price()
        p_dn = self._mk(volatility=0.2879 - dv, **kw).price()
        fd_vega = (p_up - p_dn) / (2 * dv)
        assert g["vega"] == pytest.approx(fd_vega, rel=1e-9), (
            g["vega"], fd_vega,
        )

    def test_direction_scaling(self):
        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)]
        long = self._mk(monitoring_dates=mons, quantity=10)
        short = self._mk(monitoring_dates=mons, quantity=10, direction="short")
        assert long.price() == pytest.approx(-short.price())


class TestRiskFunctions:
    @pytest.fixture(scope="class")
    def pricer(self):
        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)]
        return DiscreteBarrierFDMPricer(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT_1M,
            sigma=0.2879, option_type="call", barrier_type="up-and-out",
            upper_barrier=260.0, monitor_dates=mons,
            discount_curve=flat_curve(0.0731, VAL),
            num_space_nodes=200, num_time_steps=200,
        )

    def test_taylor_inside_domain(self, pricer):
        out = risk_reprice_spot(pricer, pricer.spot * 1.005)
        assert out["used_taylor_approx"]
        # Taylor price close to a full revaluation
        full = risk_reprice_spot(
            pricer, pricer.spot * 1.005, force_full_revaluation=True
        )
        assert out["result"] == pytest.approx(full["result"], rel=5e-3)

    def test_full_reval_outside_domain(self, pricer):
        out = risk_reprice_spot(pricer, pricer.spot * 1.10)
        assert not out["used_taylor_approx"]

    def test_scenario_and_curve(self, pricer):
        sc = risk_spot_scenario(pricer, pricer.spot * 1.002)
        assert np.isfinite([sc["price"], sc["delta"], sc["gamma"]]).all()
        curve = front_arena_style_spot_curve(
            pricer, [pricer.spot * m for m in (0.99, 1.0, 1.01, 1.2)]
        )
        assert curve["used_taylor"] == [True, True, True, False]
        assert len(curve["price"]) == 4


class TestOrderOfAccuracy:
    def test_smooth_first_order_model(self):
        """Synthetic solver err = C*dt (first order): p ~ 1."""
        exact = 10.0
        fn = lambda n: exact + 3.0 * (1.0 / n)
        fit = compute_empirical_order(fn, n_ladder=(40, 80, 160, 320, 640),
                                      richardson_reference=False)
        assert fit["order"] == pytest.approx(1.0, abs=0.05)

    def test_second_order_model(self):
        exact = 10.0
        fn = lambda n: exact + 5.0 * (1.0 / n) ** 2
        fit = compute_empirical_order(fn, n_ladder=(40, 80, 160, 320, 640),
                                      richardson_reference=False)
        assert fit["order"] == pytest.approx(2.0, abs=0.05)

    def test_verdict_consistent_and_exceeds(self):
        fn = lambda n: 10.0 + 5.0 * (1.0 / n) ** 2
        # FA at N=30 -> truncation ~ 5/900 = 0.0056
        d1 = diagnose_order_of_accuracy(fn, observed_difference=0.004,
                                        n_production=30,
                                        n_ladder=(40, 80, 160, 320, 640))
        assert d1["verdict"] == "CONSISTENT"
        d2 = diagnose_order_of_accuracy(fn, observed_difference=0.5,
                                        n_production=30,
                                        n_ladder=(40, 80, 160, 320, 640))
        assert d2["verdict"] == "EXCEEDS"


class TestBS2002:
    def test_single_step_matches_bs93(self):
        """The 2002 single-step with the 1993 boundary is BS93."""
        p93 = BjerksundStenslandOptionPricer(
            spot=100.0, strike=110.0, expiry=0.5, rate=0.08, vol=0.3,
            div_yield=0.12,
        ).price_put()
        p02 = BjerksundStensland2002Pricer().price(
            100.0, 110.0, 0.5, 0.08, 0.3, "put", q=0.12, method="single",
        )["price"]
        assert p02 == pytest.approx(p93, rel=1e-6)

    def test_two_step_above_single(self):
        """Two-step is a tighter (higher) lower bound than single-step."""
        pr = BjerksundStensland2002Pricer()
        common = dict(S=100.0, K=100.0, T=1.0, r=0.08, sigma=0.3, q=0.12)
        p1 = pr.price(
            common["S"], common["K"], common["T"], common["r"], common["sigma"],
            "call", q=common["q"], method="single",
        )["price"]
        p2 = pr.price(
            common["S"], common["K"], common["T"], common["r"], common["sigma"],
            "call", q=common["q"], method="two_step",
        )["price"]
        assert p2 >= p1 - 1e-9
        # and both above European
        euro = float(bs_price(100.0, 100.0, 0.3, 1.0, 0.08, 0.12, True))
        assert p1 >= euro - 1e-9

    def test_two_step_vs_binomial(self):
        from oracles import crr_american

        pr = BjerksundStensland2002Pricer()
        got = pr.price(100.0, 100.0, 1.0, 0.08, 0.3, "call", q=0.12,
                       method="two_step")["price"]
        oracle = crr_american(100.0, 100.0, 0.3, 1.0, 0.08, 0.08 - 0.12, True,
                              n_steps=4000)
        # BS2002's published accuracy is ~0.5% for deep-carry cases
        assert got == pytest.approx(oracle, rel=1e-2)

    def test_put_transform_and_greeks(self):
        pr = BjerksundStensland2002Pricer()
        g = pr.greeks(100.0, 110.0, 0.5, 0.08, 0.3, "put", method="two_step")
        assert -1.0 < g["delta"] < 0.0
        assert g["gamma"] > 0 and g["vega"] > 0

    def test_proxy_method(self):
        pr = BjerksundStensland2002Pricer()
        out = pr.price(100.0, 100.0, 1.0, 0.08, 0.3, "call", q=0.12,
                       method="proxy")
        p1 = pr.price(100.0, 100.0, 1.0, 0.08, 0.3, "call", q=0.12,
                      method="single")["price"]
        p2 = pr.price(100.0, 100.0, 1.0, 0.08, 0.3, "call", q=0.12,
                      method="two_step")["price"]
        assert out["price"] == pytest.approx(2 * p2 - p1, rel=1e-12)


class TestFISStencilPricer:
    from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricer2

    def _mk(self, **kw):
        from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricer2

        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)]
        base = dict(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT_1M,
            volatility=0.2879, option_type="call", barrier_type="up-and-out",
            upper_barrier=260.0, monitoring_dates=mons,
            flat_rate_nacc=0.0705, num_space_nodes=400, num_time_steps=400,
        )
        base.update(kw)
        return DiscreteBarrierFDMPricer2(**base)

    def test_vanilla_matches_closed_form(self):
        pr = self._mk(barrier_type="none", monitoring_dates=[])
        p = pr.price()
        euro = float(
            bs_price(229.74, 190.0, 0.2879, pr.tenor_years, 0.0705, 0.0, True)
        )
        assert p == pytest.approx(euro, rel=3e-3)

    def test_ko_below_vanilla_and_tracks_log_pricer(self):
        pr = self._mk()
        p2 = pr.price()
        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)]
        ref = DiscreteBarrierFDMPricer(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT_1M,
            sigma=0.2879, option_type="call", barrier_type="up-and-out",
            upper_barrier=260.0, monitor_dates=mons,
            discount_curve=flat_curve(0.0705, VAL),
            num_space_nodes=400, num_time_steps=400,
            underlying_spot_days=0,
        ).price_log2()
        # different grid policies (S-space vs log-S); agree within a few %
        assert p2 == pytest.approx(ref, rel=6e-2)
        vanilla = self._mk(barrier_type="none", monitoring_dates=[]).price()
        assert p2 < vanilla

    def test_in_out_parity(self):
        ko = self._mk()
        ki = self._mk(barrier_type="up-and-in")
        vanilla = self._mk(barrier_type="none", monitoring_dates=[]).price()
        # parity via the same engine's vanilla solve
        assert ko.price() + ki.price() == pytest.approx(vanilla, rel=2e-3)

    def test_nlim_continuous_window_and_fis_shift(self):
        n_days = (MAT_1M - VAL).days
        mons = [VAL + dt.timedelta(days=k) for k in range(1, n_days + 1)]
        pr = self._mk(monitoring_dates=mons, num_time_steps=4)
        # 31 daily monitors vs 4 time steps -> N_hat ~ 31 > 5*4=20
        assert pr.use_bgk_correction
        assert pr.bgk_upper > 260.0
        assert np.isfinite(pr.price())

    def test_barrier_greeks_near_barrier(self):
        """Spot close to the barrier exercises the one-sided/Gamma_lim
        path — checked in MAGNITUDE against bumps of price(), not just
        sign/finiteness (the assertion class that hid the 2.5x stencil
        bug). Gamma is a BLEND of the numerical stencil and the PDE-limit
        Gamma_lim, so its gate vs the pure FD second difference is loose."""
        spot = 255.0
        pr = self._mk(spot=spot)
        g = pr.greeks()
        assert g["delta"] < 0.0
        # an FD of price() across bumped pricers is unusable for gamma
        # (each pricer re-grids around its spot, and interpolation is
        # piecewise linear), so gate gamma against the production CN
        # engine on the SAME monitor schedule — both estimate the same
        # quantity; different stencils/grids make the gate loose
        from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricer
        from finite_difference_tpu.utils.curves import flat_curve

        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)]
        ref = DiscreteBarrierFDMPricer(
            spot=spot, strike=190.0, valuation_date=VAL,
            maturity_date=MAT_1M, sigma=0.2879, option_type="call",
            barrier_type="up-and-out", upper_barrier=260.0,
            monitor_dates=mons, discount_curve=flat_curve(0.0705, VAL),
            underlying_spot_days=0, num_time_steps=400,
        ).greeks_log2()
        # the FIS blend is a deliberately DIFFERENT estimator from true
        # gamma (50% numerical stencil + 50% PDE-limit Gamma_lim, the
        # reference's near-barrier regularization), so cross-engine
        # equality is not the contract — sign agreement plus a bounded
        # magnitude is (the 2.5x stencil-bug class flips neither)
        assert np.sign(g["gamma"]) == np.sign(ref["gamma"])
        assert 1e-4 < abs(g["gamma"]) < 0.2, g["gamma"]
        # vega magnitude vs fresh-constructed vol-bumped pricers. The
        # space grid is sized from the vol, so re-gridding noise swamps a
        # tiny bump (at dv=1e-4 the FD even flips sign); a wide bump
        # amortizes it. Near a KO barrier the call vega must be NEGATIVE
        # (more vol -> more knockouts).
        dv = 0.02
        v_up = self._mk(volatility=0.2879 + dv, spot=spot).price()
        v_dn = self._mk(volatility=0.2879 - dv, spot=spot).price()
        fd_vega = (v_up - v_dn) / (2 * dv)
        assert g["vega"] < 0 and fd_vega < 0
        # near-barrier vega is strongly convex in vol, so the fixed-grid
        # dv=0.01 estimator and the re-gridded wide-bump FD legitimately
        # differ ~2x; a factor band still catches sign and 10x-class bugs
        assert 0.3 < g["vega"] / fd_vega < 3.0, (g["vega"], fd_vega)

    def test_one_sided_delta_magnitude_matches_spot_bump(self):
        """The corrected second-order one-sided stencil must agree with a
        central spot-bump of price() in MAGNITUDE, not just sign — the
        reference's mistyped third node (discrete_barrier_fdm_pricer_2
        .py:511-543) made it ~2.5x the true delta and the old test only
        checked sign/finiteness."""
        spot = 255.0
        pr = self._mk(spot=spot)
        g = pr.greeks()
        h = 0.5
        up = self._mk(spot=spot + h).price()
        dn = self._mk(spot=spot - h).price()
        fd_delta = (up - dn) / (2.0 * h)
        assert g["delta"] == pytest.approx(fd_delta, rel=0.25), (
            g["delta"], fd_delta,
        )


class TestCrossCheckPricer:
    def test_crosscheck_vs_production(self):
        """The independent cross-check engine (QL when present, cn_log
        fallback) must agree with the production pricer within FD noise."""
        from finite_difference_tpu.models.pde import (
            MarketParams, QLDiscreteBarrierPricer, fis_time_steps,
        )

        assert fis_time_steps(24, 200, 4) == 200
        assert fis_time_steps(100, 200, 4) == 400

        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)] + [MAT_1M]
        xc = QLDiscreteBarrierPricer(
            MarketParams(spot=229.74, strike=190.0, sigma=0.2879,
                         rate_nacc=0.0705),
            is_call=True, barrier_type="up-and-out",
            monitoring_dates=mons, maturity_date=MAT_1M, barrier=260.0,
            valuation_date=VAL, grid_points=400, min_time_steps=400,
        )
        out = xc.price_and_greeks()
        prod = DiscreteBarrierFDMPricer(
            spot=229.74, strike=190.0, valuation_date=VAL, maturity_date=MAT_1M,
            sigma=0.2879, option_type="call", barrier_type="up-and-out",
            upper_barrier=260.0, monitor_dates=mons,
            discount_curve=flat_curve(0.0705, VAL),
            num_space_nodes=400, num_time_steps=400, underlying_spot_days=0,
        ).price_log2()
        assert out["price"] == pytest.approx(prod, rel=5e-2)

    def test_ki_parity_identity(self):
        from finite_difference_tpu.models.pde import (
            MarketParams, QLDiscreteBarrierPricer,
        )

        mons = [VAL + dt.timedelta(days=7 * k) for k in range(1, 5)]
        common = dict(
            market=MarketParams(spot=229.74, strike=190.0, sigma=0.2879,
                                rate_nacc=0.0705),
            is_call=True, monitoring_dates=mons, maturity_date=MAT_1M,
            barrier=260.0, valuation_date=VAL, grid_points=300,
            min_time_steps=300,
        )
        ko = QLDiscreteBarrierPricer(barrier_type="up-and-out", **common)
        ki = QLDiscreteBarrierPricer(barrier_type="up-and-in", **common)
        v = ko.price_vanilla_FD()["price"]
        assert ko.price_and_greeks()["price"] + ki.price_and_greeks()["price"] == (
            pytest.approx(v, rel=1e-9)
        )
