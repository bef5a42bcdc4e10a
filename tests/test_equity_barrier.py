"""EquityBarrierOption: PDE-surface netting-set instrument."""
import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.instruments.equity_barrier import EquityBarrierOption
from finite_difference_tpu.market_data.scenario_cube import ScenarioCube
from finite_difference_tpu.portfolio.netting_set import NettingSet, Trade
from finite_difference_tpu.xva.exposure_engine import ExposureEngine

VAL = dt.date(2025, 7, 28)
MAT = dt.date(2025, 10, 28)


def _monitor_dates(n=6):
    span = (MAT - VAL).days
    return [VAL + dt.timedelta(days=round(span * (k + 1) / (n + 1)))
            for k in range(n)]


def _cube(paths, dates):
    """Spot scalar cube from an explicit (n_times, n_paths) array."""
    return ScenarioCube(dates, {"EQ.SPOT": ("scalar", np.asarray(paths))})


def _opt(**kw):
    args = dict(
        name="ko",
        spot_name="EQ.SPOT",
        strike=100.0,
        maturity_date=MAT,
        sigma=0.3,
        rate=0.06,
        monitor_dates=_monitor_dates(),
        option_type="call",
        barrier_type="up-and-out",
        upper_barrier=130.0,
        n_time_steps=96,
        num_space_nodes=255,
    )
    args.update(kw)
    return EquityBarrierOption(**args)


class TestSurfacePricing:
    def test_t0_price_matches_batch_kernel(self):
        from finite_difference_tpu.models.pde.batch import (
            build_trade_batch,
            price_barrier_batch,
        )
        from finite_difference_tpu.utils.daycount import year_fraction

        n_paths = 4
        dates = [VAL + dt.timedelta(days=30 * i) for i in range(5)]
        paths = np.full((len(dates), n_paths), 100.0)
        opt = _opt()
        states = [{"EQ.SPOT": _cube(paths, dates).get_time_slice(i)["EQ.SPOT"]}
                  for i in range(len(dates))]
        opt.precompute(states, dates)
        npv = opt.scenario_npvs(VAL, states[0])

        t = year_fraction(VAL, MAT, "ACT/365")
        mon = [year_fraction(VAL, m, "ACT/365") for m in opt.monitor_dates]
        tb = build_trade_batch(
            spots=[100.0], strikes=[100.0], sigmas=[0.3], t_expiry=[t],
            r=[0.06], b=[0.06], is_call=[True], n_time_steps=96,
            monitor_times=[mon], upper=[130.0], num_space_nodes=255,
        )
        ref = price_barrier_batch(tb, n_nodes=256, with_greeks=False)["price"][0]
        np.testing.assert_allclose(npv, ref, rtol=1e-9)

    def test_requires_precompute(self):
        opt = _opt()
        dates = [VAL]
        paths = np.full((1, 2), 100.0)
        state = _cube(paths, dates).get_time_slice(0)
        with pytest.raises(RuntimeError):
            opt.scenario_npvs(VAL, state)


class TestEngineIntegration:
    def _paths(self, n_times, dates, crossing_path=True):
        """Path 0 crosses the 130 barrier at the 3rd monitor; path 1 stays
        near 100; path 2 drifts down."""
        n_paths = 3
        paths = np.full((n_times, n_paths), 100.0)
        paths[:, 2] = np.linspace(100.0, 80.0, n_times)
        if crossing_path:
            mon = _monitor_dates()[2]
            for t_idx, d in enumerate(dates):
                if d >= mon:
                    paths[t_idx, 0] = 140.0
        return paths

    def _run(self, opt, paths, dates):
        cube = _cube(paths, dates)
        engine = ExposureEngine(cube)
        prof = engine.compute(NettingSet("NS", [Trade(opt, "T1")]))
        return prof

    def _dates(self):
        # weekly grid that includes the monitor dates as scenario rows
        days = sorted(
            {0, 7, 14, 21, 28, 35, 42, 49, 56, 63, 70, 77, 84, 92, 99}
            | {(m - VAL).days for m in _monitor_dates()}
        )
        return [VAL + dt.timedelta(days=k) for k in days]

    def test_ko_paths_drop_to_rebate(self):
        dates = self._dates()
        paths = self._paths(len(dates), dates)
        opt = _opt(rebate=2.0, rebate_at_hit=False)
        prof = self._run(opt, paths, dates)
        mon = _monitor_dates()[2]
        post = [i for i, d in enumerate(dates) if mon <= d < MAT]
        from finite_difference_tpu.utils.daycount import year_fraction

        for i in post:
            tau = year_fraction(dates[i], MAT, "ACT/365")
            assert prof.mtm[0, i] == pytest.approx(
                2.0 * np.exp(-0.06 * tau), rel=1e-10
            ), f"date {dates[i]}"
            assert prof.mtm[1, i] > 0.5  # alive near-ATM path keeps value
        # at/after maturity everything is zero
        for i, d in enumerate(dates):
            if d >= MAT:
                assert (prof.mtm[:, i] == 0).all()

    def test_at_hit_rebate_settles_to_zero(self):
        dates = self._dates()
        paths = self._paths(len(dates), dates)
        opt = _opt(rebate=2.0, rebate_at_hit=True)
        prof = self._run(opt, paths, dates)
        mon = _monitor_dates()[2]
        post = [i for i, d in enumerate(dates) if mon <= d < MAT]
        assert all(prof.mtm[0, i] == 0.0 for i in post)

    def test_ki_rebate_far_barrier_is_pure_rebate_leg(self):
        """Up-and-in call with rebate, spot far below the barrier: touch
        probability ~0, so the KI MTM is ~ R*DF(tau) — the rebate pays at
        expiry iff the barrier is never touched (RR term E). Regression
        for the inverted contingency: the old leg added R*DF*P(touch),
        which vanishes here (it returned ~0 instead of ~R*DF)."""
        from finite_difference_tpu.utils.daycount import year_fraction

        dates = self._dates()
        n_times = len(dates)
        paths = np.full((n_times, 3), 40.0)  # deep below H=130, K=100
        opt = _opt(
            name="ki", barrier_type="up-and-in", rebate=2.0, sigma=0.15
        )
        prof = self._run(opt, paths, dates)
        for i, d in enumerate(dates):
            if d >= MAT:
                continue
            tau = year_fraction(d, MAT, "ACT/365")
            np.testing.assert_allclose(
                prof.mtm[:, i], 2.0 * np.exp(-0.06 * tau), rtol=5e-3,
                err_msg=f"date {d}",
            )

    def test_ki_rebate_parity_identity(self):
        """Exact surface identity on un-hit paths:
        KI(R) + KO(R at expiry) = vanilla + R*DF."""
        from finite_difference_tpu.models.analytic import generalized_bs_price
        from finite_difference_tpu.utils.daycount import year_fraction
        import jax.numpy as jnp

        dates = self._dates()
        paths = self._paths(len(dates), dates, crossing_path=False)
        ko = _opt(name="ko", rebate=2.0, rebate_at_hit=False)
        ki = _opt(name="ki", barrier_type="up-and-in", rebate=2.0)
        prof_ko = self._run(ko, paths, dates)
        prof_ki = self._run(ki, paths, dates)
        for i, d in enumerate(dates):
            if d >= MAT:
                continue
            tau = year_fraction(d, MAT, "ACT/365")
            bs = np.asarray(
                generalized_bs_price(
                    jnp.asarray(paths[i]), 100.0, 0.3, tau, 0.06, 0.06, True
                )
            )
            np.testing.assert_allclose(
                prof_ko.mtm[:, i] + prof_ki.mtm[:, i],
                bs + 2.0 * np.exp(-0.06 * tau),
                rtol=2e-3, atol=2e-3, err_msg=f"date {d}",
            )

    def test_in_out_parity_pathwise(self):
        from finite_difference_tpu.models.analytic import generalized_bs_price
        from finite_difference_tpu.utils.daycount import year_fraction
        import jax.numpy as jnp

        dates = self._dates()
        paths = self._paths(len(dates), dates)
        ko = _opt(name="ko")
        ki = _opt(name="ki", barrier_type="up-and-in")
        prof_ko = self._run(ko, paths, dates)
        prof_ki = self._run(ki, paths, dates)
        total = prof_ko.mtm + prof_ki.mtm
        # KO + KI = European vanilla, path-state independent
        for i, d in enumerate(dates):
            if d >= MAT:
                continue
            tau = year_fraction(d, MAT, "ACT/365")
            bs = np.asarray(
                generalized_bs_price(
                    jnp.asarray(paths[i]), 100.0, 0.3, tau, 0.06, 0.06, True
                )
            )
            np.testing.assert_allclose(
                total[:, i], bs, rtol=2e-3, atol=2e-3,
                err_msg=f"date {d}",
            )

    def test_american_position_in_netting_set(self):
        from finite_difference_tpu.instruments import AmericanOptionPosition
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch,
            price_american_batch,
        )
        from finite_difference_tpu.utils.daycount import year_fraction

        dates = self._dates()
        paths = self._paths(len(dates), dates, crossing_path=False)
        opt = AmericanOptionPosition(
            "amer", "EQ.SPOT", 100.0, MAT, 0.3, 0.06, option_type="put",
            n_time_steps=96, num_space_nodes=255,
        )
        prof = self._run(opt, paths, dates)
        assert np.isfinite(prof.mtm).all()
        # t=0 value matches the batched American pricer (same kernel)
        t = year_fraction(VAL, MAT, "ACT/365")
        tb = build_american_batch(
            spots=[100.0], strikes=[100.0], sigmas=[0.3], t_expiry=[t],
            r=[0.06], b=[0.06], is_call=[False], n_time_steps=96,
            num_space_nodes=255,
        )
        ref = price_american_batch(tb, n_nodes=256, with_greeks=False)
        np.testing.assert_allclose(prof.mtm[1, 0], ref["price"][0], rtol=1e-9)
        # intrinsic floor: American >= payoff pathwise at every date
        for i, d in enumerate(dates):
            if d >= MAT:
                continue
            intrinsic = np.maximum(100.0 - paths[i], 0.0)
            assert (prof.mtm[:, i] >= intrinsic - 1e-8).all(), d

    def test_double_barrier_and_down_types_build(self):
        """Down/double types: t=0 surface MTM must MATCH the production
        CN pricer (not just be finite/nonnegative — that passed even if
        lower_barrier was ignored), and a path that breaches the lower
        barrier at a monitor must die to zero."""
        from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricer
        from finite_difference_tpu.utils.curves import flat_curve

        dates = self._dates()
        paths = self._paths(len(dates), dates, crossing_path=False)
        for bt, kw in (
            ("down-and-out", dict(lower_barrier=75.0, upper_barrier=None)),
            ("double-out", dict(lower_barrier=75.0, upper_barrier=140.0)),
        ):
            opt = _opt(name=bt, barrier_type=bt, **kw)
            prof = self._run(opt, paths, dates)
            assert np.isfinite(prof.mtm).all()
            assert (prof.mtm[:, 0] >= 0).all()
            # t=0 value vs the scalar CN engine on the same schedule
            ref = DiscreteBarrierFDMPricer(
                spot=100.0, strike=100.0, valuation_date=VAL,
                maturity_date=MAT, sigma=0.3, option_type="call",
                barrier_type=bt, monitor_dates=_monitor_dates(),
                discount_curve=flat_curve(0.06, VAL),
                underlying_spot_days=0, num_time_steps=200,
                **{k: v for k, v in kw.items() if v is not None},
            ).price_log2()
            # different grid policies/resolutions: few-percent gate
            # (_opt defaults to quantity=1)
            assert prof.mtm[1, 0] == pytest.approx(ref, rel=6e-2), bt
        # a monitored breach of the LOWER barrier kills the position
        crash = paths.copy()
        mon = _monitor_dates()[2]
        for t_idx, d in enumerate(dates):
            if d >= mon:
                crash[t_idx, 0] = 60.0  # below 75 at the 3rd monitor
        opt = _opt(
            name="do-crash", barrier_type="down-and-out",
            lower_barrier=75.0, upper_barrier=None,
        )
        prof = self._run(opt, crash, dates)
        post = [i for i, d in enumerate(dates) if mon <= d < MAT]
        assert all(prof.mtm[0, i] == 0.0 for i in post)
