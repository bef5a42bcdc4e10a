"""Spectral sine-basis propagator vs the CN scan (exact-arithmetic twins)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from finite_difference_tpu.models.pde.grid import uniform_schedule
from finite_difference_tpu.models.pde.spectral import (
    spectral_intervals,
    spectral_solve,
    symmetrizer_exponent,
)
from finite_difference_tpu.models.pde.stepper import (
    BarrierSpec,
    CNDynamics,
    CNGrid,
    CNSchedule,
    cn_solve,
)


def _solve_both(
    *, S0=229.74, K=190.0, sig=0.2879, r=0.0705, b=None, q=0.0,
    is_call=True, T=1.0 / 12, n=64, R=2, n_nodes=129, monitors=6,
    lower=None, upper=260.0, rebate=0.0, rebate_at_hit=False,
    euro_put_lower=True, dx=2.0 / 128,
):
    b = r if b is None else b
    mon = [T * (k + 1) / monitors for k in range(monitors)] if monitors else []
    sch = uniform_schedule(T, n, R, mon)
    grid = CNGrid(jnp.float64(np.log(S0) - 1.0), jnp.float64(dx))
    dyn = CNDynamics(
        jnp.float64(K), jnp.bool_(is_call), jnp.float64(sig),
        jnp.float64(r), jnp.float64(b), jnp.float64(q),
    )
    bar = BarrierSpec(
        jnp.float64(lower if lower is not None else 0.0),
        jnp.float64(upper if upper is not None else 1e12),
        jnp.bool_(lower is not None),
        jnp.bool_(upper is not None),
        jnp.float64(rebate),
        jnp.bool_(rebate_at_hit),
        jnp.float64(b),
    )
    dev_sch = CNSchedule(
        *[jnp.asarray(getattr(sch, f))
          for f in ("dt", "theta", "tau_next", "monitor",
                    "div_amount", "reset_lambda")]
    )
    v_scan, s = cn_solve(
        grid, dyn, dev_sch, n_nodes, barrier=bar,
        euro_put_lower_boundary=euro_put_lower,
    )
    k_end, ap = spectral_intervals(sch.monitor)
    v_spec, _ = spectral_solve(
        grid, dyn, jnp.float64(T / n), jnp.asarray(k_end[0]),
        jnp.asarray(ap[0]), n_nodes, R, barrier=bar,
        euro_put_lower_boundary=euro_put_lower,
    )
    return np.asarray(v_scan), np.asarray(v_spec)


def _assert_close(v_scan, v_spec, tol=1e-9):
    scale = max(1.0, np.max(np.abs(v_scan)))
    assert np.max(np.abs(v_scan - v_spec)) / scale < tol


class TestSpectralVsScan:
    def test_up_out_call_with_rebate(self):
        _assert_close(*_solve_both(rebate=1.5))

    def test_up_out_call_rebate_at_hit(self):
        _assert_close(*_solve_both(rebate=2.0, rebate_at_hit=True))

    def test_down_out_put(self):
        _assert_close(
            *_solve_both(is_call=False, K=260.0, lower=200.0, upper=None)
        )

    def test_down_out_put_american_lower_boundary(self):
        _assert_close(
            *_solve_both(
                is_call=False, K=260.0, lower=200.0, upper=None,
                euro_put_lower=False,
            )
        )

    def test_double_barrier_call(self):
        _assert_close(*_solve_both(lower=180.0, upper=280.0, rebate=0.5))

    def test_carry_not_discount_with_yield(self):
        _assert_close(*_solve_both(b=0.03, q=0.015))

    def test_no_barrier_european(self):
        _assert_close(*_solve_both(upper=None, monitors=0))

    def test_put_no_barrier(self):
        _assert_close(
            *_solve_both(is_call=False, K=260.0, upper=None, monitors=0)
        )

    def test_monitor_at_first_step_splits_rannacher(self):
        # a monitor inside the Rannacher window: intervals mix theta=1/0.5
        T, n, R = 0.5, 40, 3
        mon = [T - 1.5 * T / n, T * 0.5, T * 0.25]  # one lands at step 1-2
        sch = uniform_schedule(T, n, R, mon)
        grid = CNGrid(jnp.float64(np.log(100.0) - 1.0), jnp.float64(2.0 / 64))
        dyn = CNDynamics(
            jnp.float64(100.0), jnp.bool_(True), jnp.float64(0.3),
            jnp.float64(0.05), jnp.float64(0.05), jnp.float64(0.0),
        )
        bar = BarrierSpec(
            jnp.float64(0.0), jnp.float64(130.0), jnp.bool_(False),
            jnp.bool_(True), jnp.float64(0.0), jnp.bool_(False),
            jnp.float64(0.05),
        )
        dev_sch = CNSchedule(
            *[jnp.asarray(getattr(sch, f))
              for f in ("dt", "theta", "tau_next", "monitor",
                        "div_amount", "reset_lambda")]
        )
        v_scan, _ = cn_solve(grid, dyn, dev_sch, 65, barrier=bar)
        k_end, ap = spectral_intervals(sch.monitor)
        v_spec, _ = spectral_solve(
            grid, dyn, jnp.float64(T / n), jnp.asarray(k_end[0]),
            jnp.asarray(ap[0]), 65, R, barrier=bar,
        )
        _assert_close(np.asarray(v_scan), np.asarray(v_spec))

    def test_fuzz_random_configs(self):
        rng = np.random.default_rng(11)
        for trial in range(10):
            is_call = bool(rng.integers(0, 2))
            K = float(rng.uniform(80, 120))
            kw = dict(
                S0=float(rng.uniform(80, 120)), K=K,
                sig=float(rng.uniform(0.15, 0.5)),
                r=float(rng.uniform(0.0, 0.1)),
                b=float(rng.uniform(-0.02, 0.1)),
                q=float(rng.uniform(0.0, 0.03)),
                is_call=is_call,
                T=float(rng.uniform(0.05, 1.5)),
                n=int(rng.integers(16, 100)),
                R=int(rng.integers(0, 4)),
                monitors=int(rng.integers(0, 12)),
                rebate=float(rng.uniform(0.0, 3.0)),
                rebate_at_hit=bool(rng.integers(0, 2)),
                upper=float(rng.uniform(125, 200)),
                lower=float(rng.uniform(40, 75)) if rng.integers(0, 2) else None,
                dx=float(rng.uniform(0.01, 0.03)),
            )
            v_scan, v_spec = _solve_both(**kw)
            scale = max(1.0, np.max(np.abs(v_scan)))
            err = np.max(np.abs(v_scan - v_spec)) / scale
            assert err < 1e-9, f"trial {trial}: rel err {err} for {kw}"


class TestBatchDriverRouting:
    def _batch(self, B=6, dtype=np.float64):
        from finite_difference_tpu.models.pde.batch import build_trade_batch

        rng = np.random.default_rng(3)
        T = 31.0 / 365.0
        return build_trade_batch(
            spots=list(rng.uniform(180.0, 250.0, B)),
            strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[T] * B,
            r=[0.0705] * B,
            b=[0.0705] * B,
            is_call=[True] * B,
            n_time_steps=48,
            monitor_times=[[T * (k + 1) / 8.0 for k in range(8)]] * B,
            upper=[260.0] * B,
            rebate=[1.0] * B,
            num_space_nodes=127,
            dtype=dtype,
        )

    def test_auto_routes_to_spectral_and_matches_scan(self):
        from finite_difference_tpu.models.pde.batch import (
            _spectral_layout,
            price_barrier_batch,
        )

        tb = self._batch()
        assert _spectral_layout(tb, 128) is not None
        out_auto = price_barrier_batch(tb, n_nodes=128, solver="auto")
        out_scan = price_barrier_batch(tb, n_nodes=128, solver="scan")
        for key in ("price", "delta", "gamma", "vega", "theta"):
            np.testing.assert_allclose(
                out_auto[key], out_scan[key], rtol=1e-8, atol=1e-10,
                err_msg=key,
            )

    def test_ad_vega_through_spectral(self):
        from finite_difference_tpu.models.pde.batch import price_barrier_batch

        tb = self._batch()
        out_ad = price_barrier_batch(
            tb, n_nodes=128, solver="spectral", greeks_mode="ad"
        )
        out_scan = price_barrier_batch(
            tb, n_nodes=128, solver="scan", greeks_mode="ad"
        )
        np.testing.assert_allclose(
            out_ad["vega"], out_scan["vega"], rtol=1e-7, atol=1e-10
        )

    def test_dividends_fall_back_to_scan(self):
        from finite_difference_tpu.models.pde.batch import (
            _spectral_layout,
            price_barrier_batch,
        )

        tb = self._batch()
        tb.div_amount = tb.div_amount.copy()
        tb.div_amount[:, 10] = 1.0
        assert _spectral_layout(tb, 128) is None
        with pytest.raises(ValueError):
            price_barrier_batch(tb, n_nodes=128, solver="spectral")
        out = price_barrier_batch(tb, n_nodes=128, solver="auto")
        assert np.isfinite(out["price"]).all()


class TestMonitorAlignedSchedules:
    """Per-interval dt (the reference CN auto-grid's '>= k steps per
    monitor interval' layouts) riding the spectral rung instead of
    falling back to the scan."""

    MONS = (0.13, 0.29, 0.55, 0.62, 0.91)  # irregular -> non-uniform dt

    def _batch(self, B=6, dtype=np.float64, lower=None, rebate=None,
               rebate_at_hit=None, mons=MONS, spi=7):
        from finite_difference_tpu.models.pde.batch import build_trade_batch

        rng = np.random.default_rng(5)
        T = 31.0 / 365.0
        return build_trade_batch(
            spots=list(rng.uniform(180.0, 250.0, B)),
            strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[T] * B,
            r=[0.0705] * B,
            b=[0.0705] * B,
            is_call=[True] * B,
            n_time_steps=48,
            monitor_times=[[T * f for f in mons]] * B,
            upper=[260.0] * B,
            lower=lower,
            rebate=rebate,
            rebate_at_hit=rebate_at_hit,
            num_space_nodes=127,
            dtype=dtype,
            monitor_aligned=True,
            steps_per_interval=spi,
        )

    def test_schedule_is_monitor_aligned(self):
        from finite_difference_tpu.models.pde.grid import (
            monitor_aligned_schedule,
        )

        T = 31.0 / 365.0
        sch = monitor_aligned_schedule(
            T, [T * f for f in self.MONS], steps_per_interval=7
        )
        # every monitor tau sits exactly on a step boundary, flagged
        taus = np.concatenate([[0.0], sch.tau_next])
        for f in self.MONS:
            tau_mon = T - T * f
            j = int(np.argmin(np.abs(taus - tau_mon)))
            assert abs(taus[j] - tau_mon) < 1e-12
            assert sch.monitor[j - 1]
        assert abs(sch.tau_next[-1] - T) < 1e-12
        # dt is genuinely non-uniform across intervals
        assert not np.all(sch.dt == sch.dt[0])

    def test_layout_accepts_piecewise_constant_dt(self):
        from finite_difference_tpu.models.pde.batch import _spectral_layout

        tb = self._batch()
        dt = np.asarray(tb.dt)
        assert not np.all(dt == dt[:, :1])  # non-uniform overall
        lay = _spectral_layout(tb, 128)
        assert lay is not None and lay[3] is not None
        # per-interval dts collected correctly: each equals the segment's
        k_end, _, _, sp_dt = lay
        k0 = 0
        for j in range(k_end.shape[1]):
            ke = int(k_end[0, j])
            if ke > k0:
                assert np.all(dt[0, k0:ke] == sp_dt[0, j])
            k0 = ke

    def test_truly_nonuniform_steps_still_rejected(self):
        from finite_difference_tpu.models.pde.batch import _spectral_layout

        tb = self._batch()
        tb.dt = tb.dt.copy()
        tb.dt[:, 1] *= 1.5  # break WITHIN-interval constancy
        assert _spectral_layout(tb, 128) is None

    def test_auto_routes_spectral_and_matches_scan(self):
        from finite_difference_tpu.models.pde.batch import (
            _spectral_layout,
            price_barrier_batch,
        )

        tb = self._batch()
        assert _spectral_layout(tb, 128) is not None
        out_auto = price_barrier_batch(tb, n_nodes=128, solver="auto")
        out_scan = price_barrier_batch(tb, n_nodes=128, solver="scan")
        for key in ("price", "delta", "gamma", "vega", "theta"):
            np.testing.assert_allclose(
                out_auto[key], out_scan[key], rtol=1e-8, atol=1e-10,
                err_msg=key,
            )

    def test_double_barrier_rebates_match_scan(self):
        from finite_difference_tpu.models.pde.batch import price_barrier_batch

        B = 6
        tb = self._batch(
            B=B, lower=[150.0] * B, rebate=[1.5] * B,
            rebate_at_hit=[True, False] * (B // 2),
        )
        out_sp = price_barrier_batch(tb, n_nodes=128, solver="spectral")
        out_scan = price_barrier_batch(tb, n_nodes=128, solver="scan")
        np.testing.assert_allclose(
            out_sp["price"], out_scan["price"], rtol=1e-8, atol=1e-10
        )

    def test_mixed_solver_rejects_nonuniform_dt(self):
        from finite_difference_tpu.models.pde.batch import price_barrier_batch

        tb = self._batch()
        with pytest.raises(ValueError, match="uniform dt"):
            price_barrier_batch(tb, n_nodes=128, solver="spectral_mixed")

    def test_x64dst_solver_through_public_driver(self):
        """The explicit ladder rungs attach the interval layout through
        price_barrier_batch too (previously only auto/spectral did)."""
        from finite_difference_tpu.models.pde.batch import price_barrier_batch

        tb = self._batch()  # non-uniform dt: x64dst supports it
        out = price_barrier_batch(
            tb, n_nodes=128, with_greeks=False, solver="spectral_x64dst"
        )
        ref = price_barrier_batch(
            tb, n_nodes=128, with_greeks=False, solver="scan"
        )
        np.testing.assert_allclose(
            out["price"], ref["price"], rtol=1e-7, atol=1e-9
        )

    def test_equal_intervals_stay_on_hoisted_uniform_path(self):
        from finite_difference_tpu.models.pde.batch import _spectral_layout

        # equally-spaced monitors -> every interval identical -> globally
        # uniform dt -> the hoisted fast path (sp_dt None)
        tb = self._batch(mons=(1 / 6, 2 / 6, 3 / 6, 4 / 6, 5 / 6))
        dt = np.asarray(tb.dt)
        assert np.allclose(dt, dt[:, :1])
        lay = _spectral_layout(tb, 128)
        assert lay is not None and lay[3] is None


class TestX64DstRescue:
    def test_f32_with_f64_dsts_reaches_scan_floor(self):
        """solver='spectral_x64dst' (f32 state, f64 DST contractions)
        matches the f64 oracle to the f32 scan's own rounding floor on
        CPU — the serving-mode rescue when f32 matmul accumulation is the
        binding noise source (docs/PERF_NOTES.md)."""
        from dataclasses import replace

        from finite_difference_tpu.models.pde.batch import (
            _spectral_layout,
            build_trade_batch,
            price_batch_kernel,
        )

        B, NS, NST = 32, 511, 256
        T = 31.0 / 365.0
        rng = np.random.default_rng(0)
        kw = dict(
            spots=list(rng.uniform(180.0, 250.0, B)), strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)), t_expiry=[T] * B,
            r=[0.0705] * B, b=[0.0705] * B, is_call=[True] * B,
            n_time_steps=NST,
            monitor_times=[[T * (k + 1) / 24.0 for k in range(24)]] * B,
            upper=[420.0] * B, num_space_nodes=NS,
        )

        def run(dtype, solver):
            tb = build_trade_batch(dtype=dtype, **kw)
            lay = _spectral_layout(tb, NS + 1, dtype)
            tb = replace(
                tb, sp_k_end=lay[0], sp_apply=lay[1], sp_rann=lay[2]
            )
            dev = jax.tree.map(jnp.asarray, tb)
            return np.asarray(
                price_batch_kernel(
                    dev, n_nodes=NS + 1, with_greeks=False, solver=solver
                )["price"]
            ).astype(np.float64)

        oracle = run(np.float64, "scan")
        p = run(np.float32, "spectral_x64dst")
        rel = np.max(np.abs(p - oracle) / oracle)
        assert rel < 1e-3, rel

    def test_mixed_transcendental_rescue_hits_the_state_floor(self):
        """solver='spectral_mixed' (f64 transcendentals + x64 DSTs + f32
        state) — the round-3 interval-refinement attempt (VERDICT item 6).

        MEASURED NEGATIVE RESULT, pinned: with every exp/log in f64 and
        exact matmuls, the error lands at ~1.8e-4 — the SAME order as
        x64dst (9.7e-5) — because the binding floor is the f32
        RESIDUAL-STATE roundtrip at the E-channel value scale (6e-8 x
        |E|~200 per interval, recurring at every monitor), NOT the
        transcendentals. Isolation: the f64 scan on the f32-QUANTIZED
        batch differs from the true-f64 oracle by only 5.7e-7, so the
        floor is solver-internal state rounding. No f32-state variant can
        reach the 1e-6 bar; the accuracy rung stays on full f64
        (docs/PERF_NOTES.md 'Precision ladder')."""
        from dataclasses import replace

        from finite_difference_tpu.models.pde.batch import (
            _spectral_layout,
            build_trade_batch,
            price_batch_kernel,
        )

        B, NS, NST = 16, 511, 256
        T = 31.0 / 365.0
        rng = np.random.default_rng(0)
        kw = dict(
            spots=list(rng.uniform(180.0, 250.0, B)), strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)), t_expiry=[T] * B,
            r=[0.0705] * B, b=[0.0705] * B, is_call=[True] * B,
            n_time_steps=NST,
            monitor_times=[[T * (k + 1) / 24.0 for k in range(24)]] * B,
            upper=[420.0] * B, num_space_nodes=NS,
        )

        def run(tb, dtype, solver):
            lay = _spectral_layout(tb, NS + 1, dtype)
            tb = replace(
                tb, sp_k_end=lay[0], sp_apply=lay[1], sp_rann=lay[2],
                sp_dt=lay[3],
            )
            dev = jax.tree.map(jnp.asarray, tb)
            return np.asarray(
                price_batch_kernel(
                    dev, n_nodes=NS + 1, with_greeks=False, solver=solver
                )["price"]
            ).astype(np.float64)

        tb32 = build_trade_batch(dtype=np.float32, **kw)
        oracle_q = run(tb32.astype(np.float64), np.float64, "scan")
        p = run(tb32, np.float32, "spectral_mixed")
        rel = np.max(np.abs(p - oracle_q) / oracle_q)
        # correct to the measured f32-state floor, NOT to 1e-6
        assert rel < 1e-3, rel
        assert rel > 1e-6  # documents that the bar is NOT met


class TestSymmetrizerGuard:
    def test_exponent_formula(self):
        # exponent ~ M |mu_x| dx / sigma^2
        e = symmetrizer_exponent(
            np.array([0.25]), np.array([0.05]), np.array([0.0]),
            np.array([0.01]), 130,
        )
        mu = 0.05 - 0.5 * 0.25**2
        assert np.isclose(
            e[0], 128 * abs(mu) * 0.01 / 0.25**2, rtol=1e-3
        )


class TestScheduleEdgeCases:
    """Review findings: schedule builders must reject or normalize
    degenerate inputs instead of emitting dt<=0 steps or dropping
    near-expiry monitors."""

    def test_segmented_schedule_filters_out_of_window_dividends(self):
        from finite_difference_tpu.models.pde.grid import segmented_schedule

        # tau=0 (ex-div at expiry) and tau>=T must be dropped, exactly
        # like AmericanFDMPricer._div_times_tau's open-interval filter —
        # a tau=0 dividend produced a dt=0 step (NaN in the IT update)
        sch = segmented_schedule(1.0, 32, [(0.0, 2.0), (1.0, 3.0), (1.5, 4.0)])
        assert (sch.dt > 0).all()
        assert sch.div_amount.sum() == 0.0
        sch2 = segmented_schedule(1.0, 32, [(0.0, 2.0), (0.4, 3.0)])
        assert (sch2.dt > 0).all()
        assert sch2.div_amount.sum() == 3.0

    def test_monitor_aligned_keeps_near_expiry_monitor(self):
        from finite_difference_tpu.models.pde.grid import (
            monitor_aligned_schedule,
            uniform_schedule,
        )

        # a monitor a hair after valuation (tau ~ T) merges into the
        # expiry boundary but must KEEP its projection, matching
        # uniform_schedule's final-step flag for the same input
        T = 1.0
        mal = monitor_aligned_schedule(T, [1e-13], steps_per_interval=8)
        uni = uniform_schedule(T, 8, monitor_times=[1e-13])
        assert mal.monitor[-1]
        assert uni.monitor[-1]

    def test_monitor_aligned_rejects_degenerate_expiry(self):
        from finite_difference_tpu.models.pde.grid import (
            monitor_aligned_schedule,
        )

        with pytest.raises(ValueError, match="too small"):
            monitor_aligned_schedule(1e-13, [1e-13])
