import numpy as np
import pytest
import jax
import jax.numpy as jnp

from finite_difference_tpu.models.pde.batch import build_trade_batch, price_batch_kernel
from finite_difference_tpu.models.pde.pallas_kernel import (
    cn_barrier_solve_hoisted,
    cn_barrier_solve_spike,
    price_barrier_batch_pallas,
)


@pytest.fixture(scope="module")
def small_batch():
    rng = np.random.default_rng(0)
    B = 8
    t = 31.0 / 365.0
    return build_trade_batch(
        spots=list(rng.uniform(180.0, 250.0, B)),
        strikes=[190.0] * B,
        sigmas=list(rng.uniform(0.2, 0.35, B)),
        t_expiry=[t] * B,
        r=[0.0705] * B,
        b=[0.0705] * B,
        is_call=[True] * B,
        n_time_steps=64,
        monitor_times=[[t * (k + 1) / 8.0 for k in range(8)]] * B,
        upper=[260.0] * B,
        num_space_nodes=255,
    )


class TestPallasCNKernel:
    def test_interpret_matches_xla_path(self, small_batch):
        """The fused kernel must reproduce the production cn_solve path
        bit-for-bit-ish (f64 interpret mode on CPU)."""
        dev = jax.tree.map(jnp.asarray, small_batch)
        ref = price_batch_kernel(dev, n_nodes=256, with_greeks=True)
        got = price_barrier_batch_pallas(
            small_batch, n_nodes=256, with_greeks=True, trade_block=8,
            interpret=True,
        )
        for k in ("price", "delta", "gamma", "vega", "theta"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-9, atol=1e-9,
                err_msg=k,
            )

    def test_hoisted_xla_variant_matches(self, small_batch):
        dev = jax.tree.map(jnp.asarray, small_batch)
        ref = price_batch_kernel(dev, n_nodes=256, with_greeks=False)
        v, s = cn_barrier_solve_hoisted(dev, dev.sigma, n_nodes=256, n_steps=64)
        price = np.asarray(jax.vmap(jnp.interp)(dev.s_eff, s, v))
        np.testing.assert_allclose(price, np.asarray(ref["price"]), rtol=1e-9)

    def test_rebate_at_expiry(self):
        """Rebate projection inside the kernel matches the stepper."""
        B = 8
        t = 0.25
        tb = build_trade_batch(
            spots=[100.0] * B,
            strikes=[100.0] * B,
            sigmas=[0.3] * B,
            t_expiry=[t] * B,
            r=[0.05] * B,
            b=[0.05] * B,
            is_call=[True] * B,
            n_time_steps=32,
            monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
            upper=[120.0] * B,
            rebate=[5.0] * B,
            num_space_nodes=127,
        )
        dev = jax.tree.map(jnp.asarray, tb)
        ref = price_batch_kernel(dev, n_nodes=128, with_greeks=False)
        got = price_barrier_batch_pallas(
            tb, n_nodes=128, with_greeks=False, trade_block=8, interpret=True
        )
        np.testing.assert_allclose(got["price"], np.asarray(ref["price"]), rtol=1e-9)
        # rebate floor: KO near-certain trades still worth ~PV(rebate)
        assert (np.asarray(got["price"]) > 0).all()


class TestPallasSpikeKernel:
    """SPIKE-partitioned chunk-Thomas kernel (pallas_kernel.py SPIKE
    section): the on-chip fast path for the batched CN sweep."""

    @pytest.mark.parametrize("p_chunks", [8, 16, 32])
    def test_interpret_matches_hoisted(self, small_batch, p_chunks):
        dev = jax.tree.map(jnp.asarray, small_batch)
        v_ref, _ = cn_barrier_solve_hoisted(dev, dev.sigma, n_nodes=256, n_steps=64)
        v, _ = cn_barrier_solve_spike(
            dev, dev.sigma, n_nodes=256, n_steps=64, trade_block=8,
            p_chunks=p_chunks, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(v_ref), rtol=1e-11, atol=1e-11
        )

    def test_rebate_and_double_barrier(self):
        """Rebate projection + both-barrier KO masks agree with the
        production scan path."""
        B = 8
        t = 0.25
        tb = build_trade_batch(
            spots=[100.0] * B,
            strikes=[100.0] * B,
            sigmas=[0.3] * B,
            t_expiry=[t] * B,
            r=[0.05] * B,
            b=[0.02] * B,
            is_call=[False] * (B // 2) + [True] * (B // 2),
            n_time_steps=32,
            monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
            lower=[80.0] * B,
            upper=[125.0] * B,
            rebate=[5.0] * B,
            num_space_nodes=127,
        )
        dev = jax.tree.map(jnp.asarray, tb)
        ref = price_batch_kernel(dev, n_nodes=128, with_greeks=False)
        v, s = cn_barrier_solve_spike(
            dev, dev.sigma, n_nodes=128, n_steps=32, trade_block=8,
            interpret=True,
        )
        price = np.asarray(jax.vmap(jnp.interp)(dev.s_eff, s, v))
        np.testing.assert_allclose(price, np.asarray(ref["price"]), rtol=1e-9)


class TestSpikeRouting:
    """price_barrier_batch routing into the SPIKE solver."""

    def _small(self, **kw):
        rng = np.random.default_rng(1)
        B = 8
        t = 0.25
        args = dict(
            spots=list(rng.uniform(90.0, 110.0, B)),
            strikes=[100.0] * B,
            sigmas=list(rng.uniform(0.2, 0.4, B)),
            t_expiry=[t] * B,
            r=[0.05] * B,
            b=[0.05] * B,
            is_call=[True] * B,
            n_time_steps=32,
            monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
            upper=[130.0] * B,
            num_space_nodes=127,
        )
        args.update(kw)
        return build_trade_batch(**args)

    def test_driver_spike_interpret_full_greeks_parity(self):
        from finite_difference_tpu.models.pde.batch import price_barrier_batch

        tb = self._small()
        ref = price_barrier_batch(tb, n_nodes=128, solver="scan")
        got = price_barrier_batch(tb, n_nodes=128, solver="spike_interpret")
        for k in ("price", "delta", "gamma", "vega", "theta"):
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-9, atol=1e-9, err_msg=k
            )

    def test_monitor_aligned_segmented_parity(self):
        """Per-interval-dt (monitor-aligned) schedules ride the SPIKE
        kernel as one pallas segment per (theta, dt) run and must agree
        with the scan to machine precision (f64 interpret)."""
        from finite_difference_tpu.models.pde.batch import (
            _spike_schedule,
            price_barrier_batch,
        )

        tb_ma = self._small(
            monitor_aligned=True, n_time_steps=40,
            monitor_times=[[0.02, 0.09, 0.13, 0.25]] * 8,
        )
        segments, set_defs, div_steps, reset_steps = _spike_schedule(
            tb_ma, 128
        )
        assert div_steps == () and reset_steps == ()
        # 4 unequal intervals (monitor at expiry) + the 2-step Rannacher
        # split -> >2 segments; Rannacher shares interval 1's dt but not
        # its theta, so it needs its own tensor set
        assert len(segments) >= 4
        assert len(set_defs) >= 4
        assert segments[0][0] == 0 and segments[-1][1] == tb_ma.dt.shape[1]
        ref = price_barrier_batch(tb_ma, n_nodes=128, solver="scan")
        got = price_barrier_batch(tb_ma, n_nodes=128, solver="spike_interpret")
        for k in ("price", "delta", "gamma", "vega", "theta"):
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-9, atol=1e-9, err_msg=k
            )

    def test_segment_set_dedup(self):
        """Equal-length monitor intervals share one solver-tensor set."""
        from finite_difference_tpu.models.pde.batch import _spike_schedule

        t = 0.25
        tb = self._small(
            monitor_aligned=True, n_time_steps=40,
            monitor_times=[[t / 4, t / 2, 3 * t / 4]] * 8,
        )
        segments, set_defs, _, _ = _spike_schedule(tb, 128)
        # equal intervals -> one dt value; sets = {theta=1, theta=0.5}
        assert len(set_defs) == 2
        assert {s[2] for s in segments} == {0, 1}

    def test_eligibility(self):
        from finite_difference_tpu.models.pde.batch import (
            _spike_eligible,
            price_barrier_batch,
        )

        assert _spike_eligible(self._small(), 128)
        # dividend columns ride as extra segment breaks; the BARRIER
        # route ignores them on both solvers (the scan's _solve_one
        # passes with_dividends=False) so parity must hold regardless
        from dataclasses import replace

        tb_div = self._small()
        div = np.asarray(tb_div.div_amount).copy()
        div[:, 5] = 1.0
        tb_div = replace(tb_div, div_amount=div)
        assert _spike_eligible(tb_div, 128)
        ref = price_barrier_batch(tb_div, n_nodes=128, solver="scan")
        got = price_barrier_batch(
            tb_div, n_nodes=128, solver="spike_interpret"
        )
        np.testing.assert_allclose(
            got["price"], ref["price"], rtol=1e-9, atol=1e-9
        )
        # a non-{1.0, 0.5} theta pattern stays ineligible
        tb_th = replace(
            self._small(), theta=np.asarray(self._small().theta) * 0.0 + 0.7
        )
        assert not _spike_eligible(tb_th, 128)
        with pytest.raises(ValueError, match="spike-eligible"):
            price_barrier_batch(tb_th, n_nodes=128, solver="spike_interpret")
        # ad-vega has no pallas AD rule
        with pytest.raises(ValueError, match="AD rule"):
            price_barrier_batch(
                self._small(), n_nodes=128, solver="spike_interpret",
                greeks_mode="ad",
            )


class TestF64FallbackRouting:
    """f64-on-TPU barrier batches that the spectral propagator can't
    take but the SPIKE schedule fits must route to the df64 kernel, not
    the x64-emulated scan (~6x slower). Backend and spectral layout are
    stubbed — the actual df64 kernel parity is pinned in TestDf64Spike."""

    def test_spectral_ineligible_routes_spike_df64(self, monkeypatch):
        from finite_difference_tpu.models.pde import batch as batch_mod

        rng = np.random.default_rng(7)
        B = 8
        t = 0.25
        tb = build_trade_batch(
            spots=list(rng.uniform(90.0, 110.0, B)),
            strikes=[100.0] * B,
            sigmas=[0.3] * B,
            t_expiry=[t] * B,
            r=[0.05] * B,
            b=[0.05] * B,
            is_call=[True] * B,
            n_time_steps=32,
            monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
            upper=[130.0] * B,
            num_space_nodes=127,
        )
        captured = {}

        def fake_driver(kernel, batch, n_nodes, dv_sigma, with_greeks,
                        mesh, axis_name, max_chunk, dtype, greeks_mode,
                        solver, **kw):
            captured["solver"] = solver
            return {}

        monkeypatch.setattr(
            batch_mod.jax, "default_backend", lambda: "tpu"
        )
        monkeypatch.setattr(batch_mod, "_run_batch_driver", fake_driver)
        monkeypatch.setattr(
            batch_mod, "_spectral_layout", lambda *a, **k: None
        )
        batch_mod.price_barrier_batch(tb, n_nodes=128, dtype=jnp.float64)
        assert captured["solver"] == "spike_df64"
        # ad-greeks have no pallas AD rule -> the scan keeps them
        batch_mod.price_barrier_batch(
            tb, n_nodes=128, dtype=jnp.float64, greeks_mode="ad"
        )
        assert captured["solver"] == "scan"
        # spike-ineligible too -> scan
        monkeypatch.setattr(
            batch_mod, "_spike_eligible", lambda *a, **k: False
        )
        batch_mod.price_barrier_batch(tb, n_nodes=128, dtype=jnp.float64)
        assert captured["solver"] == "scan"


class TestInspectionMemos:
    """Identity-keyed host-inspection memos must not serve stale results
    when any consulted batch field changes (review finding: the spectral
    memo key originally omitted batch.r)."""

    def test_spectral_memo_keys_on_r(self):
        from dataclasses import replace

        from finite_difference_tpu.models.pde.batch import (
            _spectral_layout,
            _spectral_layout_impl,
        )

        B = 4
        t = 0.5
        tb = build_trade_batch(
            spots=[100.0] * B, strikes=[100.0] * B, sigmas=[0.3] * B,
            t_expiry=[t] * B, r=[0.05] * B, b=[0.05] * B,
            is_call=[True] * B, n_time_steps=32,
            monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
            upper=[130.0] * B, num_space_nodes=127,
        )
        dev = jax.tree.map(jnp.asarray, tb)
        assert _spectral_layout(dev, 128) is not None
        # same schedule arrays, different r: the memo must re-inspect and
        # agree with the uncached impl (eligible or not)
        dev_r = replace(dev, r=dev.r * 0.0 + 40.0)
        cached = _spectral_layout(dev_r, 128)
        fresh = _spectral_layout_impl(dev_r, 128, None)
        assert (cached is None) == (fresh is None)

    def test_spike_memo_hits_and_misses(self):
        from dataclasses import replace

        from finite_difference_tpu.models.pde.batch import _spike_schedule

        B = 4
        t = 0.5
        tb = build_trade_batch(
            spots=[100.0] * B, strikes=[100.0] * B, sigmas=[0.3] * B,
            t_expiry=[t] * B, r=[0.05] * B, b=[0.05] * B,
            is_call=[True] * B, n_time_steps=32,
            monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
            upper=[130.0] * B, num_space_nodes=127,
        )
        dev = jax.tree.map(jnp.asarray, tb)
        s1 = _spike_schedule(dev, 128)
        assert s1 is not None and _spike_schedule(dev, 128) is s1
        # a changed theta array must invalidate (here: ineligible values)
        dev_t = replace(dev, theta=dev.theta * 0.0 + 0.7)
        assert _spike_schedule(dev_t, 128) is None

    def test_spike_default_segments_rejects_nonuniform_dt(self):
        """cn_barrier_solve_spike(segments=None) must refuse concrete
        monitor-aligned (piecewise-dt) schedules instead of silently
        pricing every step with dt[:, 0]."""
        B = 4
        t = 0.5
        tb = build_trade_batch(
            spots=[100.0] * B, strikes=[100.0] * B, sigmas=[0.3] * B,
            t_expiry=[t] * B, r=[0.05] * B, b=[0.05] * B,
            is_call=[True] * B,
            n_time_steps=24,
            monitor_times=[[0.13 * t, 0.55 * t, t]] * B,
            upper=[130.0] * B, num_space_nodes=127,
            monitor_aligned=True,
        )
        dt = np.asarray(tb.dt)
        assert not np.all(dt == dt[:, :1]), "fixture must be non-uniform"
        with pytest.raises(ValueError, match="globally-uniform"):
            cn_barrier_solve_spike(
                tb, jnp.asarray(tb.sigma), n_nodes=128,
                n_steps=dt.shape[1], trade_block=4, interpret=True,
            )


class TestSpikeFuzz:
    """Randomized barrier fuzz through the driver: random barrier side
    mixes (up/down/double/none), rebates (at-hit and at-expiry), calls
    and puts, random monitor counts — spike_interpret vs scan."""

    @pytest.mark.parametrize("seed", [11, 12, 13])
    def test_fuzz_random_barrier_batches(self, seed):
        from finite_difference_tpu.models.pde.batch import (
            build_trade_batch,
            price_barrier_batch,
        )

        rng = np.random.default_rng(seed)
        B = 8
        t = float(rng.uniform(0.1, 1.5))
        n_mon = int(rng.integers(2, 9))
        lower, upper = [], []
        for _ in range(B):
            kind = rng.integers(0, 4)
            lower.append(float(rng.uniform(60.0, 80.0)) if kind in (1, 3) else None)
            upper.append(float(rng.uniform(125.0, 160.0)) if kind in (2, 3) else None)
        tb = build_trade_batch(
            spots=list(rng.uniform(85.0, 115.0, B)),
            strikes=list(rng.uniform(90.0, 110.0, B)),
            sigmas=list(rng.uniform(0.15, 0.5, B)),
            t_expiry=[t] * B,
            r=list(rng.uniform(0.0, 0.1, B)),
            b=list(rng.uniform(-0.02, 0.1, B)),
            is_call=list(rng.integers(0, 2, B) == 1),
            n_time_steps=int(rng.integers(24, 80)),
            monitor_times=[[t * (k + 1) / n_mon for k in range(n_mon)]] * B,
            lower=lower,
            upper=upper,
            rebate=list(rng.uniform(0.0, 3.0, B)),
            rebate_at_hit=list(rng.integers(0, 2, B) == 1),
            num_space_nodes=int(rng.choice([127, 150, 202])),
        )
        n_nodes = int(rng.choice([128, 152, 204]))
        ref = price_barrier_batch(tb, n_nodes=n_nodes, solver="scan")
        got = price_barrier_batch(tb, n_nodes=n_nodes, solver="spike_interpret")
        for k in ("price", "delta", "gamma", "vega"):
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-8, atol=1e-8, err_msg=k
            )

    def test_fuzz_df64_random_barrier_batch(self):
        """One randomized mixed-barrier batch (same generator as above,
        reduced steps — interpret-mode df64 compiles the unrolled pair
        arithmetic) through the DOUBLE-FLOAT kernel: parity vs the true
        f64 scan at the df64 noise floor, not just the f32 floor."""
        from finite_difference_tpu.models.pde.batch import (
            build_trade_batch,
            price_barrier_batch,
        )

        rng = np.random.default_rng(41)
        B = 8
        t = float(rng.uniform(0.1, 1.0))
        n_mon = int(rng.integers(2, 7))
        lower, upper = [], []
        for _ in range(B):
            kind = rng.integers(0, 4)
            lower.append(float(rng.uniform(60.0, 80.0)) if kind in (1, 3) else None)
            upper.append(float(rng.uniform(125.0, 160.0)) if kind in (2, 3) else None)
        tb = build_trade_batch(
            spots=list(rng.uniform(85.0, 115.0, B)),
            strikes=list(rng.uniform(90.0, 110.0, B)),
            sigmas=list(rng.uniform(0.15, 0.5, B)),
            t_expiry=[t] * B,
            r=list(rng.uniform(0.0, 0.1, B)),
            b=list(rng.uniform(-0.02, 0.1, B)),
            is_call=list(rng.integers(0, 2, B) == 1),
            n_time_steps=16,
            monitor_times=[[t * (k + 1) / n_mon for k in range(n_mon)]] * B,
            lower=lower,
            upper=upper,
            rebate=list(rng.uniform(0.0, 3.0, B)),
            rebate_at_hit=list(rng.integers(0, 2, B) == 1),
            num_space_nodes=63,
        )
        ref = price_barrier_batch(tb, n_nodes=64, solver="scan")
        got = price_barrier_batch(tb, n_nodes=64, solver="spike_df64_interpret")
        for k in ("price", "delta", "gamma", "vega"):
            tol = 2e-9 if k == "vega" else 3e-11
            np.testing.assert_allclose(
                got[k], ref[k], rtol=tol, atol=tol, err_msg=k
            )


class TestAmericanSpike:
    """price_american_batch routing into the SPIKE solver (fused
    Ikonen-Toivanen projection, pallas_kernel.py american=True)."""

    def _batch(self, dividends_tau=None, **kw):
        B = 8
        args = dict(
            spots=[90.0 + 2 * i for i in range(B)],
            strikes=[100.0] * B,
            sigmas=[0.15 + 0.02 * i for i in range(B)],
            t_expiry=[0.25, 0.5, 1.0, 1.5, 0.75, 1.0, 2.0, 0.3],
            r=[0.06] * B,
            b=[0.06, 0.04, 0.06, 0.02, 0.06, 0.05, 0.06, 0.03],
            is_call=[True, False] * 4,
            n_time_steps=64,
            num_space_nodes=202,
            dividends_tau=dividends_tau,
        )
        args.update(kw)
        from finite_difference_tpu.models.pde.batch import build_american_batch

        return build_american_batch(**args)

    def test_interpret_parity_vs_scan(self):
        """Mixed calls/puts, per-trade maturities and carries: the fused
        IT projection must agree with the scan path (f64 interpret)."""
        from finite_difference_tpu.models.pde.batch import price_american_batch

        tb = self._batch()
        ref = price_american_batch(tb, n_nodes=202, solver="scan")
        got = price_american_batch(tb, n_nodes=202, solver="spike_interpret")
        for k in ("price", "delta", "gamma", "vega"):
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-9, atol=1e-9, err_msg=k
            )
        # early-exercise premium is real: deep ITM put >= intrinsic
        put_itm = np.asarray(got["price"])[1]  # spot 92, strike 100
        assert put_itm >= 100.0 - 92.0

    @pytest.mark.parametrize("is_call", [False, True])
    def test_dividends_spike_parity(self, is_call):
        """Discrete cash dividends ride the SPIKE route as extra
        segments with the natural-cubic-spline jump (and the American-
        call ex-div exercise check) applied between pallas launches —
        must match the scan's in-step with_dividends machinery
        (fd_american_equity.py:732-827 semantics)."""
        from finite_difference_tpu.models.pde.batch import (
            _spike_eligible,
            _spike_schedule,
            price_american_batch,
        )

        assert _spike_eligible(self._batch(), 202)
        tb_div = self._batch(
            dividends_tau=[[(0.1, 1.5), (0.6, 1.0)]] * 8,
            t_expiry=[1.0] * 8,
            is_call=[is_call] * 8,
        )
        sched = _spike_schedule(tb_div, 202)
        assert sched is not None, "dividend batch must be spike-eligible"
        _, _, div_steps, reset_steps = sched
        assert len(div_steps) == 2 and len(reset_steps) >= 1
        ref = price_american_batch(tb_div, n_nodes=202, solver="scan")
        got = price_american_batch(
            tb_div, n_nodes=202, solver="spike_interpret"
        )
        for k in ("price", "delta", "gamma", "vega"):
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-9, atol=1e-9, err_msg=k
            )

    def test_auto_on_cpu_is_scan(self):
        """solver='auto' off-TPU must take the scan (and match it)."""
        from finite_difference_tpu.models.pde.batch import price_american_batch

        tb = self._batch()
        ref = price_american_batch(tb, n_nodes=202, solver="scan")
        got = price_american_batch(tb, n_nodes=202)  # default auto
        for k in ("price", "delta", "gamma", "vega"):
            np.testing.assert_allclose(got[k], ref[k], rtol=0, err_msg=k)

    def test_spike_ignores_max_chunk(self):
        """SPIKE has no HBM working-set cliff: the driver must run one
        launch even when B > max_chunk (chunking measured ~2x slower),
        and still match the (chunked) scan."""
        from finite_difference_tpu.models.pde.batch import price_american_batch

        tb = self._batch()
        ref = price_american_batch(tb, n_nodes=202, solver="scan")
        got = price_american_batch(
            tb, n_nodes=202, solver="spike_interpret", max_chunk=3
        )
        for k in ("price", "delta", "gamma", "vega"):
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-9, atol=1e-9, err_msg=k
            )

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_fuzz_random_batches(self, seed):
        """Randomized spike-vs-scan parity: random moneyness/vol/carry/
        maturity mixes, random step counts, calls and puts."""
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch,
            price_american_batch,
        )

        rng = np.random.default_rng(seed)
        B = 8
        n_steps = int(rng.integers(16, 96))
        tb = build_american_batch(
            spots=list(rng.uniform(60.0, 160.0, B)),
            strikes=list(rng.uniform(80.0, 120.0, B)),
            sigmas=list(rng.uniform(0.1, 0.6, B)),
            t_expiry=list(rng.uniform(0.1, 2.5, B)),
            r=list(rng.uniform(0.0, 0.12, B)),
            b=list(rng.uniform(-0.05, 0.12, B)),
            is_call=list(rng.integers(0, 2, B) == 1),
            n_time_steps=n_steps,
            num_space_nodes=int(rng.choice([150, 202, 254])),
        )
        # solve width drawn independently so the kernel pad path
        # (n_int % P != 0) and the exact-fit path both get exercised
        n_nodes = int(rng.choice([152, 202, 256]))
        ref = price_american_batch(tb, n_nodes=n_nodes, solver="scan")
        got = price_american_batch(
            tb, n_nodes=n_nodes, solver="spike_interpret"
        )
        for k in ("price", "delta", "gamma", "vega"):
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-8, atol=1e-8, err_msg=k
            )


class TestDf64Spike:
    """The double-float SPIKE variant (cn_barrier_solve_spike(df64=True))
    — the on-chip <=1e-6 accuracy rung. Interpret-mode runs execute the
    REAL double-float arithmetic (the kernel pins jnp.float32 pairs
    regardless of x64), so parity vs the true-f64 scan here bounds the
    method error itself: ~1e-11, five orders inside the rung's 1e-6 bar.
    Shapes are kept small (64 nodes / 16 steps): the interpret-mode
    emulation of the unrolled double-float loops compiles in O(minutes)
    at production widths — on-chip production-shape parity is pinned by
    the bench's f64 oracle comparison instead."""

    def test_american_df64_dividends_parity_vs_scan(self):
        """Mixed spots/vols American puts WITH discrete dividends (mixed
        call/put dividend batches differ in Rannacher restarts and are
        scan-only by design): the df64 kernel segments + true-f64 spline
        jump between pallas launches must match the f64 scan at the df64
        noise floor."""
        from finite_difference_tpu.models.pde.batch import (
            _spike_schedule,
            build_american_batch,
            price_american_batch,
        )

        B = 8
        tb = build_american_batch(
            spots=[90.0 + 2 * i for i in range(B)],
            strikes=[100.0] * B,
            sigmas=[0.15 + 0.02 * i for i in range(B)],
            t_expiry=[1.0] * B,
            r=[0.06] * B,
            b=[0.06, 0.04, 0.06, 0.02, 0.06, 0.05, 0.06, 0.03],
            is_call=[False] * B,
            n_time_steps=16,
            num_space_nodes=63,
            dividends_tau=[[(0.3, 1.5)]] * B,
        )
        assert _spike_schedule(tb, 64) is not None
        ref = price_american_batch(tb, n_nodes=64, solver="scan")
        got = price_american_batch(
            tb, n_nodes=64, solver="spike_df64_interpret"
        )
        for k in ("price", "delta", "gamma", "vega"):
            # vega is a one-sided bump of two solves: the 1/dv=1e4
            # amplification of the ~1e-12 df64 solve noise puts its
            # floor near 5e-11 (still 3 orders inside the 1e-6 rung)
            tol = 2e-9 if k == "vega" else 3e-11
            np.testing.assert_allclose(
                got[k], ref[k], rtol=tol, atol=tol, err_msg=k
            )

    def test_barrier_df64_parity_vs_scan(self):
        """Discrete-barrier batches (rebates, KO projection) through the
        df64 kernel match the f64 scan at the double-float noise floor."""
        from finite_difference_tpu.models.pde.batch import (
            build_trade_batch,
            price_barrier_batch,
        )

        rng = np.random.default_rng(3)
        B = 8
        t = 0.5
        tb = build_trade_batch(
            spots=list(rng.uniform(180.0, 250.0, B)),
            strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[t] * B,
            r=[0.0705] * B,
            b=[0.0705] * B,
            is_call=[True] * B,
            n_time_steps=16,
            monitor_times=[[t * (k + 1) / 8.0 for k in range(8)]] * B,
            upper=[260.0] * B,
            rebate=list(rng.uniform(0.0, 3.0, B)),
            num_space_nodes=63,
        )
        ref = price_barrier_batch(tb, n_nodes=64, solver="scan")
        got = price_barrier_batch(
            tb, n_nodes=64, solver="spike_df64_interpret"
        )
        for k in ("price", "delta", "gamma", "vega"):
            # vega is a one-sided bump of two solves: the 1/dv=1e4
            # amplification of the ~1e-12 df64 solve noise puts its
            # floor near 5e-11 (still 3 orders inside the 1e-6 rung)
            tol = 2e-9 if k == "vega" else 3e-11
            np.testing.assert_allclose(
                got[k], ref[k], rtol=tol, atol=tol, err_msg=k
            )


class TestPallasCRKernel:
    def test_cr_level_coeffs_solve_matches_thomas(self):
        """The packed scalar-class CR coefficients reproduce
        thomas_solve_const to machine precision."""
        import math

        from finite_difference_tpu.models.pde.pallas_cr import cr_level_coeffs
        from finite_difference_tpu.ops.tridiag import thomas_solve_const

        rng = np.random.default_rng(0)
        n = 64
        a_l = jnp.asarray(rng.uniform(-0.5, -0.3, 4))
        a_c = jnp.asarray(rng.uniform(1.8, 2.2, 4))
        a_u = jnp.asarray(rng.uniform(-0.5, -0.3, 4))
        d = rng.normal(size=(4, n))
        want = np.asarray(thomas_solve_const(a_l, a_c, a_u, jnp.asarray(d)))
        lv = np.asarray(cr_level_coeffs(a_l, a_c, a_u, n))
        n_levels = int(math.log2(n))
        for t in range(4):
            dv = d[t].copy()
            stack = []
            for lev in range(n_levels):
                evens, odds = dv[0::2].copy(), dv[1::2].copy()
                stack.append(evens)
                half = len(evens)
                ev_up = np.concatenate([evens[1:], [0.0]])
                alpha = np.full(half, lv[lev, 1, t])
                alpha[0] = lv[lev, 0, t]
                alpha[-1] = lv[lev, 2, t]
                gamma = np.full(half, lv[lev, 4, t])
                gamma[0] = lv[lev, 3, t]
                gamma[-1] = lv[lev, 5, t]
                dv = odds - alpha * evens - gamma * ev_up
            x = dv / lv[0, 15, t]
            for lev in range(n_levels - 1, -1, -1):
                evens = stack.pop()
                half = len(evens)
                x_lo = np.concatenate([[0.0], x[:-1]])
                ae = np.full(half, lv[lev, 7, t]); ae[0] = lv[lev, 6, t]; ae[-1] = lv[lev, 8, t]
                be = np.full(half, lv[lev, 10, t]); be[0] = lv[lev, 9, t]; be[-1] = lv[lev, 11, t]
                ce = np.full(half, lv[lev, 13, t]); ce[0] = lv[lev, 12, t]; ce[-1] = lv[lev, 14, t]
                x_even = (evens - ae * x_lo - ce * x) / be
                out = np.empty(2 * half)
                out[0::2] = x_even
                out[1::2] = x
                x = out
            np.testing.assert_allclose(x, want[t], atol=1e-10)

    def test_cr_kernel_interpret_matches_xla(self):
        from finite_difference_tpu.models.pde.pallas_cr import (
            cn_barrier_solve_pallas_cr,
        )

        rng = np.random.default_rng(0)
        B = 8
        t = 31.0 / 365.0
        tb = build_trade_batch(
            spots=list(rng.uniform(180.0, 250.0, B)),
            strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[t] * B, r=[0.0705] * B, b=[0.0705] * B,
            is_call=[True] * B, n_time_steps=64,
            monitor_times=[[t * (k + 1) / 8.0 for k in range(8)]] * B,
            upper=[260.0] * B, num_space_nodes=129,  # 130 nodes, interior 128
        )
        dev = jax.tree.map(jnp.asarray, tb)
        ref = price_batch_kernel(dev, n_nodes=130, with_greeks=False)
        v, s = cn_barrier_solve_pallas_cr(
            dev, dev.sigma, n_nodes=130, n_steps=64, trade_block=8,
            interpret=True,
        )
        price = np.asarray(jax.vmap(jnp.interp)(dev.s_eff, s, v))
        np.testing.assert_allclose(price, np.asarray(ref["price"]), atol=1e-9)

    def test_cr_requires_power_of_two_interior(self):
        from finite_difference_tpu.models.pde.pallas_cr import (
            cn_barrier_solve_pallas_cr,
        )

        rng = np.random.default_rng(0)
        tb = build_trade_batch(
            spots=[100.0] * 8, strikes=[100.0] * 8, sigmas=[0.3] * 8,
            t_expiry=[0.25] * 8, r=[0.05] * 8, b=[0.05] * 8,
            is_call=[True] * 8, n_time_steps=16, monitor_times=[[]] * 8,
            num_space_nodes=99,
        )
        dev = jax.tree.map(jnp.asarray, tb)
        with pytest.raises(ValueError, match="power of two"):
            cn_barrier_solve_pallas_cr(
                dev, dev.sigma, n_nodes=100, n_steps=16, trade_block=8,
                interpret=True,
            )
