"""Benchmark: batched 1024x512 Crank-Nicolson barrier grids/sec per chip.

Prints ONE JSON line covering the WHOLE north-star sentence
(BASELINE.json: ">=10k batched 1024x512 CN barrier grids/sec on a v5p-8
with <=1e-6 rel err vs the CPU reference"; 8 chips -> 1250 grids/s/chip):

  - f32 throughput rung (price-only, the headline `value`),
  - f32 greeks rung (price+delta+gamma+vega+theta via one-sided sigma bump),
  - f64 accuracy rung: throughput AND max rel err vs an f64 CPU oracle of
    the SAME trades/grids (must show <=1e-6),
  - f64 GREEKS rung — the reference's production workload
    (price+delta+gamma+vega+theta, run_config_scenarios.py:106-133) with
    AD vega, vs the CPU oracle's greeks (must show <=1e-6),
  - far-barrier European-limit cross-check vs Black-76 closed form,
  - subsystem rungs: batched analytic sweep (trades/s), device-resident
    exposure (NPVs/s), HW1F scenario->exposure->CVA pipeline (NPVs/s).

Stages run in subprocesses so each gets the right jax config before
backend init (x64 for the f64 rung; forced-cpu for the oracle — the
preloaded TPU plugin ignores JAX_PLATFORMS, so the oracle re-execs with
jax.config.update('jax_platforms','cpu') like tests/conftest.py).
Timing note: on the tunneled TPU platform block_until_ready does not
reliably block, so every timed iteration materializes to host (np.asarray).

The orchestrator (run_bench) is kill-proof: the merged JSON line is
re-printed after EVERY completed stage (the last stdout line is always
the best-so-far artifact), stages run in north-star priority order under
a global wall-clock budget (env BENCH_DEADLINE_S, default 1500s;
skipped stages are recorded), failed stages record an error and the run
continues, and a persistent XLA compile cache (.jax_bench_cache)
amortizes the large f64 compiles across stages and rounds.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _on_tpu() -> bool:
    """Backend-init gate shared by every stage. BENCH_FORCE_CPU (set by the
    parent when the device probe fails — e.g. a dead tunnel that hangs
    init forever) forces the CPU platform BEFORE the first backend touch,
    so a downed TPU still produces an honest artifact instead of none."""
    import jax

    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        return False
    on = any(d.platform == "tpu" for d in jax.devices())
    if not on:
        jax.config.update("jax_platforms", "cpu")
    return on


N_SPACE_NODES = 1023  # -> 1024 grid nodes
N_STEPS = 512
T_EXP = 31.0 / 365.0
BASELINE_PER_CHIP = 1250.0  # 10k grids/s on v5p-8 / 8 chips


def make_batch(B: int, dtype):
    """The benchmark trade set (seeded): 1-month up-and-out calls, 24 daily
    monitors, far barrier H=420 so the European limit is a closed form.
    The spectral interval layout is attached so kernels can run either
    solver ('spectral' is the production default via price_barrier_batch).

    Draws are taken at the full bench size then sliced so any B is a
    PREFIX of the same trade set — the f64 CPU oracle can then run at
    BENCH_ORACLE_B trades and compare against the first trades of the
    device rungs (the oracle stage was the bench's single slowest stage
    at B=1024, ~6 min on this host)."""
    from dataclasses import replace

    from finite_difference_tpu.models.pde.batch import (
        _spectral_layout,
        build_trade_batch,
    )

    rng = np.random.default_rng(0)
    spots_all = rng.uniform(180.0, 250.0, 4096)
    sigmas_all = rng.uniform(0.2, 0.35, 4096)
    spots = spots_all[:B]
    sigmas = sigmas_all[:B]
    monitors = [[T_EXP * (k + 1) / 24.0 for k in range(24)]] * B
    tb = build_trade_batch(
        spots=spots,
        strikes=[190.0] * B,
        sigmas=list(sigmas),
        t_expiry=[T_EXP] * B,
        r=[0.0705] * B,
        b=[0.0705] * B,
        is_call=[True] * B,
        n_time_steps=N_STEPS,
        monitor_times=monitors,
        upper=[420.0] * B,
        num_space_nodes=N_SPACE_NODES,
        dtype=dtype,
    )
    lay = _spectral_layout(tb, N_SPACE_NODES + 1, dtype)
    assert lay is not None, "bench config must be spectral-eligible"
    tb = replace(
        tb, sp_k_end=lay[0], sp_apply=lay[1], sp_rann=lay[2], sp_dt=lay[3]
    )
    return tb, spots, sigmas


def _timed_kernel(
    dev,
    with_greeks: bool,
    iters: int,
    solver: str = "scan",
    greeks_mode: str = "bump",
    dv_sigma=None,
):
    """(stacked outputs, elapsed). Output row order with greeks:
    [price, vega, delta, gamma, theta] (price_batch_kernel's dict order,
    identical for 'bump' and 'ad' modes); price-only: [price]."""
    import jax
    import jax.numpy as jnp
    from finite_difference_tpu.models.pde.batch import price_batch_kernel

    # Materialize EVERY output (stacked into one array) so XLA cannot
    # dead-code-eliminate the greeks solves when only price is read.
    fn = jax.jit(
        lambda b: jnp.stack(
            list(
                price_batch_kernel(
                    b,
                    n_nodes=N_SPACE_NODES + 1,
                    with_greeks=with_greeks,
                    greeks_mode=greeks_mode,
                    solver=solver,
                    dv_sigma=dv_sigma,
                ).values()
            )
        )
    )
    out = np.asarray(fn(dev))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn(dev))
    return out, time.perf_counter() - t0


def stage_f32(out_path: str, greeks_path: str = None) -> None:
    import jax

    on_tpu = _on_tpu()
    import jax.numpy as jnp

    # headline = the production auto-routing: on TPU the f32 path runs
    # the fused SPIKE pallas kernel (price_barrier_batch solver='auto'
    # routes there for this uniform-dt batch — 3.5x the XLA scan kernel,
    # identical math; models/pde/pallas_kernel.py). The whole march is
    # VMEM-resident, so unlike the scan it has NO HBM working-set cliff:
    # the headline runs one B=4096 launch. The scan and spectral
    # diagnostics run at their cliff-bound B=1024; spectral carries its
    # own accuracy field (TPU f32 matmul accumulation noise ~1e-2,
    # docs/PERF_NOTES.md).
    B = 4096 if on_tpu else 16
    B_diag = 1024 if on_tpu else 16
    iters = 8 if on_tpu else 1
    d_iters = 10 if on_tpu else 1
    g_iters = 4 if on_tpu else 1
    main_solver = "spike" if on_tpu else "scan"
    tb, spots, sigmas = make_batch(B, np.float32 if on_tpu else np.float64)
    dev = jax.tree.map(jnp.asarray, tb)

    out, elapsed = _timed_kernel(
        dev, with_greeks=False, iters=iters, solver=main_solver
    )
    p_np = out[0]
    grids_per_sec = B * iters / elapsed

    g_out, g_elapsed = _timed_kernel(
        dev, with_greeks=True, iters=g_iters, solver=main_solver
    )
    greeks_grids_per_sec = B * g_iters / g_elapsed
    if greeks_path:
        # first ORACLE_B trades of the (5, B) greeks stack — compared by
        # the orchestrator against the f64 CPU oracle's greeks (the f32
        # greeks error a throughput-rung user would actually ship)
        n_keep = int(os.environ.get("BENCH_ORACLE_B", "256"))
        np.save(greeks_path, g_out[:, :n_keep].astype(np.float64))

    if on_tpu:
        tb_d, spots_d, sigmas_d = make_batch(B_diag, np.float32)
        dev_d = jax.tree.map(jnp.asarray, tb_d)
    else:
        tb_d, spots_d, sigmas_d = tb, spots, sigmas
        dev_d = dev
    if on_tpu:
        _, sc_elapsed = _timed_kernel(
            dev_d, with_greeks=False, iters=d_iters, solver="scan"
        )
        scan_grids_per_sec = B_diag * d_iters / sc_elapsed
    else:
        scan_grids_per_sec = grids_per_sec

    sp_out, sp_elapsed = _timed_kernel(
        dev_d, with_greeks=False, iters=d_iters, solver="spectral"
    )
    sp_np = sp_out[0]
    spectral_grids_per_sec = B_diag * d_iters / sp_elapsed

    # the PRODUCT mesh path: price_barrier_batch(mesh=...) routes to the
    # shard_mapped SPIKE kernel (round 5) — measured through the full
    # driver on a 1-device mesh of the real chip, proving the mesh API
    # carries the kernel rate (the per-chip share of an N-chip run)
    mesh_spike_grids_per_sec = None
    mesh_spike_cold = None
    if on_tpu:
        from finite_difference_tpu.models.pde.batch import (
            price_barrier_batch,
        )
        from finite_difference_tpu.parallel import make_mesh

        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh1 = make_mesh(1, axis_names=("data",))
        m_out = price_barrier_batch(
            tb, n_nodes=N_SPACE_NODES + 1, with_greeks=False, mesh=mesh1
        )  # warm; auto routes to spike via shard_map
        t0 = time.perf_counter()
        m_iters = 4
        for _ in range(m_iters):
            m_out = price_barrier_batch(
                tb, n_nodes=N_SPACE_NODES + 1, with_greeks=False, mesh=mesh1
            )
        mesh_spike_cold = B * m_iters / (time.perf_counter() - t0)
        assert np.allclose(
            m_out["price"], p_np, rtol=1e-6, atol=1e-6
        ), "mesh spike must match the unsharded headline kernel"
        # steady state: a production sweep keeps the batch resident (and
        # through this tunnel every host leaf upload is an ~ms RPC, so
        # the cold number above is transfer-bound, not kernel-bound —
        # docs/PERF_NOTES.md "Scaling"). Pre-place the leaves with the
        # mesh sharding; the driver's device_put is then a no-op and the
        # loop measures the shard_mapped kernel itself.
        shard = NamedSharding(mesh1, P("data"))
        dev_tb = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), shard), tb
        )
        m_out = price_barrier_batch(
            dev_tb, n_nodes=N_SPACE_NODES + 1, with_greeks=False, mesh=mesh1
        )
        t0 = time.perf_counter()
        for _ in range(m_iters):
            m_out = price_barrier_batch(
                dev_tb, n_nodes=N_SPACE_NODES + 1, with_greeks=False,
                mesh=mesh1,
            )
        mesh_spike_grids_per_sec = B * m_iters / (time.perf_counter() - t0)
        assert np.allclose(
            m_out["price"], p_np, rtol=1e-6, atol=1e-6
        ), "resident mesh spike must match the unsharded headline kernel"

    # far-barrier European-limit cross-check vs Black-76 closed form
    from finite_difference_tpu.models.analytic import generalized_bs_price

    def _bs_ref(sp, sg):
        return np.asarray(
            generalized_bs_price(
                jnp.asarray(np.asarray(sp, np.float64)),
                190.0,
                jnp.asarray(np.asarray(sg, np.float64)),
                T_EXP,
                0.0705,
                0.0705,
                True,
            ),
            dtype=np.float64,
        )

    ref = _bs_ref(spots, sigmas)
    ref_d = _bs_ref(spots_d, sigmas_d)
    rel_err = float(
        np.max(np.abs(p_np.astype(np.float64) - ref) / np.maximum(ref, 1e-8))
    )
    sp_rel_err = float(
        np.max(
            np.abs(sp_np.astype(np.float64) - ref_d) / np.maximum(ref_d, 1e-8)
        )
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "grids_per_sec": grids_per_sec,
                "solver": main_solver,
                "scan_grids_per_sec": scan_grids_per_sec,
                "greeks_grids_per_sec": greeks_grids_per_sec,
                "spectral_grids_per_sec": spectral_grids_per_sec,
                "spectral_far_barrier_max_rel_err_vs_bs": sp_rel_err,
                "batch": B,
                "batch_diag": B_diag,
                "iters": iters,
                "platform": "tpu" if on_tpu else "cpu",
                "device_kind": jax.devices()[0].device_kind,
                "far_barrier_max_rel_err_vs_bs": rel_err,
                "mesh_spike_grids_per_sec": mesh_spike_grids_per_sec,
                "mesh_spike_cold_grids_per_sec": mesh_spike_cold,
            },
            f,
        )


def stage_f64(out_path: str, prices_path: str, greeks_path: str) -> None:
    import jax

    jax.config.update("jax_enable_x64", True)
    on_tpu = _on_tpu()
    import jax.numpy as jnp

    # B=1024 measured fastest for both f64 rungs on the v5e (price
    # 6,730 vs 5,613 grids/s at B=512; greeks 4,719 vs 4,175 vs 3,267 at
    # B=256); compile ~310 s through the tunnel, within the stage budget
    B = 1024 if on_tpu else 8
    iters = 4 if on_tpu else 1
    tb, _, _ = make_batch(B, np.float64)
    dev = jax.tree.map(jnp.asarray, tb)
    # production auto-routing sends f64 to the spectral propagator
    # (exact to ~1e-11 vs the scan; 2.4x the scan's f64 throughput)
    out, elapsed = _timed_kernel(
        dev, with_greeks=False, iters=iters, solver="spectral"
    )
    np.save(prices_path, out[0].astype(np.float64))

    # THE REFERENCE WORKLOAD at the accuracy rung: price+delta+gamma+vega+
    # theta in f64 (run_config_scenarios.py:106-133 computes exactly this
    # set per scenario). Vega via forward-mode AD (one augmented solve,
    # no bump-h truncation); delta/gamma from the grid stencil; theta from
    # the PDE identity.
    g_B, g_dev = B, dev
    try:
        g_out, g_elapsed = _timed_kernel(
            g_dev, with_greeks=True, iters=iters, solver="spectral",
            greeks_mode="ad",
        )
    except jax.errors.JaxRuntimeError as e:
        # greeks working set is ~2x price-only; retry past the cliff on
        # genuine memory exhaustion ONLY — anything else must surface
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        print(f"# f64 greeks at B={B} OOM, retrying at B={B // 2}: {e}",
              file=sys.stderr)
        g_B = B // 2
        tb2, _, _ = make_batch(g_B, np.float64)
        g_dev = jax.tree.map(jnp.asarray, tb2)
        g_out, g_elapsed = _timed_kernel(
            g_dev, with_greeks=True, iters=iters, solver="spectral",
            greeks_mode="ad",
        )
    np.save(greeks_path, g_out.astype(np.float64))
    with open(out_path, "w") as f:
        json.dump(
            {
                "grids_per_sec": B * iters / elapsed,
                "batch": B,
                "greeks_grids_per_sec": g_B * iters / g_elapsed,
                "greeks_batch": g_B,
                "platform": "tpu" if on_tpu else "cpu",
            },
            f,
        )


def stage_oracle(prices_path: str, greeks_path: str) -> None:
    """f64 CPU oracle of the same trades (forced-cpu jax): prices from the
    CN scan (a DIFFERENT solver than the spectral rung it validates) and
    the same price+AD-vega+delta/gamma/theta greeks set."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_ORACLE_B", "256"))
    tb, _, _ = make_batch(B, np.float64)
    dev = jax.tree.map(jnp.asarray, tb)
    out, _ = _timed_kernel(dev, with_greeks=False, iters=0)
    np.save(prices_path, out[0].astype(np.float64))
    g_out, _ = _timed_kernel(
        dev, with_greeks=True, iters=0, greeks_mode="ad"
    )
    np.save(greeks_path, g_out.astype(np.float64))
    # a second stack at the f32 rung's OWN greeks definition (one-sided
    # sigma bump at the f32 dtype-aware step 1e-2, batch._resolve_dv_sigma)
    # computed in f64 — the f32-vs-oracle rows then measure on-chip f32
    # arithmetic noise, not bump-vs-AD definition mismatch
    g32, _ = _timed_kernel(
        dev, with_greeks=True, iters=0, greeks_mode="bump", dv_sigma=1e-2
    )
    np.save(greeks_path + ".f32bump.npy", g32.astype(np.float64))


def make_american_batch(B: int, dtype, dividends: bool = False):
    """The American bench trade set (seeded): 1y puts around the money —
    the reference's production American workload shape
    (run_american_scenarios.py / fd_american_equity.py). ``dividends``
    adds two discrete cash dividends per trade — the reference's
    dividend-centric production case (fd_american_equity.py:732-827),
    riding the SPIKE kernel as extra segments with the between-launch
    spline jump."""
    from finite_difference_tpu.models.pde.batch import build_american_batch

    # draw at the full bench size then slice so any B is a prefix of the
    # same trade set (the oracle stage re-derives the first 256 trades)
    rng = np.random.default_rng(7)
    spots_all = rng.uniform(80.0, 120.0, 4096)
    sigmas_all = rng.uniform(0.15, 0.4, 4096)
    return build_american_batch(
        spots=list(spots_all[:B]),
        strikes=[100.0] * B,
        sigmas=list(sigmas_all[:B]),
        t_expiry=[1.0] * B,
        r=[0.06] * B,
        b=[0.02] * B,
        is_call=[False] * B,
        n_time_steps=N_STEPS,
        num_space_nodes=N_SPACE_NODES - 1,
        dividends_tau=[[(0.35, 1.2), (0.75, 1.2)]] * B if dividends else None,
        dtype=dtype,
    )


def _timed_american(
    dev, with_greeks, iters, solver, spike_segments=None,
    greeks_mode="bump", with_dividends=False, dv_sigma=None,
):
    import jax
    import jax.numpy as jnp

    from finite_difference_tpu.models.pde.batch import american_batch_kernel

    kw = dict(
        n_nodes=N_SPACE_NODES + 1, with_greeks=with_greeks, solver=solver,
        with_dividends=with_dividends, greeks_mode=greeks_mode,
        dv_sigma=dv_sigma,
    )
    if solver in ("spike", "spike_df64"):
        kw["spike_segments"] = spike_segments
    fn = jax.jit(
        lambda b: jnp.stack(list(american_batch_kernel(b, **kw).values()))
    )
    out = np.asarray(fn(dev))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn(dev))
    return out, time.perf_counter() - t0


def stage_american(out_path: str, prices_path: str,
                   greeks_path: str = None) -> None:
    """The batched American sweep (price and price+greeks) — the fused
    SPIKE + Ikonen-Toivanen pallas kernel on TPU f32 (price_american_batch
    solver='auto' routing), XLA scan elsewhere. Saves the first
    BENCH_AM_ORACLE_B f32 prices (and the greeks stack) for the f64 CPU
    oracle stage."""
    import jax

    on_tpu = _on_tpu()
    import jax.numpy as jnp

    from finite_difference_tpu.models.pde.batch import _spike_schedule

    B = 4096 if on_tpu else 16
    iters = 8 if on_tpu else 1
    g_iters = 4 if on_tpu else 1
    solver = "spike" if on_tpu else "scan"
    tb = make_american_batch(B, np.float32 if on_tpu else np.float64)
    dev = jax.tree.map(jnp.asarray, tb)
    seg = _spike_schedule(tb, N_SPACE_NODES + 1)
    assert seg is not None, "bench American batch must be spike-eligible"

    out, elapsed = _timed_american(
        dev, with_greeks=False, iters=iters, solver=solver,
        spike_segments=seg,
    )
    np.save(
        prices_path,
        out[0][: int(os.environ.get("BENCH_AM_ORACLE_B", "256"))].astype(
            np.float64
        ),
    )
    g_out, g_elapsed = _timed_american(
        dev, with_greeks=True, iters=g_iters, solver=solver,
        spike_segments=seg,
    )
    if greeks_path:
        n_keep = int(os.environ.get("BENCH_AM_ORACLE_B", "256"))
        np.save(greeks_path, g_out[:, :n_keep].astype(np.float64))

    # the dividend-bearing production case (fd_american_equity.py:732-827):
    # two discrete cash dividends per trade, riding the SPIKE route as
    # extra segments with the between-launch spline jump (scan elsewhere)
    tb_div = make_american_batch(
        B, np.float32 if on_tpu else np.float64, dividends=True
    )
    dev_div = jax.tree.map(jnp.asarray, tb_div)
    seg_div = _spike_schedule(tb_div, N_SPACE_NODES + 1)
    assert seg_div is not None, "dividend bench batch must be spike-eligible"
    d_out, d_elapsed = _timed_american(
        dev_div, with_greeks=False, iters=iters, solver=solver,
        spike_segments=seg_div, with_dividends=True,
    )
    # dividends lower the put's forward drift income -> prices move; a
    # cheap sanity pin that the jump actually executed
    assert not np.allclose(d_out[0], out[0]), "dividend jump was a no-op"

    with open(out_path, "w") as f:
        json.dump(
            {
                "grids_per_sec": B * iters / elapsed,
                "greeks_grids_per_sec": B * g_iters / g_elapsed,
                "div_grids_per_sec": B * iters / d_elapsed,
                "batch": B,
                "solver": solver,
                "platform": "tpu" if on_tpu else "cpu",
            },
            f,
        )


def stage_american64(out_path: str, prices_path: str) -> None:
    """The American production workload AT THE ACCURACY RUNG: f64
    price+delta+gamma+vega — the cell that matches
    run_american_scenarios.py's per-scenario greeks_log2 at the <=1e-6
    bar. On TPU this rides the double-float SPIKE pallas kernel
    (solver='spike_df64', pallas_kernel.py — measured 3,791 grids/s at
    B=256 vs the x64-emulated scan's 591); off-TPU it falls back to the
    f64 CN scan. Vega is the reference's production one-sided sigma bump
    (fd_american_equity.py:1014-1035) at the f64 step (1e-4) — a pallas
    custom call has no AD rule, and the CPU oracle stage uses the SAME
    bump so the comparison measures on-chip arithmetic fidelity at the
    workload's own definition of vega (bump-vs-AD truncation is 2.9e-4,
    a property of the workload, not the chip). Saves the full (4, B)
    output stack for the oracle comparison."""
    import jax

    jax.config.update("jax_enable_x64", True)
    on_tpu = _on_tpu()
    import jax.numpy as jnp

    from finite_difference_tpu.models.pde.batch import _spike_schedule

    B = int(os.environ.get("BENCH_AM_ORACLE_B", "256"))
    iters = 2 if on_tpu else 1
    tb = make_american_batch(B, np.float64)
    solver = "spike_df64" if on_tpu else "scan"
    sched = _spike_schedule(tb, N_SPACE_NODES + 1) if on_tpu else None
    if on_tpu and sched is None:
        solver = "scan"
    dev = jax.tree.map(jnp.asarray, tb)
    out, elapsed = _timed_american(
        dev, with_greeks=True, iters=iters, solver=solver,
        spike_segments=sched, greeks_mode="bump",
    )
    np.save(prices_path, out.astype(np.float64))
    with open(out_path, "w") as f:
        json.dump(
            {
                "greeks_grids_per_sec": B * iters / elapsed,
                "batch": B,
                "solver": solver,
                "platform": "tpu" if on_tpu else "cpu",
            },
            f,
        )


def stage_american_oracle(prices_path: str) -> None:
    """f64 CPU oracle (scan solver, price+greeks stack) of the first
    BENCH_AM_ORACLE_B American bench trades. Greeks use the same
    one-sided sigma bump as the rungs (the reference's production vega,
    fd_american_equity.py:1014-1035) so rung-vs-oracle rows measure
    arithmetic fidelity, not bump-vs-AD truncation (2.9e-4 at the f64
    step — measured, docs/PERF_NOTES.md)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_AM_ORACLE_B", "256"))
    tb = make_american_batch(B, np.float64)
    dev = jax.tree.map(jnp.asarray, tb)
    out, _ = _timed_american(
        dev, with_greeks=True, iters=0, solver="scan", greeks_mode="bump"
    )
    np.save(prices_path, out.astype(np.float64))
    # the f32 rung's own greeks definition (sigma bump at the f32
    # dtype-aware step 1e-2) in f64 arithmetic — see stage_oracle
    g32, _ = _timed_american(
        dev, with_greeks=True, iters=0, solver="scan", greeks_mode="bump",
        dv_sigma=1e-2,
    )
    np.save(prices_path + ".f32bump.npy", g32.astype(np.float64))


def stage_analytic(out_path: str) -> None:
    """Batched analytic sweep: B=2^20 MIXED barrier table (singles up/down,
    Ikeda-Kunitomo doubles, vanillas; random in/out) through
    models/analytic/batch.continuous_barrier_sweep — the hybrid router's
    continuous branch. Host-materialized output per iteration."""
    import jax

    on_tpu = _on_tpu()
    import jax.numpy as jnp

    from finite_difference_tpu.models.analytic.batch import (
        _continuous_sweep_kernel,
        _mask_arrays,
    )

    B = (1 << 20) if on_tpu else (1 << 12)
    iters = 10 if on_tpu else 2
    rng = np.random.default_rng(3)
    dt_ = np.float32 if on_tpu else np.float64
    s = rng.uniform(80.0, 120.0, B).astype(dt_)
    k = rng.uniform(90.0, 110.0, B).astype(dt_)
    t = rng.uniform(0.05, 2.0, B).astype(dt_)
    sig = rng.uniform(0.15, 0.45, B).astype(dt_)
    kind = rng.integers(0, 6, B)  # 0-1 lower, 2-3 upper, 4 double, 5 vanilla
    lower = np.where(
        (kind <= 1) | (kind == 4), (s * rng.uniform(0.7, 0.95, B)), np.nan
    ).astype(dt_)
    upper = np.where(
        (kind == 2) | (kind == 3) | (kind == 4),
        (s * rng.uniform(1.05, 1.4, B)),
        np.nan,
    ).astype(dt_)
    is_call = rng.integers(0, 2, B).astype(bool)
    is_in = rng.integers(0, 2, B).astype(bool)
    # serving shape: host canonicalisation ONCE, then the jitted kernel on
    # DEVICE-RESIDENT inputs (PERF_NOTES "Host-canonicalisation trap" —
    # converting device arrays back to numpy per call costs 20x the
    # kernel through the tunnel)
    lo, up, has_lo, has_up = _mask_arrays(lower, upper, B)
    dev_args = tuple(
        jnp.asarray(x)
        for x in (
            s, k, t, np.full(B, 0.06, dt_), np.full(B, 0.04, dt_), sig,
            lo.astype(dt_), up.astype(dt_), has_lo, has_up,
            is_call, is_in, np.zeros(B, dt_), np.zeros(B, dtype=bool),
        )
    )
    run = lambda: np.asarray(
        _continuous_sweep_kernel(
            *dev_args, rebate_timing_in="expiry", rebate_timing_out="hit",
            double_m=5,
        )
    )
    p = run()  # compile+warm
    # floor: worthless options may round to ~-1e-5 at f32 on a ~100 scale
    assert np.isfinite(p).all() and (p >= -1e-3).all()
    t0 = time.perf_counter()
    for _ in range(iters):
        p = run()
    elapsed = time.perf_counter() - t0
    with open(out_path, "w") as f:
        json.dump(
            {
                "trades_per_sec": B * iters / elapsed,
                "batch": B,
                "platform": "tpu" if on_tpu else "cpu",
            },
            f,
        )


def stage_exposure(out_path: str) -> None:
    """Device-resident exposure on the full bench netting set
    (IRSwap+TRS+ILS incl. legacy mode — examples/exposure_bench.py
    --device): NPVs/s with only the EE/PFE profile materialized."""
    import importlib.util

    import jax

    on_tpu = _on_tpu()
    import jax.numpy as jnp

    spec = importlib.util.spec_from_file_location(
        "exposure_bench", os.path.join(HERE, "examples", "exposure_bench.py")
    )
    eb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eb)

    from finite_difference_tpu.xva.cva import exposure_profile
    from finite_difference_tpu.xva.device_exposure import DeviceExposureEngine

    n_paths = 50_000 if on_tpu else 2_000
    cube = eb.build_cube(n_paths)
    ns = eb.build_netting_set()
    swaps = [t.instrument for t in ns.trades]
    pull = lambda name: np.asarray(
        [cube.get_time_slice(t)[name].values for t in range(cube.n_times)],
        dtype=np.float32 if on_tpu else np.float64,
    )
    arrays = {
        kk: jnp.asarray(pull(kk))
        for kk in ("ZAR-SWAP", "INFL.ZA", "EQ.DIV", "CPI.CURVE")
    }
    scalars = {kk: jnp.asarray(pull(kk)) for kk in ("CPI.ZA", "EQ.SPOT")}
    dev = DeviceExposureEngine(list(cube.dates), arrays, eb.TENORS, scalars=scalars)
    times_days = np.arange(cube.n_times, dtype=float) * 30.0
    run = lambda: exposure_profile(times_days, dev.mtm(swaps).T)
    p = run()  # compile + first
    assert np.isfinite(p.ee).all()
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        p = run()
    per = (time.perf_counter() - t0) / iters
    evals = n_paths * cube.n_times * len(swaps)
    with open(out_path, "w") as f:
        json.dump(
            {
                "npvs_per_sec": evals / per,
                "n_paths": n_paths,
                "n_times": cube.n_times,
                "n_trades": len(swaps),
                "platform": "tpu" if on_tpu else "cpu",
            },
            f,
        )


def stage_hw1f(out_path: str) -> None:
    """HW1F scenario-generation -> device exposure -> CVA, cube resident in
    HBM end-to-end (xva/device_exposure.hw1f_cva_pipeline; the
    examples/device_cva_pipeline.py measurement)."""
    import datetime as _dt

    import jax

    on_tpu = _on_tpu()

    from finite_difference_tpu.instruments.cashflow import LegType, SwapLeg
    from finite_difference_tpu.instruments.ir_swap import IRSwap
    from finite_difference_tpu.models.mc.hw1f import (
        HW1FCurveSimulator, HW1FParams,
    )
    from finite_difference_tpu.xva.device_exposure import hw1f_cva_pipeline

    val = _dt.date(2025, 7, 28)
    tenors = np.array([0.25, 0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0])
    sim = HW1FCurveSimulator(
        HW1FParams.flat(alpha=0.05, sigma=0.01),
        curve_tenors=tenors,
        curve_rates=np.full(tenors.size, 0.075),
    )
    swaps = [
        IRSwap(
            name=f"irs{kk}",
            effective_date=val,
            maturity_date=_dt.date(2030, 7, 28),
            notional=1_000_000,
            receive_leg=SwapLeg(
                LegType.FLOATING, frequency=3, curve_name="ZAR-SWAP"
            ),
            pay_leg=SwapLeg(
                LegType.FIXED, frequency=3, fixed_rate=0.07 + 0.002 * kk
            ),
            discount_curve_name="ZAR-SWAP",
        )
        for kk in range(10)
    ]
    scen_days = list(range(30, 1890, 30))
    n_paths = 50_000 if on_tpu else 2_000
    run = lambda: hw1f_cva_pipeline(
        sim, val, scen_days, tenors, n_paths, swaps,
        hazard_rate=0.02, recovery=0.4, flat_discount_rate=0.075,
    )
    out = run()  # compile + first
    assert np.isfinite(out["cva"])
    t0 = time.perf_counter()
    out = run()
    steady = time.perf_counter() - t0
    evals = n_paths * (len(scen_days) + 1) * len(swaps)
    with open(out_path, "w") as f:
        json.dump(
            {
                "npvs_per_sec": evals / steady,
                "n_paths": n_paths,
                "platform": "tpu" if on_tpu else "cpu",
            },
            f,
        )


def stage_mc(out_path: str) -> None:
    """MC discrete-barrier pricer at production path count (8M paths, 31
    daily monitors, up-and-out — the PERF_NOTES 'MC discrete-barrier'
    row): paths/s with the price/stderr reduction materialized to host."""
    import datetime as _dt

    import jax

    on_tpu = _on_tpu()

    from finite_difference_tpu.models.mc.discrete_barrier import (
        BarrierSpec,
        MCConfig,
        price_discrete_barrier_mc,
    )
    from finite_difference_tpu.utils.curves import flat_naca_dataframe

    val = _dt.date(2025, 7, 28)
    mat = val + _dt.timedelta(days=31)
    curve = flat_naca_dataframe(0.0705, val, mat + _dt.timedelta(days=5))
    monitors = [val + _dt.timedelta(days=k) for k in range(1, 32)]
    n_paths = 8_000_000 if on_tpu else 20_000
    kw = dict(
        spot=229.74, strike=190.0, vol=0.2879, option_type="call",
        valuation=val, maturity=mat, discount_curve=curve,
        monitor_dates=monitors,
        barrier=BarrierSpec("up-and-out", level=260.0),
        cfg=MCConfig(n_paths=n_paths, antithetic=True, seed=7),
    )
    res = price_discrete_barrier_mc(**kw)  # compile + warmup
    assert np.isfinite(res["price"]) and res["stderr"] > 0.0
    iters = 5 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(iters):
        res = price_discrete_barrier_mc(**kw)
    elapsed = time.perf_counter() - t0
    with open(out_path, "w") as f:
        json.dump(
            {
                "paths_per_sec": n_paths * iters / elapsed,
                "n_paths": n_paths,
                "price": res["price"],
                "stderr": res["stderr"],
                "platform": "tpu" if on_tpu else "cpu",
            },
            f,
        )


def stage_scengen(out_path: str) -> None:
    """Clewlow-Strickland scenario generation (the RiskFlow-replica path
    kernel, PERF_NOTES 'Scenario generation vs the reference'): 53 steps x
    20 tenors x 100k sims, RNG included, cube kept device-resident (a
    scalar reduction is materialized so the tunnel cannot elide work —
    shipping the full 424 MB cube to host costs more than computing it)."""
    import jax

    on_tpu = _on_tpu()
    import jax.numpy as jnp

    from finite_difference_tpu.scenarios.simulation import (
        _generate_paths_kernel,
        generate_random_numbers,
        precalculate,
    )

    n_steps, n_tenors = 53, 20
    n_sims = 100_000 if on_tpu else 2_000
    base_excel = 45_000
    tenors_excel = base_excel + np.linspace(30, 1800, n_tenors)
    grid_days = np.linspace(7, 371, n_steps)
    pre = precalculate(
        np.full(n_tenors, 70.0), tenors_excel, grid_days,
        sigma=0.3, alpha=0.2, drift=0.01, base_date_excel=base_excel,
    )
    dt_ = np.float32  # throughput rung; f64/torch parity is pinned in tests
    chol = np.eye(1)
    ic = jnp.asarray(pre["initial_curve"], dt_)
    vol = jnp.asarray(pre["vol"], dt_)
    drift = jnp.asarray(pre["drift"], dt_)

    @jax.jit
    def run_once(key):
        z = generate_random_numbers(
            chol, n_steps, n_sims, use_antithetic=True,
            rng_backend="threefry", key=key, dtype=dt_,
        )
        cube = _generate_paths_kernel(ic, vol, drift, z[0, :n_steps, :])
        return jnp.sum(cube), cube[0, 0, 0]

    key = jax.random.PRNGKey(0)
    s, c0 = run_once(key)  # compile + warmup
    assert np.isfinite(np.asarray(s))
    iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for i in range(iters):
        s, c0 = run_once(jax.random.PRNGKey(i))
        np.asarray(s)  # materialize the reduction (tunnel-honest timing)
    elapsed = time.perf_counter() - t0
    with open(out_path, "w") as f:
        json.dump(
            {
                "paths_per_sec": n_sims * iters / elapsed,
                "cells_per_sec": n_sims * n_steps * n_tenors * iters / elapsed,
                "n_sims": n_sims,
                "platform": "tpu" if on_tpu else "cpu",
            },
            f,
        )


def stage_serving(out_path: str, oracle_greeks_path: str = None) -> None:
    """Steady-state serving throughput: one warm bucket of the
    BarrierPricingService (the HTTP server's device path — serving =
    service.price per batch; the HTTP framing adds ~ms, measured in
    tests/test_serving.py). Requests of exactly one bucket size so every
    iteration reuses one compiled kernel.

    Second measure: the GREEKS a service actually ships. An f32 service
    with greeks solves at the f64 accuracy rung by default (the
    f32-greeks policy, serving/service._resolve_greeks_dtype); serving
    the bench's own oracle trades and comparing against the CPU oracle
    stack proves the shipped-greeks accuracy (``served_greeks_max_rel_
    err``), closing the policy loop the per-greek f32 fields opened.
    """
    import jax

    jax.config.update("jax_enable_x64", True)  # the greeks policy rung
    on_tpu = _on_tpu()

    from finite_difference_tpu.serving import BarrierPricingService

    B = 256 if on_tpu else 16
    svc = BarrierPricingService(
        n_time_steps=N_STEPS,
        num_space_nodes=N_SPACE_NODES,
        with_greeks=False,
        dtype=np.float32 if on_tpu else np.float64,
        min_bucket=B,
        max_bucket=B,
    )
    rng = np.random.default_rng(11)
    trades = [
        {
            "spot": float(s), "strike": 190.0, "sigma": float(sg),
            "t_expiry": T_EXP, "r": 0.0705, "b": 0.0705, "is_call": True,
            "barrier_type": "up-and-out", "upper": 420.0,
            "monitor_times": [T_EXP * (k + 1) / 24.0 for k in range(24)],
        }
        for s, sg in zip(
            rng.uniform(180.0, 250.0, B), rng.uniform(0.2, 0.35, B)
        )
    ]
    res = svc.price(trades)  # compile + warm
    assert len(res) == B and np.isfinite(res[0]["price"])
    iters = 8 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        res = svc.price(trades)
    elapsed = time.perf_counter() - t0
    out = {
        "prices_per_sec": B * iters / elapsed,
        "bucket": B,
        "platform": "tpu" if on_tpu else "cpu",
    }

    if oracle_greeks_path and os.path.exists(oracle_greeks_path):
        # serve the oracle's own trades through an f32+greeks service
        # (policy routes the solve to the f64 rung) and measure both the
        # shipped accuracy and the greek-serving rate
        g_or = np.load(oracle_greeks_path)  # (5, ORACLE_B)
        nB = g_or.shape[1]
        rng0 = np.random.default_rng(0)  # make_batch's draw, same prefix
        spots = rng0.uniform(180.0, 250.0, 4096)[:nB]
        sigmas = rng0.uniform(0.2, 0.35, 4096)[:nB]
        g_trades = [
            {
                "spot": float(s), "strike": 190.0, "sigma": float(sg),
                "t_expiry": T_EXP, "r": 0.0705, "b": 0.0705,
                "is_call": True, "barrier_type": "up-and-out",
                "upper": 420.0,
                "monitor_times": [T_EXP * (k + 1) / 24.0 for k in range(24)],
            }
            for s, sg in zip(spots, sigmas)
        ]
        g_svc = BarrierPricingService(
            n_time_steps=N_STEPS,
            num_space_nodes=N_SPACE_NODES,
            with_greeks=True,
            dtype=np.float32,  # policy upgrades the solve to f64
            min_bucket=nB,
            max_bucket=nB,
        )
        g_res = g_svc.price(g_trades)  # compile + warm
        g_iters = 4 if on_tpu else 1
        t0 = time.perf_counter()
        for _ in range(g_iters):
            g_res = g_svc.price(g_trades)
        g_elapsed = time.perf_counter() - t0
        served = np.stack(
            [
                np.array([row[k] for row in g_res])
                for k in ("price", "vega", "delta", "gamma", "theta")
            ]
        )
        out["greeks_prices_per_sec"] = nB * g_iters / g_elapsed
        out["served_greeks_max_rel_err"] = _greeks_stack_rel(served, g_or)
    with open(out_path, "w") as f:
        json.dump(out, f)


_DEGRADED_STAGES = []  # stages that fell back to CPU after a mid-run device loss


def _run_stage(args, timeout=900, retries=0):
    """Run one stage subprocess; retry once on failure (the TPU tunnel
    backend occasionally fails to initialize transiently — a one-shot
    stage error must not zero the whole bench artifact). A hung stage
    (TimeoutExpired — e.g. a dead tunnel that blocks device init
    forever) counts as a failed attempt; between attempts the device is
    re-probed, and a dead probe flips the REST of the bench to forced
    CPU (recorded in the artifact) instead of burning hours per stage."""
    out, err = "", ""
    for attempt in range(retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench.py")] + args,
                cwd=HERE,
                timeout=timeout,
                capture_output=True,
                text=True,
            )
            if proc.returncode == 0:
                return
            out, err = proc.stdout, proc.stderr
        except subprocess.TimeoutExpired:
            out, err = "", f"stage timed out after {timeout}s"
        if attempt < retries:
            if args != ["--stage", "probe"] and not os.environ.get(
                "BENCH_FORCE_CPU"
            ):
                try:
                    probe = subprocess.run(
                        [sys.executable, os.path.join(HERE, "bench.py"),
                         "--stage", "probe"],
                        cwd=HERE, timeout=900, capture_output=True, text=True,
                    )
                    probe_ok = probe.returncode == 0
                except subprocess.TimeoutExpired:
                    probe_ok = False
                if not probe_ok:
                    print(
                        f"# device lost mid-run at stage {args}; forcing "
                        "CPU for the remaining stages",
                        file=sys.stderr,
                    )
                    os.environ["BENCH_FORCE_CPU"] = "1"
                    _DEGRADED_STAGES.append(args[1] if len(args) > 1 else "?")
            print(
                f"# stage {args} failed (attempt {attempt + 1}), retrying",
                file=sys.stderr,
            )
            time.sleep(10)
    raise RuntimeError(
        f"bench stage {args} failed:\n{out[-2000:]}\n{err[-2000:]}"
    )


def stage_probe() -> None:
    """Fail-fast device probe: init the backend and run one tiny op."""
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    x = jnp.ones((8, 8))
    float(jnp.sum(x @ x))
    print(f"# probe ok: {devs}", file=sys.stderr)


def _greeks_stack_rel(stack, oracle_stack):
    """Max error of a greeks stack vs the oracle's. Rows are
    [price, vega, delta, gamma, theta]. The price row is per-element
    relative; derivative rows are scale-normalized (max |diff| /
    max |oracle| per row) so sign-crossing thetas/vegas don't divide
    by ~0 — the same policy everywhere in this bench."""
    n = min(stack.shape[1], oracle_stack.shape[1])
    rel = float(
        np.max(
            np.abs(stack[0, :n] - oracle_stack[0, :n])
            / np.maximum(np.abs(oracle_stack[0, :n]), 1e-8)
        )
    )
    for row in range(1, min(stack.shape[0], oracle_stack.shape[0])):
        rel = max(
            rel,
            float(
                np.max(np.abs(stack[row, :n] - oracle_stack[row, :n]))
                / np.max(np.abs(oracle_stack[row, :n]))
            ),
        )
    return rel


def _greeks_rows_rel(stack, oracle_stack, rows):
    """Per-row version of :func:`_greeks_stack_rel` (same policy: price
    per-element relative, derivative rows scale-normalized) — so one
    noisy row (f32 theta rides gamma's stencil noise through the PDE
    identity) doesn't smear the whole stack's number."""
    n = min(stack.shape[1], oracle_stack.shape[1])
    out = {}
    for r, name in enumerate(rows[: min(stack.shape[0], oracle_stack.shape[0])]):
        if r == 0:
            v = np.max(
                np.abs(stack[0, :n] - oracle_stack[0, :n])
                / np.maximum(np.abs(oracle_stack[0, :n]), 1e-8)
            )
        else:
            v = np.max(np.abs(stack[r, :n] - oracle_stack[r, :n])) / np.max(
                np.abs(oracle_stack[r, :n])
            )
        out[name] = float(v)
    return out


def _prices_rel(prices, oracle_prices):
    n = min(len(prices), len(oracle_prices))
    return float(
        np.max(
            np.abs(prices[:n] - oracle_prices[:n])
            / np.maximum(np.abs(oracle_prices[:n]), 1e-8)
        )
    )


# The driver captures only the LAST ~2000 chars of stdout. The full merged
# line outgrew that window in round 4 (its head — metric, value,
# vs_baseline — was truncated away and parsed=null). So after every
# full-line emit the bench ALSO prints a compact (<1900-byte) line with
# the headline and per-rung essentials; diagnostics (stage_elapsed_s,
# stage_errors, per-greek fields) stay on the full line only. The compact
# line is printed LAST so it is always whole inside the driver's tail.
COMPACT_KEYS = (
    "metric", "value", "unit", "vs_baseline", "solver", "batch",
    "platform", "device_kind", "far_barrier_max_rel_err_vs_bs",
    "greeks_grids_per_sec", "f64_grids_per_sec", "f64_vs_baseline",
    "f64_max_rel_err_vs_cpu_oracle", "f64_meets_1e-6",
    "f64_greeks_grids_per_sec", "f64_greeks_max_rel_err_vs_cpu_oracle",
    "f64_greeks_meets_1e-6", "f32_american_grids_per_sec",
    "f32_american_greeks_grids_per_sec", "f32_american_div_grids_per_sec",
    "f32_american_max_rel_err_vs_cpu_oracle",
    "f64_american_greeks_grids_per_sec",
    "f64_american_max_rel_err_vs_cpu_oracle", "f64_american_meets_1e-6",
    "mesh_spike_grids_per_sec", "served_greeks_max_rel_err",
    "serving_prices_per_sec", "serving_greeks_prices_per_sec",
    "elapsed_s", "skipped_stages", "degraded_to_cpu_from_stage",
)


def compact_line(result: dict) -> str:
    """The <1900-byte artifact line (see COMPACT_KEYS note above)."""
    def cv(v):
        return float(f"{v:.6g}") if isinstance(v, float) else v

    line = json.dumps({k: cv(result[k]) for k in COMPACT_KEYS if k in result})
    # growth guard: the whole point is fitting the driver's window
    assert len(line) < 1900, f"compact bench line too long: {len(line)}"
    return line


def run_bench() -> None:
    """Orchestrator. Structured so a kill at ANY point still leaves a
    valid best-so-far artifact on stdout:

    - the merged JSON line is RE-PRINTED after every completed stage
      (the driver keeps the tail — the last line is always the most
      complete artifact);
    - stages are ordered by north-star priority (f32 headline -> f64
      price+greeks + CPU oracle -> American rungs -> subsystems);
    - a global wall-clock budget (env BENCH_DEADLINE_S, default 1500s)
      gates the non-mandatory stages — skipped ones are recorded in
      "skipped_stages"; the four north-star stages always run;
    - a failed stage records its error in "stage_errors" and the bench
      moves on instead of zeroing the artifact;
    - the persistent XLA compile cache (.jax_bench_cache, gitignored)
      amortizes the ~5-min f64 compiles across stages and rounds.
    """
    t_start = time.monotonic()
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_bench_cache")
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("BENCH_ORACLE_B", "256")
    os.environ.setdefault("BENCH_AM_ORACLE_B", "256")

    td = tempfile.mkdtemp(prefix="fd_bench_")
    p = lambda name: os.path.join(td, name)

    result = {
        "metric": "cn_barrier_grids_per_sec_per_chip_1024x512",
        "value": 0.0,
        "unit": "grids/sec",
        "vs_baseline": 0.0,
        "deadline_s": deadline,
        "stage_elapsed_s": {},
        "stage_errors": {},
        "skipped_stages": [],
    }

    def emit():
        result["elapsed_s"] = round(time.monotonic() - t_start, 1)
        print(json.dumps(result), flush=True)
        print(compact_line(result), flush=True)

    def run_probe():
        # fail fast when the device backend is unreachable (a dead
        # tunnel hangs init forever). A failed probe downgrades the run
        # to forced-CPU — every stage is cheap at its CPU shapes — so
        # the artifact still exists and says so.
        if os.environ.get("BENCH_FORCE_CPU"):
            return
        try:
            # a cold axon tunnel takes 250-550s to init (measured round
            # 4: first attempt timed out at 300s, the retry then took
            # 253s on the half-warm tunnel) — give one attempt a window
            # wide enough to cover the cold start instead of burning a
            # failed attempt's full timeout on top of the retry's.
            # retries=2 with a pause: a restarting tunnel (observed round
            # 5: dead for minutes, then healthy) deserves a third look —
            # a TPU artifact is worth ~20 min of probe patience, a
            # CPU-degraded one reads vs_baseline 0.06.
            try:
                _run_stage(["--stage", "probe"], timeout=600, retries=1)
            except RuntimeError:
                time.sleep(120)
                _run_stage(["--stage", "probe"], timeout=600, retries=0)
        except RuntimeError as e:
            print(f"# device probe failed, forcing CPU: {e}", file=sys.stderr)
            result["device_probe_failed"] = True
            os.environ["BENCH_FORCE_CPU"] = "1"

    def run_f32():
        _run_stage(
            ["--stage", "f32", "--out", p("f32.json"),
             "--greeks", p("f32_greeks.npy")],
            timeout=1200, retries=1,
        )
        f32 = json.load(open(p("f32.json")))
        gps = f32["grids_per_sec"]
        result.update(
            value=round(gps, 2),
            vs_baseline=round(gps / BASELINE_PER_CHIP, 4),
            batch=f32["batch"],
            iters=f32["iters"],
            dtype="float32",
            solver=f32["solver"],
            scan_grids_per_sec=round(f32["scan_grids_per_sec"], 2),
            platform=f32["platform"],
            device_kind=f32["device_kind"],
            far_barrier_max_rel_err_vs_bs=f32["far_barrier_max_rel_err_vs_bs"],
            greeks_grids_per_sec=round(f32["greeks_grids_per_sec"], 2),
            greeks_vs_baseline=round(
                f32["greeks_grids_per_sec"] / BASELINE_PER_CHIP, 4
            ),
        )
        # diagnostic only: production auto-routing REFUSES the spectral
        # path on TPU f32 (matmul accumulation noise, models/pde/batch.py)
        # — reported so the refusal stays measured, not quoted
        result["f32_spectral_routed"] = False
        result["f32_spectral_grids_per_sec"] = round(
            f32["spectral_grids_per_sec"], 2
        )
        result["f32_spectral_max_rel_err_vs_bs"] = f32[
            "spectral_far_barrier_max_rel_err_vs_bs"
        ]
        if f32.get("mesh_spike_cold_grids_per_sec"):
            result["mesh_spike_cold_grids_per_sec"] = round(
                f32["mesh_spike_cold_grids_per_sec"], 2
            )
        if f32.get("mesh_spike_grids_per_sec"):
            result["mesh_spike_grids_per_sec"] = round(
                f32["mesh_spike_grids_per_sec"], 2
            )

    def run_f64():
        _run_stage(
            ["--stage", "f64", "--out", p("f64.json"),
             "--prices", p("f64.npy"), "--greeks", p("f64_greeks.npy")],
            timeout=1500, retries=1,
        )
        f64 = json.load(open(p("f64.json")))
        result.update({
            "f64_solver": "spectral",
            "f64_grids_per_sec": round(f64["grids_per_sec"], 2),
            "f64_vs_baseline": round(
                f64["grids_per_sec"] / BASELINE_PER_CHIP, 4
            ),
            # the reference workload (price+delta+gamma+vega+theta,
            # run_config_scenarios.py:106-133) at the accuracy rung
            "f64_greeks_grids_per_sec": round(f64["greeks_grids_per_sec"], 2),
            "f64_greeks_vs_baseline": round(
                f64["greeks_grids_per_sec"] / BASELINE_PER_CHIP, 4
            ),
            "f64_greeks_batch": f64["greeks_batch"],
        })

    def run_oracle():
        _run_stage(
            ["--stage", "oracle", "--prices", p("oracle.npy"),
             "--greeks", p("oracle_greeks.npy")],
            timeout=900, retries=0,
        )
        g_or = np.load(p("oracle_greeks.npy"))
        if os.path.exists(p("f64.npy")):
            f64_rel = _prices_rel(np.load(p("f64.npy")), np.load(p("oracle.npy")))
            result["f64_max_rel_err_vs_cpu_oracle"] = f64_rel
            result["f64_meets_1e-6"] = bool(f64_rel <= 1e-6)
        if os.path.exists(p("f64_greeks.npy")):
            g_rel = _greeks_stack_rel(np.load(p("f64_greeks.npy")), g_or)
            result["f64_greeks_max_rel_err_vs_cpu_oracle"] = g_rel
            result["f64_greeks_meets_1e-6"] = bool(g_rel <= 1e-6)
        if os.path.exists(p("f32_greeks.npy")):
            # the f32 greeks error a throughput-rung user would ship —
            # measured against the oracle's f32-bump-aligned stack (same
            # one-sided sigma bump the f32 rung uses, f64 arithmetic) so
            # the rows isolate on-chip f32 noise from the bump-vs-AD
            # definition gap; per-greek fields because the rows have
            # very different floors (delta's stencil vs theta's
            # gamma-amplified PDE identity)
            g32_or = np.load(p("oracle_greeks.npy.f32bump.npy"))
            g32 = np.load(p("f32_greeks.npy"))
            result["f32_greeks_max_rel_err_vs_cpu_oracle"] = (
                _greeks_stack_rel(g32, g32_or)
            )
            for name, v in _greeks_rows_rel(
                g32, g32_or, ["price", "vega", "delta", "gamma", "theta"]
            ).items():
                result[f"f32_greeks_rel_{name}"] = v

    def run_american():
        # the American production workload (fd_american_equity.py) on
        # the fused SPIKE+Ikonen-Toivanen pallas kernel (f32 rung)
        _run_stage(
            ["--stage", "american", "--out", p("american.json"),
             "--prices", p("american.npy"),
             "--greeks", p("american_greeks.npy")],
            timeout=1200, retries=0,
        )
        am = json.load(open(p("american.json")))
        result.update({
            "f32_american_solver": am["solver"],
            "f32_american_grids_per_sec": round(am["grids_per_sec"], 2),
            "f32_american_greeks_grids_per_sec": round(
                am["greeks_grids_per_sec"], 2
            ),
            # dividend-bearing production case on the same fast rung
            "f32_american_div_grids_per_sec": round(
                am["div_grids_per_sec"], 2
            ),
        })

    def run_american_oracle():
        _run_stage(
            ["--stage", "american_oracle", "--prices", p("am_oracle.npy")],
            timeout=900, retries=0,
        )
        am_or = np.load(p("am_oracle.npy"))  # (4, B) [price,vega,delta,gamma]
        if os.path.exists(p("american.npy")):
            result["f32_american_max_rel_err_vs_cpu_oracle"] = _prices_rel(
                np.load(p("american.npy")), am_or[0]
            )
        if os.path.exists(p("american_greeks.npy")):
            # vs the oracle's f32-bump-aligned stack (see run_oracle)
            am32_or = np.load(p("am_oracle.npy.f32bump.npy"))
            am32 = np.load(p("american_greeks.npy"))
            result["f32_american_greeks_max_rel_err_vs_cpu_oracle"] = (
                _greeks_stack_rel(am32, am32_or)
            )
            for name, v in _greeks_rows_rel(
                am32, am32_or, ["price", "vega", "delta", "gamma"]
            ).items():
                result[f"f32_american_greeks_rel_{name}"] = v

    def run_american64():
        # the American workload at the accuracy rung: f64 scan,
        # price+delta+gamma+AD-vega vs the f64 CPU oracle
        _run_stage(
            ["--stage", "american64", "--out", p("american64.json"),
             "--prices", p("american64.npy")],
            timeout=1200, retries=0,
        )
        am64 = json.load(open(p("american64.json")))
        result["f64_american_greeks_grids_per_sec"] = round(
            am64["greeks_grids_per_sec"], 2
        )
        result["f64_american_greeks_batch"] = am64["batch"]
        if os.path.exists(p("am_oracle.npy")):
            am64_rel = _greeks_stack_rel(
                np.load(p("american64.npy")), np.load(p("am_oracle.npy"))
            )
            result["f64_american_max_rel_err_vs_cpu_oracle"] = am64_rel
            result["f64_american_meets_1e-6"] = bool(am64_rel <= 1e-6)

    def sub_runner(stage, key, field, timeout=600):
        def run():
            path = p(stage + ".json")
            _run_stage(["--stage", stage, "--out", path],
                       timeout=timeout, retries=0)
            result[key] = round(json.load(open(path))[field], 1)
        return run

    # (name, est_s cold-cache through the tunnel, mandatory, runner) in
    # north-star priority order; mandatory stages run regardless of the
    # deadline (the artifact is worthless without them — and the
    # incremental emit covers an external kill either way)
    # The American trio is mandatory: the f32 SPIKE rung and the df64
    # accuracy rung are half the north-star workload (VERDICT r3 tasks
    # 3-5) and an artifact without them re-opens the round-3 evidence
    # gap. est_s are from the measured round-4 cold-cache run
    # (stage_elapsed_s: probe 553 incl. one timed-out attempt, f32 120,
    # f64 379, oracle 50, american_oracle 28, analytic 517); the
    # persistent compile cache makes warm runs much cheaper.
    stages = [
        ("probe", 60, True, run_probe),
        ("f32", 150, True, run_f32),
        ("f64", 400, True, run_f64),
        ("oracle", 120, True, run_oracle),
        ("american", 300, True, run_american),
        ("american_oracle", 90, True, run_american_oracle),
        ("american64", 300, True, run_american64),
        ("analytic", 550, False,
         sub_runner("analytic", "analytic_sweep_trades_per_sec",
                    "trades_per_sec")),
        ("mc", 200, False,
         sub_runner("mc", "mc_barrier_paths_per_sec", "paths_per_sec")),
        ("scengen", 150, False,
         sub_runner("scengen", "scenario_gen_paths_per_sec",
                    "paths_per_sec")),
        ("exposure", 300, False,
         sub_runner("exposure", "device_exposure_npvs_per_sec",
                    "npvs_per_sec")),
        ("hw1f", 300, False,
         sub_runner("hw1f", "hw1f_pipeline_npvs_per_sec", "npvs_per_sec")),
        ("serving", 500, False, None),  # custom runner below
    ]

    def run_serving():
        # pass the CPU oracle's greeks stack so the stage can prove the
        # shipped-greeks accuracy under the f32-greeks policy
        path = p("serving.json")
        _run_stage(
            ["--stage", "serving", "--out", path,
             "--greeks", p("oracle_greeks.npy")],
            timeout=900, retries=0,
        )
        sj = json.load(open(path))
        result["serving_prices_per_sec"] = round(sj["prices_per_sec"], 1)
        if "served_greeks_max_rel_err" in sj:
            result["serving_greeks_prices_per_sec"] = round(
                sj["greeks_prices_per_sec"], 1
            )
            result["served_greeks_max_rel_err"] = sj[
                "served_greeks_max_rel_err"
            ]

    stages = [
        (n_, e_, m_, run_serving if n_ == "serving" else f_)
        for n_, e_, m_, f_ in stages
    ]
    opt_t0 = None
    opt_budget = None
    for name, est, mandatory, fn in stages:
        if not mandatory and opt_t0 is None:
            # The deadline gates the OPTIONAL stages; the mandatory core
            # runs whatever it costs (per-stage timeouts bound it). Probe
            # cost is tunnel warm-up and flaky-tunnel retries inside the
            # core are not bench work either (measured round 5: one
            # failed f32 attempt cost 1200s and starved every subsystem
            # stage under the old elapsed-based gate) — so the optional
            # stages get whatever deadline remains after the core, but
            # never less than a 1200s floor. Warm-cache subsystem stages
            # cost well under that combined (BENCH_r04: all six inside a
            # 545s total run); the est values only gate COLD-cache runs.
            opt_t0 = time.monotonic()
            probe_s = result["stage_elapsed_s"].get("probe", 0.0)
            opt_budget = max(deadline - (opt_t0 - t_start - probe_s), 1200.0)
        if not mandatory and (time.monotonic() - opt_t0) + est > opt_budget:
            result["skipped_stages"].append(name)
            continue
        t0 = time.monotonic()
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — a failed stage must not
            # zero the whole artifact; record and move on
            result["stage_errors"][name] = str(e)[-800:]
            # a dead device makes every later stage time out too — probe
            # once and degrade the rest of the bench to CPU if it's gone
            if name != "probe" and not os.environ.get("BENCH_FORCE_CPU"):
                try:
                    _run_stage(["--stage", "probe"], timeout=300, retries=0)
                except RuntimeError:
                    print(
                        f"# device lost at stage {name}; forcing CPU for "
                        "the remaining stages",
                        file=sys.stderr,
                    )
                    os.environ["BENCH_FORCE_CPU"] = "1"
                    _DEGRADED_STAGES.append(name)
        result["stage_elapsed_s"][name] = round(time.monotonic() - t0, 1)
        if _DEGRADED_STAGES and "degraded_to_cpu_from_stage" not in result:
            result["degraded_to_cpu_from_stage"] = _DEGRADED_STAGES[0]
        emit()
    if not result["stage_errors"]:
        del result["stage_errors"]
    emit()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--stage",
        choices=[
            "probe", "f32", "f64", "oracle", "american", "american64",
            "american_oracle", "analytic", "exposure", "hw1f", "mc",
            "scengen", "serving",
        ],
    )
    parser.add_argument("--out")
    parser.add_argument("--prices")
    parser.add_argument("--greeks")
    a = parser.parse_args()
    if a.stage == "probe":
        return stage_probe()
    if a.stage == "f32":
        return stage_f32(a.out, a.greeks)
    if a.stage == "f64":
        return stage_f64(a.out, a.prices, a.greeks)
    if a.stage == "oracle":
        return stage_oracle(a.prices, a.greeks)
    if a.stage == "american":
        return stage_american(a.out, a.prices, a.greeks)
    if a.stage == "american64":
        return stage_american64(a.out, a.prices)
    if a.stage == "american_oracle":
        return stage_american_oracle(a.prices)
    if a.stage == "analytic":
        return stage_analytic(a.out)
    if a.stage == "exposure":
        return stage_exposure(a.out)
    if a.stage == "hw1f":
        return stage_hw1f(a.out)
    if a.stage == "mc":
        return stage_mc(a.out)
    if a.stage == "scengen":
        return stage_scengen(a.out)
    if a.stage == "serving":
        return stage_serving(a.out, a.greeks)
    run_bench()


if __name__ == "__main__":
    main()
