"""Benchmark: batched 1024x512 Crank-Nicolson barrier grids/sec per chip.

Prints ONE JSON line covering the WHOLE north-star sentence
(BASELINE.json: ">=10k batched 1024x512 CN barrier grids/sec on a v5p-8
with <=1e-6 rel err vs the CPU reference"; 8 chips -> 1250 grids/s/chip):

  - f32 throughput rung (price-only, the headline `value`),
  - f32 greeks rung (price+delta+gamma+vega+theta via one-sided sigma bump),
  - f64 accuracy rung: throughput AND max rel err vs an f64 CPU oracle of
    the SAME trades/grids (must show <=1e-6),
  - far-barrier European-limit cross-check vs Black-76 closed form.

Stages run in subprocesses so each gets the right jax config before
backend init (x64 for the f64 rung; forced-cpu for the oracle — the
preloaded TPU plugin ignores JAX_PLATFORMS, so the oracle re-execs with
jax.config.update('jax_platforms','cpu') like tests/conftest.py).
Timing note: on the tunneled TPU platform block_until_ready does not
reliably block, so every timed iteration materializes to host (np.asarray).
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
N_SPACE_NODES = 1023  # -> 1024 grid nodes
N_STEPS = 512
T_EXP = 31.0 / 365.0
BASELINE_PER_CHIP = 1250.0  # 10k grids/s on v5p-8 / 8 chips


def make_batch(B: int, dtype):
    """The benchmark trade set (seeded): 1-month up-and-out calls, 24 daily
    monitors, far barrier H=420 so the European limit is a closed form.
    The spectral interval layout is attached so kernels can run either
    solver ('spectral' is the production default via price_barrier_batch)."""
    from dataclasses import replace

    from finite_difference_tpu.models.pde.batch import (
        _spectral_layout,
        build_trade_batch,
    )

    rng = np.random.default_rng(0)
    spots = rng.uniform(180.0, 250.0, B)
    sigmas = rng.uniform(0.2, 0.35, B)
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
    tb = replace(tb, sp_k_end=lay[0], sp_apply=lay[1], sp_rann=lay[2])
    return tb, spots, sigmas


def _timed_kernel(dev, with_greeks: bool, iters: int, solver: str = "scan"):
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
                    solver=solver,
                ).values()
            )
        )
    )
    out = np.asarray(fn(dev))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn(dev))
    return out[0], time.perf_counter() - t0


def stage_f32(out_path: str) -> None:
    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    B = 1024 if on_tpu else 16
    iters = 20 if on_tpu else 1
    g_iters = 8 if on_tpu else 1
    tb, spots, sigmas = make_batch(B, np.float32 if on_tpu else np.float64)
    dev = jax.tree.map(jnp.asarray, tb)

    # headline = the production auto-routing: on TPU the f32 path stays on
    # the CN scan (TPU f32 matmul accumulation noise makes the spectral
    # transforms ~1e-2 on cheap trades — docs/PERF_NOTES.md); the spectral
    # f32 number is reported alongside with its own accuracy field.
    p_np, elapsed = _timed_kernel(dev, with_greeks=False, iters=iters, solver="scan")
    grids_per_sec = B * iters / elapsed

    sp_np, sp_elapsed = _timed_kernel(
        dev, with_greeks=False, iters=max(1, iters // 2), solver="spectral"
    )
    spectral_grids_per_sec = B * max(1, iters // 2) / sp_elapsed

    _, g_elapsed = _timed_kernel(
        dev, with_greeks=True, iters=g_iters, solver="scan"
    )
    greeks_grids_per_sec = B * g_iters / g_elapsed
    if on_tpu and greeks_grids_per_sec < 0.25 * grids_per_sec:
        # working-set cliff: the greeks program holds two solves; retry at
        # half batch (the chunked production driver does the same)
        tb2, _, _ = make_batch(B // 2, np.float32)
        dev2 = jax.tree.map(jnp.asarray, tb2)
        _, g_elapsed = _timed_kernel(dev2, with_greeks=True, iters=g_iters)
        greeks_grids_per_sec = max(
            greeks_grids_per_sec, (B // 2) * g_iters / g_elapsed
        )

    # far-barrier European-limit cross-check vs Black-76 closed form
    from finite_difference_tpu.models.analytic import generalized_bs_price

    ref = np.asarray(
        generalized_bs_price(
            jnp.asarray(np.asarray(spots, np.float64)),
            190.0,
            jnp.asarray(np.asarray(sigmas, np.float64)),
            T_EXP,
            0.0705,
            0.0705,
            True,
        ),
        dtype=np.float64,
    )
    rel_err = float(
        np.max(np.abs(p_np.astype(np.float64) - ref) / np.maximum(ref, 1e-8))
    )
    sp_rel_err = float(
        np.max(np.abs(sp_np.astype(np.float64) - ref) / np.maximum(ref, 1e-8))
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "grids_per_sec": grids_per_sec,
                "greeks_grids_per_sec": greeks_grids_per_sec,
                "spectral_grids_per_sec": spectral_grids_per_sec,
                "spectral_far_barrier_max_rel_err_vs_bs": sp_rel_err,
                "batch": B,
                "iters": iters,
                "platform": "tpu" if on_tpu else "cpu",
                "device_kind": jax.devices()[0].device_kind,
                "far_barrier_max_rel_err_vs_bs": rel_err,
            },
            f,
        )


def stage_f64(out_path: str, prices_path: str) -> None:
    import jax

    jax.config.update("jax_enable_x64", True)
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # B=512 sits just under the f64 working-set cliff (measured: 1304
    # grids/s at B=256, 1411 at B=512 on the v5e)
    B = 512 if on_tpu else 8
    iters = 4 if on_tpu else 1
    tb, _, _ = make_batch(B, np.float64)
    dev = jax.tree.map(jnp.asarray, tb)
    # production auto-routing sends f64 to the spectral propagator
    # (exact to ~1e-11 vs the scan; 2.4x the scan's f64 throughput)
    p_np, elapsed = _timed_kernel(
        dev, with_greeks=False, iters=iters, solver="spectral"
    )
    np.save(prices_path, p_np.astype(np.float64))
    with open(out_path, "w") as f:
        json.dump(
            {
                "grids_per_sec": B * iters / elapsed,
                "batch": B,
                "platform": "tpu" if on_tpu else "cpu",
            },
            f,
        )


def stage_oracle(prices_path: str) -> None:
    """f64 CPU oracle of the same trades (forced-cpu jax)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_ORACLE_B", "256"))
    tb, _, _ = make_batch(B, np.float64)
    dev = jax.tree.map(jnp.asarray, tb)
    p_np, _ = _timed_kernel(dev, with_greeks=False, iters=0)
    np.save(prices_path, p_np.astype(np.float64))


def _run_stage(args, timeout=3600):
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")] + args,
        cwd=HERE,
        timeout=timeout,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench stage {args} failed:\n{proc.stdout[-2000:]}\n"
            f"{proc.stderr[-2000:]}"
        )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", choices=["f32", "f64", "oracle"])
    parser.add_argument("--out")
    parser.add_argument("--prices")
    a = parser.parse_args()
    if a.stage == "f32":
        return stage_f32(a.out)
    if a.stage == "f64":
        return stage_f64(a.out, a.prices)
    if a.stage == "oracle":
        return stage_oracle(a.prices)

    with tempfile.TemporaryDirectory() as td:
        f32_json = os.path.join(td, "f32.json")
        f64_json = os.path.join(td, "f64.json")
        f64_npy = os.path.join(td, "f64.npy")
        oracle_npy = os.path.join(td, "oracle.npy")
        _run_stage(["--stage", "f32", "--out", f32_json])
        _run_stage(["--stage", "f64", "--out", f64_json, "--prices", f64_npy])
        f32 = json.load(open(f32_json))
        f64 = json.load(open(f64_json))
        os.environ["BENCH_ORACLE_B"] = str(f64["batch"])
        _run_stage(["--stage", "oracle", "--prices", oracle_npy])
        p64 = np.load(f64_npy)
        oracle = np.load(oracle_npy)
        f64_rel = float(np.max(np.abs(p64 - oracle) / np.maximum(np.abs(oracle), 1e-8)))

    gps = f32["grids_per_sec"]
    result = {
        "metric": "cn_barrier_grids_per_sec_per_chip_1024x512",
        "value": round(gps, 2),
        "unit": "grids/sec",
        "vs_baseline": round(gps / BASELINE_PER_CHIP, 4),
        "batch": f32["batch"],
        "iters": f32["iters"],
        "dtype": "float32",
        "platform": f32["platform"],
        "device_kind": f32["device_kind"],
        "far_barrier_max_rel_err_vs_bs": f32["far_barrier_max_rel_err_vs_bs"],
        "greeks_grids_per_sec": round(f32["greeks_grids_per_sec"], 2),
        "greeks_vs_baseline": round(
            f32["greeks_grids_per_sec"] / BASELINE_PER_CHIP, 4
        ),
        "f32_spectral_grids_per_sec": round(f32["spectral_grids_per_sec"], 2),
        "f32_spectral_max_rel_err_vs_bs": f32[
            "spectral_far_barrier_max_rel_err_vs_bs"
        ],
        "f64_solver": "spectral",
        "f64_grids_per_sec": round(f64["grids_per_sec"], 2),
        "f64_vs_baseline": round(f64["grids_per_sec"] / BASELINE_PER_CHIP, 4),
        "f64_max_rel_err_vs_cpu_oracle": f64_rel,
        "f64_meets_1e-6": bool(f64_rel <= 1e-6),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
