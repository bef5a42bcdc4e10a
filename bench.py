"""Benchmark: batched 1024x512 Crank-Nicolson barrier grids/sec per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "grids/sec", "vs_baseline": N}

The BASELINE.json north-star is >=10k batched 1024x512 CN barrier grids/sec
on a v5p-8 (8 chips) == 1250 grids/sec/chip; vs_baseline is measured
throughput / 1250. Accuracy is cross-checked in the same run: the
far-barrier European limit must match Black-Scholes.
"""
import json
import math
import sys
import time

import numpy as np


def main() -> None:
    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if not on_tpu:
        # CPU fallback (dev machines): tiny config, still prints the line.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from finite_difference_tpu.models.pde.batch import (
        build_trade_batch,
        price_batch_kernel,
    )

    n_space_nodes = 1023  # -> 1024 grid nodes
    n_steps = 512
    batch = 1024 if on_tpu else 16
    iters = 20 if on_tpu else 1  # ~2s of timed work; tames tunnel jitter
    dtype = np.float32 if on_tpu else np.float64

    rng = np.random.default_rng(0)
    B = batch
    t = 31.0 / 365.0
    spots = rng.uniform(180.0, 250.0, B)
    monitors = [[t * (k + 1) / 24.0 for k in range(24)]] * B
    tb = build_trade_batch(
        spots=spots,
        strikes=[190.0] * B,
        sigmas=list(rng.uniform(0.2, 0.35, B)),
        t_expiry=[t] * B,
        r=[0.0705] * B,
        b=[0.0705] * B,
        is_call=[True] * B,
        n_time_steps=n_steps,
        monitor_times=monitors,
        upper=[420.0] * B,
        num_space_nodes=n_space_nodes,
        dtype=dtype,
    )
    dev = jax.tree.map(jnp.asarray, tb)
    fn = jax.jit(
        lambda b: price_batch_kernel(b, n_nodes=n_space_nodes + 1, with_greeks=False)[
            "price"
        ]
    )
    # compile + warmup. NOTE: on the tunneled TPU platform block_until_ready
    # does not reliably block, so every timed iteration materializes to host
    # (np.asarray) — the copy is ~4KB*B and negligible vs the solve.
    p_np = np.asarray(fn(dev))

    t0 = time.perf_counter()
    for _ in range(iters):
        p_np = np.asarray(fn(dev))
    elapsed = time.perf_counter() - t0
    grids_per_sec = (B * iters) / elapsed
    p = p_np

    # Accuracy cross-check: far-barrier (H=420 vs S~<250 never binds for
    # most trades in 1 month) — compare trade 0 vs closed form
    from finite_difference_tpu.models.analytic import generalized_bs_price

    p_np = np.asarray(p, dtype=np.float64)
    ref = np.asarray(
        generalized_bs_price(
            jnp.asarray(np.asarray(spots, np.float64)),
            190.0,
            jnp.asarray(np.asarray(tb.sigma, np.float64)),
            t,
            0.0705,
            0.0705,
            True,
        )
    )
    # barrier still knocks out some high-spot paths; only score trades with
    # spot far below the barrier where KO prob ~ 0
    mask = spots < 300.0
    rel_err = float(
        np.max(np.abs(p_np[mask] - ref[mask]) / np.maximum(np.abs(ref[mask]), 1e-8))
    )

    result = {
        "metric": "cn_barrier_grids_per_sec_per_chip_1024x512",
        "value": round(grids_per_sec, 2),
        "unit": "grids/sec",
        "vs_baseline": round(grids_per_sec / 1250.0, 4),
        "batch": B,
        "iters": iters,
        "dtype": str(np.dtype(dtype)),
        "platform": "tpu" if on_tpu else "cpu",
        "device_kind": jax.devices()[0].device_kind,
        "far_barrier_max_rel_err_vs_bs": rel_err,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
