"""Sustained intraday repricing loop (serving pattern).

Keeps the trade batch device-resident and re-prices on simulated market
ticks (vol surface + spot updates). This is the deployment shape the batch
drivers are built for: the (B, n_steps) schedule arrays upload once; each
tick only replaces the small per-trade market fields, so steady-state
throughput is the kernel rate, not the transfer rate (docs/PERF_NOTES.md).

Run on the TPU:  python examples/serving_loop.py  (first compile 20-40 s)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --cpu: force the CPU backend in-process (the preloaded TPU plugin
# ignores the JAX_PLATFORMS env var, so an env-only override can't work)
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")


import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from finite_difference_tpu.models.pde.batch import (
    build_trade_batch,
    price_batch_kernel,
)

# positional overrides: [B] [ticks] (e.g. `serving_loop.py 16 2 --cpu`
# is the CI smoke shape; defaults are the production serving shape)
_ints = [a for a in sys.argv[1:] if a.isdigit()]
B = int(_ints[0]) if _ints else 1024
N_NODES = 1024 if B >= 256 else 128
N_STEPS = 512 if B >= 256 else 64
TICKS = int(_ints[1]) if len(_ints) > 1 else 10


def main():
    rng = np.random.default_rng(0)
    t = 31.0 / 365.0
    host_batch = build_trade_batch(
        spots=list(rng.uniform(180.0, 250.0, B)),
        strikes=[190.0] * B,
        sigmas=list(rng.uniform(0.2, 0.35, B)),
        t_expiry=[t] * B,
        r=[0.0705] * B,
        b=[0.0705] * B,
        is_call=[True] * B,
        n_time_steps=N_STEPS,
        monitor_times=[[t * (k + 1) / 24.0 for k in range(24)]] * B,
        upper=[260.0] * B,
        num_space_nodes=N_NODES - 1,
    )
    dev = jax.tree.map(jnp.asarray, host_batch)  # one-time upload

    fn = jax.jit(price_batch_kernel, static_argnames=("n_nodes", "with_greeks"))
    out = fn(dev, n_nodes=N_NODES, with_greeks=False)
    _ = np.asarray(out["price"])  # warm compile
    print(f"compiled; initial mean price {float(np.mean(_)):.4f}")

    total = 0.0
    for tick in range(TICKS):
        # market tick: vols shift, spots drift (tiny host->device transfer)
        new_sigma = dev.sigma * (1.0 + 0.01 * np.float32(rng.normal()))
        new_spot = dev.s_eff * (1.0 + 0.001 * np.float32(rng.normal()))
        dev = dataclasses.replace(dev, sigma=new_sigma, s_eff=new_spot,
                                  spot=new_spot)
        t0 = time.perf_counter()
        prices = np.asarray(fn(dev, n_nodes=N_NODES, with_greeks=False)["price"])
        el = time.perf_counter() - t0
        total += el
        print(f"tick {tick}: {el * 1e3:6.1f} ms  {B / el:8.0f} grids/s  "
              f"mean {prices.mean():.4f}")
    print(f"steady state: {B * TICKS / total:.0f} grids/s")


if __name__ == "__main__":
    main()
