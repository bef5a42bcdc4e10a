import jax
jax.config.update("jax_enable_x64", True)
import time, numpy as np, jax.numpy as jnp
from dataclasses import replace
from finite_difference_tpu.models.pde.batch import (
    build_trade_batch, price_batch_kernel, _spectral_layout,
)
T = 31.0/365.0
NS, NST = 1023, 512
def bench(B, iters=3):
    rng = np.random.default_rng(0)
    tb = build_trade_batch(
        spots=list(rng.uniform(180.0, 250.0, B)), strikes=[190.0]*B,
        sigmas=list(rng.uniform(0.2, 0.35, B)), t_expiry=[T]*B,
        r=[0.0705]*B, b=[0.0705]*B, is_call=[True]*B, n_time_steps=NST,
        monitor_times=[[T*(k+1)/24.0 for k in range(24)]]*B,
        upper=[420.0]*B, num_space_nodes=NS, dtype=np.float64,
    )
    lay = _spectral_layout(tb, NS+1, np.float64)
    tb = replace(tb, sp_k_end=lay[0], sp_apply=lay[1], sp_rann=lay[2])
    dev = jax.tree.map(jnp.asarray, tb)
    fn = jax.jit(lambda b: price_batch_kernel(b, n_nodes=NS+1, with_greeks=False, solver="spectral")["price"])
    p = np.asarray(fn(dev))
    t0 = time.perf_counter()
    for _ in range(iters): p = np.asarray(fn(dev))
    dtm = (time.perf_counter()-t0)/iters
    print(f"B={B}: {dtm*1e3:.1f} ms = {B/dtm:,.0f} grids/s", flush=True)
for B in (1024,):
    bench(B)
