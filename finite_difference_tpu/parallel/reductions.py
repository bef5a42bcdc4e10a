"""Sharded reductions for MC and scenario-table aggregation.

The reference's only cross-path interaction is reduce-at-the-end (running
price/stderr sums, mc_discrete_barrier_option.py:392-415; EE/PFE
quantiles, cva.py:47-82). On a mesh these become ``shard_map`` bodies with
``psum``-style collectives over ICI (SURVEY §5.8) — XLA also derives them
automatically from shardings, but the explicit forms here document the
collective layout and give pathwise-sharded MC a numerically-stable
mean/stderr (pairwise within shard, psum across shards).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_mean_stderr(
    values: jnp.ndarray, mesh: Mesh, axis_name: str = "data"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, stderr) of a path-sharded 1-D sample via psum collectives.

    ``values`` is sharded on its only axis over ``axis_name``. Each shard
    reduces locally; n, sum, sum-of-squares combine with ``lax.psum``.
    """
    from jax.experimental.shard_map import shard_map

    n_total = values.shape[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def _reduce(v):
        local_n = v.shape[0]
        s1 = jnp.sum(v)
        s2 = jnp.sum(v * v)
        n = jax.lax.psum(jnp.asarray(local_n, v.dtype), axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0) * n / jnp.maximum(n - 1.0, 1.0)
        stderr = jnp.sqrt(var / n)
        return mean[None], stderr[None]

    mean, stderr = _reduce(values)
    return mean[0], stderr[0]


def sharded_exposure_profile(
    mtm: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "data",
    quantile: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(EE, PFE) per date for path-sharded (n_paths, n_times) MTM.

    EE is an exact psum mean. The PFE quantile needs the full cross-shard
    distribution; an all_gather of the path axis restores it (path counts
    per date are small relative to grids, so this rides ICI cheaply).
    """
    from jax.experimental.shard_map import shard_map

    @partial(
        shard_map, mesh=mesh, in_specs=P(axis_name, None), out_specs=(P(), P()),
        check_rep=False,
    )
    def _reduce(m):
        exposure = jnp.maximum(m, 0.0)
        n = jax.lax.psum(jnp.asarray(m.shape[0], m.dtype), axis_name)
        ee = jax.lax.psum(jnp.sum(exposure, axis=0), axis_name) / n
        full = jax.lax.all_gather(exposure, axis_name, tiled=True)
        pfe = jnp.quantile(full, quantile, axis=0)
        return ee, pfe

    return _reduce(mtm)
