"""Device-mesh utilities for multi-chip scenario sweeps and MC.

The reference has no distributed layer at all (SURVEY.md §5.8); the
TPU-native equivalent is a 1-D (or 2-D) ``jax.sharding.Mesh`` with the
trade/path batch axis sharded across chips over ICI. All pricing workloads
here are embarrassingly parallel across trades/paths — collectives appear
only in reductions (MC means, exposure quantiles), which XLA inserts from
sharding annotations (psum/all-reduce over the mesh).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` available devices.

    Default: 1-D 'data' mesh over all devices. Pass ``shape`` +
    ``axis_names`` for N-D meshes (e.g. ('data', 'model') for sweeps that
    also shard the space axis).
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) needs {n_devices} devices but jax "
                f"sees only {len(devs)} ({devs[0].platform}). For a virtual "
                "CPU mesh, set XLA_FLAGS=--xla_force_host_platform_device_"
                f"count={n_devices} and jax.config.update('jax_platforms', "
                "'cpu') BEFORE any jax operation (a fresh subprocess — see "
                "tests/test_multichip.py and __graft_entry__.dryrun_multichip)."
            )
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),)
    if int(np.prod(shape)) != len(devs):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {int(np.prod(shape))} devices, "
            f"got {len(devs)}"
        )
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_pspec(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """NamedSharding that splits the leading batch axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """Place every array leaf with its leading axis sharded over the mesh."""
    sharding = batch_pspec(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k that is >= n."""
    return ((n + k - 1) // k) * k
