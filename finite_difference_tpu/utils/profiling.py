"""Profiling and throughput harness (first-class, per SURVEY §5.1).

The reference has no tracing/profiling at all; the TPU build treats
``jax.profiler`` traces and grids/sec measurement as part of the product:

- ``trace(logdir)``: context manager around ``jax.profiler.trace`` for
  TensorBoard-viewable device traces;
- ``throughput``: materialized-timing harness (host copies per iteration —
  required on tunneled/async platforms where ``block_until_ready`` can lie,
  see bench.py) returning items/sec with compile excluded.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace", create_perfetto_link: bool = False):
    """Device trace context: view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def throughput(
    fn: Callable[[], object],
    items_per_call: int,
    iters: int = 5,
    warmup: int = 1,
) -> Dict[str, float]:
    """items/sec with host materialization forcing real completion.

    ``fn`` must return a jax array (or pytree); each timed call is followed
    by ``np.asarray`` on the first leaf.
    """
    import jax

    def _materialize(out):
        leaves = jax.tree.leaves(out)
        if leaves:
            np.asarray(leaves[0])
        return out

    for _ in range(max(warmup, 0)):
        _materialize(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        _materialize(fn())
    elapsed = time.perf_counter() - t0
    per_call = elapsed / iters
    return {
        "seconds_per_call": per_call,
        "items_per_sec": items_per_call / per_call,
        "iters": float(iters),
    }
