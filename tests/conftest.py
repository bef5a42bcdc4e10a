"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Tests never require TPU hardware; multi-chip sharding paths are exercised on
the forced-host-platform device mesh, and float64 gives the CPU oracle
precision the accuracy gates (<=1e-6 rel) are stated against.

NOTE: in this environment jax may be preloaded with a TPU ("axon") plugin
that ignores the JAX_PLATFORMS env var, so the platform is forced through
jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_state():
    """Clear JAX's in-process compilation caches after every test module.

    The full suite compiles thousands of distinct XLA programs; letting
    the executables accumulate in one process eventually crashes XLA's
    CPU backend (segfault in backend_compile_and_load after ~500 tests —
    each module passes in isolation). Modules rarely share compiled
    functions (different shapes/configs), so per-module clearing bounds
    the live-executable count at negligible recompile cost.
    """
    yield
    jax.clear_caches()
