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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
