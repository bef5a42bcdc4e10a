"""Multi-chip sharding validation on a virtual 8-device CPU mesh.

Runs in a subprocess so ``xla_force_host_platform_device_count`` applies
before jax initializes (the in-process conftest already pinned a 1-device
CPU backend). Exercises the same path as the driver's dryrun_multichip.
"""
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, timeout: int = 600) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, env=env, cwd=REPO,
    )


class TestMultichip:
    def test_dryrun_multichip_8(self):
        out = _run(
            textwrap.dedent(
                """
                import jax
                jax.config.update("jax_platforms", "cpu")
                import __graft_entry__ as g
                g.dryrun_multichip(8)
                assert len(jax.devices()) == 8
                print("DRYRUN_OK")
                """
            )
        )
        assert "DRYRUN_OK" in out.stdout, out.stderr[-2000:]

    def test_chunked_mesh_batch_at_cliff(self):
        """B=4096 through the mesh driver with per-shard chunking: chunk =
        max_chunk * mesh.size, so each device's shard stays under the
        single-chip working-set cliff; output equals the single-device
        chunked run bit-for-bit (f64)."""
        out = _run(
            textwrap.dedent(
                """
                import jax
                jax.config.update("jax_platforms", "cpu")
                jax.config.update("jax_enable_x64", True)
                import numpy as np
                from finite_difference_tpu.models.pde.batch import (
                    build_trade_batch, price_barrier_batch,
                )
                from finite_difference_tpu.parallel import make_mesh

                rng = np.random.default_rng(1)
                B = 4096
                t = 31.0 / 365.0
                tb = build_trade_batch(
                    spots=list(rng.uniform(180.0, 250.0, B)),
                    strikes=[190.0] * B,
                    sigmas=list(rng.uniform(0.2, 0.35, B)),
                    t_expiry=[t] * B, r=[0.0705] * B, b=[0.0705] * B,
                    is_call=[True] * B, n_time_steps=16,
                    monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
                    upper=[260.0] * B, num_space_nodes=63,
                )
                single = price_barrier_batch(
                    tb, n_nodes=64, max_chunk=256, with_greeks=False
                )
                mesh = make_mesh(8, axis_names=("data",))
                # mesh path chunks at max_chunk*mesh.size = 2048 -> 2 launches
                sharded = price_barrier_batch(
                    tb, n_nodes=64, mesh=mesh, max_chunk=256, with_greeks=False
                )
                np.testing.assert_array_equal(
                    np.asarray(sharded["price"]), np.asarray(single["price"])
                )
                print("CLIFF_OK")
                """
            )
        )
        assert "CLIFF_OK" in out.stdout, out.stderr[-2000:]

    def test_sharded_batch_matches_single_device(self):
        """price_barrier_batch over an 8-device mesh == unsharded result."""
        out = _run(
            textwrap.dedent(
                """
                import jax
                jax.config.update("jax_platforms", "cpu")
                jax.config.update("jax_enable_x64", True)
                import numpy as np
                from finite_difference_tpu.models.pde.batch import (
                    build_trade_batch, price_barrier_batch,
                )
                from finite_difference_tpu.parallel import make_mesh

                rng = np.random.default_rng(0)
                B = 32
                t = 31.0 / 365.0
                tb = build_trade_batch(
                    spots=list(rng.uniform(180.0, 250.0, B)),
                    strikes=[190.0] * B,
                    sigmas=list(rng.uniform(0.2, 0.35, B)),
                    t_expiry=[t] * B, r=[0.0705] * B, b=[0.0705] * B,
                    is_call=[True] * B, n_time_steps=32,
                    monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
                    upper=[260.0] * B, num_space_nodes=127,
                )
                single = price_barrier_batch(tb, n_nodes=128)
                mesh = make_mesh(8, axis_names=("data",))
                sharded = price_barrier_batch(tb, n_nodes=128, mesh=mesh)
                for k in single:
                    np.testing.assert_allclose(
                        sharded[k], single[k], rtol=1e-12, err_msg=k
                    )
                print("SHARDED_OK")
                """
            )
        )
        assert "SHARDED_OK" in out.stdout, out.stderr[-2000:]


class TestMeshSpike:
    """The SPIKE pallas kernels under the mesh via shard_map (VERDICT r4
    task 2): each device launches the kernel on its LOCAL shard of the
    trade axis — same kernel as the single-chip headline, zero
    collectives. Interpret mode stands in for the TPU pallas lowering on
    the virtual CPU mesh (same math, tests/test_pallas_kernel.py pins
    interpret == hoisted XLA)."""

    def test_barrier_spike_sharded_matches_unsharded_with_padding(self):
        """B=36 over 8 devices: the driver pads to mesh.size (40, local 5)
        and slices back; results equal the unsharded spike run exactly."""
        out = _run(
            textwrap.dedent(
                """
                import jax
                jax.config.update("jax_platforms", "cpu")
                import numpy as np
                from finite_difference_tpu.models.pde.batch import (
                    build_trade_batch, price_barrier_batch,
                )
                from finite_difference_tpu.parallel import make_mesh

                rng = np.random.default_rng(0)
                B = 36
                t = 31.0 / 365.0
                tb = build_trade_batch(
                    spots=list(rng.uniform(180.0, 250.0, B)),
                    strikes=[190.0] * B,
                    sigmas=list(rng.uniform(0.2, 0.35, B)),
                    t_expiry=[t] * B, r=[0.0705] * B, b=[0.0705] * B,
                    is_call=[True] * B, n_time_steps=32,
                    monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
                    upper=[260.0] * B, num_space_nodes=127,
                    dtype=np.float32,
                )
                single = price_barrier_batch(
                    tb, n_nodes=128, solver="spike_interpret"
                )
                mesh = make_mesh(8, axis_names=("data",))
                sharded = price_barrier_batch(
                    tb, n_nodes=128, mesh=mesh, solver="spike_interpret"
                )
                for k in single:
                    assert sharded[k].shape == (B,), (k, sharded[k].shape)
                    np.testing.assert_array_equal(
                        sharded[k], single[k], err_msg=k
                    )
                print("MESH_SPIKE_OK")
                """
            )
        )
        assert "MESH_SPIKE_OK" in out.stdout, out.stderr[-2000:]

    def test_barrier_spike_df64_sharded_matches_unsharded(self):
        out = _run(
            textwrap.dedent(
                """
                import jax
                jax.config.update("jax_platforms", "cpu")
                jax.config.update("jax_enable_x64", True)
                import numpy as np
                from finite_difference_tpu.models.pde.batch import (
                    build_trade_batch, price_barrier_batch,
                )
                from finite_difference_tpu.parallel import make_mesh

                rng = np.random.default_rng(1)
                # tiny shapes: the df64 interpreter costs ~1 min PER
                # compile even at B=16 x 8 steps x 64 nodes; the shard_map
                # structure under test is shape-independent
                B = 16
                t = 31.0 / 365.0
                tb = build_trade_batch(
                    spots=list(rng.uniform(180.0, 250.0, B)),
                    strikes=[190.0] * B,
                    sigmas=list(rng.uniform(0.2, 0.35, B)),
                    t_expiry=[t] * B, r=[0.0705] * B, b=[0.0705] * B,
                    is_call=[True] * B, n_time_steps=8,
                    monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
                    upper=[260.0] * B, num_space_nodes=63,
                )
                single = price_barrier_batch(
                    tb, n_nodes=64, solver="spike_df64_interpret"
                )
                mesh = make_mesh(8, axis_names=("data",))
                sharded = price_barrier_batch(
                    tb, n_nodes=64, mesh=mesh, solver="spike_df64_interpret"
                )
                for k in single:
                    np.testing.assert_array_equal(
                        sharded[k], single[k], err_msg=k
                    )
                print("MESH_DF64_OK")
                """
            ),
            # the df64 pallas interpreter costs ~1 min per compile even
            # at tiny shapes; leave headroom for contended hosts
            timeout=1200,
        )
        assert "MESH_DF64_OK" in out.stdout, out.stderr[-2000:]

    def test_american_dividend_spike_sharded_matches_unsharded(self):
        """Dividend-bearing American batch: the spline jump between
        pallas launches runs per-device on local shards."""
        out = _run(
            textwrap.dedent(
                """
                import jax
                jax.config.update("jax_platforms", "cpu")
                jax.config.update("jax_enable_x64", True)
                import numpy as np
                from finite_difference_tpu.models.pde.batch import (
                    build_american_batch, price_american_batch,
                )
                from finite_difference_tpu.parallel import make_mesh

                rng = np.random.default_rng(2)
                B = 16
                tb = build_american_batch(
                    spots=list(rng.uniform(80.0, 120.0, B)),
                    strikes=[100.0] * B,
                    sigmas=list(rng.uniform(0.15, 0.3, B)),
                    t_expiry=[1.0] * B, r=[0.06] * B, b=[0.06] * B,
                    is_call=[False] * B, n_time_steps=32,
                    num_space_nodes=127,
                    dividends_tau=[[(0.1, 1.5), (0.6, 1.0)]] * B,
                )
                single = price_american_batch(
                    tb, n_nodes=128, solver="spike_interpret"
                )
                mesh = make_mesh(8, axis_names=("data",))
                sharded = price_american_batch(
                    tb, n_nodes=128, mesh=mesh, solver="spike_interpret"
                )
                for k in single:
                    np.testing.assert_array_equal(
                        sharded[k], single[k], err_msg=k
                    )
                print("MESH_AM_DIV_OK")
                """
            )
        )
        assert "MESH_AM_DIV_OK" in out.stdout, out.stderr[-2000:]


class TestShardedDeviceExposure:
    def test_path_sharded_exposure_matches_unsharded(self):
        """DeviceExposureEngine with the cube's path axis sharded over an
        8-device mesh == unsharded output (embarrassingly parallel)."""
        out = _run(
            textwrap.dedent(
                """
                import datetime as dt
                import jax
                jax.config.update("jax_platforms", "cpu")
                jax.config.update("jax_enable_x64", True)
                import numpy as np, jax.numpy as jnp
                from jax.sharding import NamedSharding, PartitionSpec as P
                from finite_difference_tpu.instruments.cashflow import LegType, SwapLeg
                from finite_difference_tpu.instruments.ir_swap import IRSwap
                from finite_difference_tpu.parallel import make_mesh
                from finite_difference_tpu.xva.device_exposure import (
                    DeviceExposureEngine,
                )

                VAL = dt.date(2025, 7, 28)
                TENORS = np.array([0.25, 0.5, 1.0, 2.0, 3.0, 5.0])
                rng = np.random.default_rng(0)
                n_times, n_paths = 14, 64
                dates = [VAL + dt.timedelta(days=30 * i) for i in range(n_times)]
                cube = 0.07 + rng.normal(0, 0.002, (n_times, n_paths, TENORS.size)).cumsum(axis=0)
                swap = IRSwap(
                    name="irs", effective_date=VAL,
                    maturity_date=dt.date(2026, 7, 28), notional=1e6,
                    receive_leg=SwapLeg(LegType.FLOATING, frequency=3, curve_name="C"),
                    pay_leg=SwapLeg(LegType.FIXED, frequency=3, fixed_rate=0.075),
                    discount_curve_name="C",
                )
                plain = np.asarray(
                    DeviceExposureEngine(dates, {"C": cube}, TENORS).mtm([swap])
                )
                mesh = make_mesh(8, axis_names=("data",))
                sharded_cube = jax.device_put(
                    jnp.asarray(cube), NamedSharding(mesh, P(None, "data", None))
                )
                sharded = np.asarray(
                    DeviceExposureEngine(dates, {"C": sharded_cube}, TENORS).mtm([swap])
                )
                np.testing.assert_allclose(sharded, plain, rtol=1e-12)
                print("DEV_EXPO_SHARDED_OK")
                """
            )
        )
        assert "DEV_EXPO_SHARDED_OK" in out.stdout, out.stderr[-2000:]


class TestShardedReductions:
    def test_mean_stderr_matches_numpy(self):
        out = _run(
            textwrap.dedent(
                """
                import jax
                jax.config.update("jax_platforms", "cpu")
                jax.config.update("jax_enable_x64", True)
                import numpy as np, jax.numpy as jnp
                from finite_difference_tpu.parallel import (
                    make_mesh, sharded_mean_stderr, sharded_exposure_profile,
                )
                mesh = make_mesh(8, axis_names=("data",))
                rng = np.random.default_rng(0)
                v = rng.normal(5.0, 2.0, size=4096)
                mean, se = sharded_mean_stderr(jnp.asarray(v), mesh)
                np.testing.assert_allclose(float(mean), v.mean(), rtol=1e-12)
                np.testing.assert_allclose(
                    float(se), v.std(ddof=1) / np.sqrt(len(v)), rtol=1e-10
                )
                mtm = rng.normal(0.0, 3.0, size=(4096, 7))
                ee, pfe = sharded_exposure_profile(jnp.asarray(mtm), mesh)
                exp = np.maximum(mtm, 0.0)
                np.testing.assert_allclose(np.asarray(ee), exp.mean(axis=0), rtol=1e-12)
                np.testing.assert_allclose(
                    np.asarray(pfe), np.quantile(exp, 0.95, axis=0), rtol=1e-10
                )
                print("REDUCE_OK")
                """
            )
        )
        assert "REDUCE_OK" in out.stdout, out.stderr[-2000:]
