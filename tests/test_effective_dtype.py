"""Effective-dtype gating of the spectral route (ADVICE r2 high findings).

In a DEFAULT jax session (``jax_enable_x64`` off — the JAX default) host
float64 batches silently demote to f32 on device. The 'auto' solver route
and the spectral symmetrizer/conditioning thresholds must therefore key
off the EFFECTIVE device dtype, not the host array dtype: before the fix,
a host-f64 batch with symmetrizer exponent in (15, 200] passed the f64
threshold, ran the spectral propagator in f32, and returned garbage
(measured rel err up to ~6e16 vs the scan).

Runs in a subprocess because the in-process conftest enables x64 globally.
"""
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_ENABLE_X64", None)
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, env=env, cwd=REPO,
    )


FIXTURE = """
import jax
jax.config.update("jax_platforms", "cpu")
# x64 deliberately NOT enabled: the default session under test
import numpy as np
from finite_difference_tpu.models.pde.batch import (
    build_trade_batch, price_barrier_batch, solve_value_surfaces,
    _spectral_layout, _effective_is64,
)
from finite_difference_tpu.models.pde.spectral import symmetrizer_exponent

B = 4
N_NODES = 192
# low-vol high-carry regime: symmetrizer exponent lands between the f32
# threshold (15) and the f64 threshold (200), so only the effective-dtype
# gate keeps it off the f32 spectral path
tb = build_trade_batch(
    spots=[100.0] * B, strikes=[100.0] * B, sigmas=[0.08] * B,
    t_expiry=[2.0] * B, r=[0.05] * B, b=[0.10] * B, is_call=[True] * B,
    n_time_steps=64, monitor_times=[[0.5, 1.0, 1.5, 2.0]] * B,
    upper=[150.0] * B, num_space_nodes=N_NODES,
)
assert tb.sigma.dtype == np.float64  # host batch IS f64
assert not _effective_is64(tb, None)  # ... but the device run is f32
expo = symmetrizer_exponent(tb.sigma, tb.b, tb.q, tb.dx, N_NODES)
assert np.all(expo > 15.0) and np.all(expo < 200.0), expo
"""


class TestEffectiveDtypeGating:
    def test_auto_routes_to_scan_without_x64(self):
        """price_barrier_batch solver='auto' must not take the spectral
        path for an effectively-f32 batch whose exponent exceeds the f32
        threshold (ADVICE r2: batch.py:770)."""
        out = _run(
            textwrap.dedent(
                FIXTURE
                + """
assert _spectral_layout(tb, N_NODES) is None  # f32 threshold applies
auto = price_barrier_batch(tb, n_nodes=N_NODES, with_greeks=False,
                           solver="auto")
scan = price_barrier_batch(tb, n_nodes=N_NODES, with_greeks=False,
                           solver="scan")
np.testing.assert_array_equal(auto["price"], scan["price"])
assert np.all(np.isfinite(auto["price"]))
print("AUTO_OK")
"""
            )
        )
        assert "AUTO_OK" in out.stdout, out.stderr[-3000:]

    def test_value_surfaces_auto_routes_to_scan_without_x64(self):
        """solve_value_surfaces applies the same gating (ADVICE r2:
        batch.py:296)."""
        out = _run(
            textwrap.dedent(
                FIXTURE
                + """
va, sa = solve_value_surfaces(tb, N_NODES, solver="auto")
vs, ss = solve_value_surfaces(tb, N_NODES, solver="scan")
np.testing.assert_array_equal(va, vs)
assert np.all(np.isfinite(va))
print("SURF_OK")
"""
            )
        )
        assert "SURF_OK" in out.stdout, out.stderr[-3000:]

    def test_x64_session_still_routes_spectral(self):
        """With x64 ON the same batch is spectral-eligible (exponent < 200)
        and the propagator agrees with the scan — the gate must not
        over-restrict the real f64 rung."""
        out = _run(
            textwrap.dedent(
                """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from finite_difference_tpu.models.pde.batch import (
    build_trade_batch, price_barrier_batch, _spectral_layout,
    _effective_is64,
)

B = 4
N_NODES = 192
tb = build_trade_batch(
    spots=[100.0] * B, strikes=[100.0] * B, sigmas=[0.08] * B,
    t_expiry=[2.0] * B, r=[0.05] * B, b=[0.10] * B, is_call=[True] * B,
    n_time_steps=64, monitor_times=[[0.5, 1.0, 1.5, 2.0]] * B,
    upper=[150.0] * B, num_space_nodes=N_NODES,
)
assert _effective_is64(tb, None)
assert _spectral_layout(tb, N_NODES) is not None
auto = price_barrier_batch(tb, n_nodes=N_NODES, with_greeks=False,
                           solver="auto")
scan = price_barrier_batch(tb, n_nodes=N_NODES, with_greeks=False,
                           solver="scan")
np.testing.assert_allclose(auto["price"], scan["price"], rtol=1e-8,
                           atol=1e-10)
print("X64_OK")
"""
            )
        )
        assert "X64_OK" in out.stdout, out.stderr[-3000:]
