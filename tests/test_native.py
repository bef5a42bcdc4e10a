import numpy as np
import pytest

from finite_difference_tpu import native
from finite_difference_tpu.models.pde.batch import build_trade_batch


def _kwargs(B=64, seed=0):
    rng = np.random.default_rng(seed)
    t = 31.0 / 365.0
    return dict(
        spots=list(rng.uniform(180.0, 250.0, B)),
        strikes=list(rng.uniform(150.0, 230.0, B)),
        sigmas=list(rng.uniform(0.2, 0.35, B)),
        t_expiry=list(rng.uniform(0.05, 0.5, B)),
        r=[0.0705] * B,
        b=[0.0705] * B,
        is_call=[True] * B,
        n_time_steps=128,
        monitor_times=[
            [float(t * (k + 1) / 8.0) for k in range(int(rng.integers(1, 12)))]
            for _ in range(B)
        ],
        upper=[300.0 if i % 2 == 0 else None for i in range(B)],
        lower=[None if i % 3 else 100.0 for i in range(B)],
        num_space_nodes=255,
    )


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestNativeBatchBuilder:
    def test_matches_python_reference(self):
        kw = _kwargs()
        tb_py = build_trade_batch(use_native=False, **kw)
        tb_cc = build_trade_batch(use_native=True, **kw)
        for field in ("x_min", "dx", "dt", "theta", "tau_next", "strike",
                      "sigma", "lower", "upper", "rebate"):
            np.testing.assert_allclose(
                getattr(tb_cc, field), getattr(tb_py, field), rtol=0, atol=1e-12,
                err_msg=field,
            )
        np.testing.assert_array_equal(tb_cc.monitor, tb_py.monitor)
        np.testing.assert_array_equal(tb_cc.has_lower, tb_py.has_lower)
        np.testing.assert_array_equal(tb_cc.has_upper, tb_py.has_upper)

    def test_ragged_monitor_schedules(self):
        """Trades with different monitor counts map to the same flags as the
        python path (ragged flattening round-trip)."""
        kw = _kwargs(B=17, seed=3)
        tb_py = build_trade_batch(use_native=False, **kw)
        tb_cc = build_trade_batch(use_native=True, **kw)
        np.testing.assert_array_equal(tb_cc.monitor, tb_py.monitor)

    def test_direct_api(self):
        out = native.barrier_log_grids(
            [100.0], [95.0], [0.2], [0.5], [0.0], [120.0],
            [0], [1], 255,
        )
        assert out is not None
        x_min, dx = out
        assert np.isfinite(x_min).all() and (dx > 0).all()
        sch = native.uniform_schedules([0.5], 64, 2, [[0.1, 0.2]])
        assert sch is not None
        dt, theta, tau, mon = sch
        assert theta[0, 0] == 1.0 and theta[0, 2] == 0.5
        assert mon.sum() == 2
