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

    def test_american_dividend_batches_bit_identical(self):
        """The native American builder (grids + segmented dividend
        schedules + node snapping) is bit-identical to the per-trade
        Python loop across random batches: mixed calls/puts (the
        Rannacher-restart-at-dividend flag is per-trade), 0-3 dividends
        per trade, snap on and off."""
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch,
        )

        rng = np.random.default_rng(11)
        B = 48
        te = rng.uniform(0.1, 1.2, B)
        divs = []
        for i in range(B):
            nd = int(rng.integers(0, 4))
            divs.append(
                [
                    (float(rng.uniform(0.01, te[i] * 0.95)),
                     float(rng.uniform(0.5, 3.0)))
                    for _ in range(nd)
                ]
            )
        # at least one dividend so the segmented branch (not the uniform
        # fast path) is exercised
        divs[0] = [(float(te[0] / 2.0), 1.0)]
        kw = dict(
            spots=list(rng.uniform(80.0, 120.0, B)),
            strikes=list(rng.uniform(80.0, 120.0, B)),
            sigmas=list(rng.uniform(0.15, 0.4, B)),
            t_expiry=list(te),
            r=list(rng.uniform(0.01, 0.1, B)),
            b=list(rng.uniform(0.0, 0.1, B)),
            is_call=[bool(i % 2) for i in range(B)],
            n_time_steps=96,
            dividends_tau=divs,
            num_space_nodes=201,
        )
        for snap in (False, True):
            tb_py = build_american_batch(
                use_native=False, snap_to_grid=snap, **kw
            )
            tb_cc = build_american_batch(
                use_native=True, snap_to_grid=snap, **kw
            )
            for field in ("x_min", "dx", "strike", "s_eff", "spot", "dt",
                          "theta", "tau_next", "div_amount", "sigma", "r",
                          "b"):
                np.testing.assert_array_equal(
                    getattr(tb_cc, field), getattr(tb_py, field),
                    err_msg=f"{field} snap={snap}",
                )
            np.testing.assert_array_equal(
                tb_cc.reset_lambda, tb_py.reset_lambda
            )
            np.testing.assert_array_equal(tb_cc.monitor, tb_py.monitor)

    def test_american_too_many_dividends_raises(self):
        """Segment steps exceeding n_time_steps raise on both paths."""
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch,
        )

        kw = dict(
            spots=[100.0], strikes=[100.0], sigmas=[0.3], t_expiry=[1.0],
            r=[0.05], b=[0.05], is_call=[False], n_time_steps=4,
            dividends_tau=[[(0.01 * (k + 1), 1.0) for k in range(8)]],
        )
        with pytest.raises(ValueError, match="exceeded n_time_steps"):
            build_american_batch(use_native=False, **kw)
        with pytest.raises(ValueError, match="exceeded n_time_steps"):
            build_american_batch(use_native=True, **kw)

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
