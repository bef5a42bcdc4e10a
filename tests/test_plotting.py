"""Plot-style observability (the reference's matplotlib analogs)."""
import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.utils.plotting import (
    plot_convergence,
    plot_exposure_profile,
    plot_path_fan,
)
from finite_difference_tpu.xva.exposure_engine import ExposureProfile


def _profile(n_paths=50, n_times=12):
    rng = np.random.default_rng(0)
    mtm = rng.normal(100.0, 30.0, (n_paths, n_times)).cumsum(axis=1)
    net = mtm
    return ExposureProfile(
        netting_set_id="NS-1",
        dates=tuple(dt.date(2025, 7, 28) + dt.timedelta(days=30 * i) for i in range(n_times)),
        mtm=mtm,
        collateral=np.zeros_like(mtm),
        exposure=np.maximum(net, 0.0),
        neg_exposure=np.minimum(net, 0.0),
        currency="ZAR",
    )


def test_exposure_profile_plot(tmp_path):
    out = tmp_path / "profile.png"
    fig = plot_exposure_profile(_profile(), save_path=str(out))
    assert out.exists() and out.stat().st_size > 5_000
    assert fig is not None


def test_path_fan_plot(tmp_path):
    rng = np.random.default_rng(1)
    paths = 100.0 * np.exp(rng.normal(0, 0.02, (200, 50)).cumsum(axis=1))
    out = tmp_path / "fan.png"
    plot_path_fan(np.arange(50) / 365.0, paths, save_path=str(out))
    assert out.exists() and out.stat().st_size > 5_000


def test_convergence_plot(tmp_path):
    rows = [{"M": m, "price": 10.0 + 3.0 / m**2} for m in (50, 100, 200, 400)]
    out = tmp_path / "conv.png"
    plot_convergence(rows, save_path=str(out), reference_value=10.0)
    assert out.exists() and out.stat().st_size > 5_000


def test_convergence_plot_without_reference(tmp_path):
    rows = [{"M": m, "price": 10.0 + 3.0 / m} for m in (50, 100)]
    out = tmp_path / "conv2.png"
    plot_convergence(rows, save_path=str(out))
    assert out.exists()


def test_xva_runner_plot_hook(tmp_path):
    from finite_difference_tpu.models.mc.clewlow_strickland import CSParams
    from finite_difference_tpu.runners import run_asset
    from finite_difference_tpu.xva import SimulationConfig
    import numpy as np

    out = tmp_path / "xva.png"
    res = run_asset(
        "TEST",
        initial_curve=np.linspace(100.0, 110.0, 12),
        tenor_days=np.arange(30, 390, 30.0),
        cs_params=CSParams(sigma=0.3, alpha=1.2, mu=0.0),
        sim_cfg=SimulationConfig(num_sims=256, horizon_days=120, dt_days=5),
        plot_path=str(out),
    )
    assert out.exists() and out.stat().st_size > 5_000
    assert np.isfinite(res["cva"])
