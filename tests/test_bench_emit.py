"""The bench artifact must fit the driver's stdout-tail capture window.

Round 4's merged JSON line grew past the driver's ~2000-char tail and the
headline `value` was truncated away (BENCH_r04.json parsed=null). bench.py
now prints a compact (<1900-byte) line AFTER every full merged-line emit,
so the last complete line inside any 2000-char tail is always the compact
artifact. These tests pin that contract without running the (slow) bench.
"""
import importlib.util
import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _worst_case_result(bench):
    """Every COMPACT_KEY populated with realistically-wide values (long
    device_kind, full-precision floats, a degraded stage, skipped list)."""
    r = {
        "metric": "cn_barrier_grids_per_sec_per_chip_1024x512",
        "value": 39123.456789,
        "unit": "grids/sec",
        "vs_baseline": 31.298765,
        "solver": "spike_df64",
        "batch": 4096,
        "platform": "tpu",
        "device_kind": "TPU v5 lite with a very long descriptive name",
        "far_barrier_max_rel_err_vs_bs": 0.0004995650129033987,
        "greeks_grids_per_sec": 20805.363636,
        "f64_grids_per_sec": 6573.212121,
        "f64_vs_baseline": 5.25861111,
        "f64_max_rel_err_vs_cpu_oracle": 1.5086310207771416e-11,
        "f64_meets_1e-6": True,
        "f64_greeks_grids_per_sec": 4708.161616,
        "f64_greeks_max_rel_err_vs_cpu_oracle": 2.8868797480488482e-09,
        "f64_greeks_meets_1e-6": True,
        "f32_american_grids_per_sec": 37138.661234,
        "f32_american_greeks_grids_per_sec": 20720.291234,
        "f32_american_div_grids_per_sec": 13809.311234,
        "f32_american_max_rel_err_vs_cpu_oracle": 0.0017589388277327222,
        "f64_american_greeks_grids_per_sec": 3832.271234,
        "f64_american_max_rel_err_vs_cpu_oracle": 5.001665557491384e-07,
        "f64_american_meets_1e-6": True,
        "mesh_spike_grids_per_sec": 31234.561234,
        "served_greeks_max_rel_err": 2.8868797480488482e-09,
        "serving_prices_per_sec": 9123.456789,
        "serving_greeks_prices_per_sec": 5388.123456,
        "elapsed_s": 1545.5,
        "skipped_stages": ["analytic", "mc", "scengen", "exposure",
                           "hw1f", "serving"],
        "degraded_to_cpu_from_stage": "american_oracle",
        # non-compact diagnostics that must NOT leak onto the line
        "stage_elapsed_s": {"probe": 553.0, "f32": 120.0},
        "stage_errors": {"analytic": "x" * 800},
        "f32_greeks_rel_gamma": 0.131,
    }
    assert set(bench.COMPACT_KEYS) <= set(r), "test must cover every key"
    return r


def test_compact_line_fits_driver_window(bench):
    line = bench.compact_line(_worst_case_result(bench))
    assert len(line) < 1900
    parsed = json.loads(line)
    # the north-star fields the judge reads
    assert parsed["metric"] == "cn_barrier_grids_per_sec_per_chip_1024x512"
    assert parsed["value"] == pytest.approx(39123.5, rel=1e-4)
    assert parsed["vs_baseline"] > 0
    assert parsed["f64_meets_1e-6"] is True
    # diagnostics stay off the compact line
    assert "stage_elapsed_s" not in parsed
    assert "stage_errors" not in parsed
    assert "f32_greeks_rel_gamma" not in parsed


def test_compact_line_partial_result(bench):
    # a kill after the first stage leaves only the seed fields — the
    # compact line must still be valid JSON with the headline present
    r = {
        "metric": "cn_barrier_grids_per_sec_per_chip_1024x512",
        "value": 0.0,
        "unit": "grids/sec",
        "vs_baseline": 0.0,
        "stage_elapsed_s": {},
        "stage_errors": {},
        "skipped_stages": [],
        "elapsed_s": 1.5,
    }
    parsed = json.loads(bench.compact_line(r))
    assert parsed["value"] == 0.0
    assert "stage_errors" not in parsed


def test_run_bench_last_line_is_compact(bench, monkeypatch, capsys):
    """Drive the real orchestrator with every stage subprocess failing —
    the LAST stdout line must still be a complete compact JSON object
    (this is exactly what the driver's tail capture sees)."""
    def boom(args, timeout=0, retries=0):
        raise RuntimeError("stage unavailable in test")

    monkeypatch.setattr(bench, "_run_stage", boom)
    monkeypatch.setenv("BENCH_FORCE_CPU", "1")
    monkeypatch.setenv("BENCH_DEADLINE_S", "0")
    bench.run_bench()
    out = capsys.readouterr().out.strip().splitlines()
    last = json.loads(out[-1])
    assert len(out[-1]) < 1900
    assert last["metric"] == "cn_barrier_grids_per_sec_per_chip_1024x512"
    assert "value" in last and "vs_baseline" in last
    # simulate the driver: keep the final 2000 chars, parse the last
    # complete line inside the window
    tail = "\n".join(out)[-2000:]
    tail_last = tail.splitlines()[-1]
    assert json.loads(tail_last)["metric"] == last["metric"]
