"""Native (C++) host runtime components.

The device compute path is JAX/XLA/Pallas; host-side batch canonicalisation
(per-trade grids and time schedules for 100k+ scenario sweeps) is the piece
worth doing natively. ``fd_native.cpp`` is compiled on first use with the
system g++ into a cached shared library and bound via ctypes; when no
compiler is available the callers fall back to the pure-Python loop
transparently (``available()`` reports which path is active).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "fd_native.cpp")
_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "finite_difference_tpu",
)


def _build() -> Optional[str]:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    lib_path = os.path.join(_CACHE_DIR, "libfdnative.so")
    if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(_SRC):
        return lib_path
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_CACHE_DIR)
    os.close(fd)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    os.replace(tmp, lib_path)
    return lib_path


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8ptr = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64ptr = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.barrier_log_grids.argtypes = [
        dptr, dptr, dptr, dptr, dptr, dptr, u8ptr, u8ptr,
        ctypes.c_int64, ctypes.c_int64, dptr, dptr,
    ]
    lib.barrier_log_grids.restype = None
    lib.uniform_schedules.argtypes = [
        dptr, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        dptr, i64ptr, dptr, dptr, dptr, u8ptr,
    ]
    lib.uniform_schedules.restype = None
    lib.american_batch.argtypes = [
        dptr, dptr, dptr, dptr, u8ptr,
        dptr, dptr, i64ptr,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_uint8,
        dptr, dptr, dptr, dptr,
        dptr, dptr, dptr, dptr, u8ptr, i64ptr,
    ]
    lib.american_batch.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def barrier_log_grids(
    spot_eff, strike, sigma, t_expiry, lower, upper, has_lower, has_upper,
    num_space_nodes: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Vectorised native grid policy; None when the native lib is absent."""
    lib = _load()
    if lib is None:
        return None
    c = lambda a: np.ascontiguousarray(np.asarray(a, dtype=np.float64))
    cu = lambda a: np.ascontiguousarray(np.asarray(a, dtype=np.uint8))
    spot_eff = c(spot_eff)
    B = spot_eff.shape[0]
    x_min = np.empty(B)
    dx = np.empty(B)
    lib.barrier_log_grids(
        spot_eff, c(strike), c(sigma), c(t_expiry), c(lower), c(upper),
        cu(has_lower), cu(has_upper), B, int(num_space_nodes), x_min, dx,
    )
    return x_min, dx


def uniform_schedules(
    t_expiry, n_steps: int, rannacher: int, monitor_times_ragged,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Vectorised native schedules; None when the native lib is absent.

    ``monitor_times_ragged``: sequence of per-trade monitor-time sequences.
    Returns (dt, theta, tau_next, monitor) with shapes (B, n_steps).
    """
    lib = _load()
    if lib is None:
        return None
    t_expiry = np.ascontiguousarray(np.asarray(t_expiry, dtype=np.float64))
    B = t_expiry.shape[0]
    offsets = np.zeros(B + 1, dtype=np.int64)
    for i, mons in enumerate(monitor_times_ragged):
        offsets[i + 1] = offsets[i] + len(mons)
    flat = np.empty(int(offsets[-1]), dtype=np.float64)
    for i, mons in enumerate(monitor_times_ragged):
        flat[offsets[i] : offsets[i + 1]] = np.asarray(mons, dtype=np.float64)

    dt = np.empty((B, n_steps))
    theta = np.empty((B, n_steps))
    tau_next = np.empty((B, n_steps))
    monitor = np.empty((B, n_steps), dtype=np.uint8)
    lib.uniform_schedules(
        t_expiry, B, int(n_steps), int(rannacher), flat, offsets,
        dt, theta, tau_next, monitor,
    )
    return dt, theta, tau_next, monitor


def american_batches(
    spot, strike, sigma, t_expiry, restart_at_div, dividends_ragged,
    n_steps: int, rannacher: int, num_space_nodes: int, s_max_mult: float,
    snap: bool,
):
    """Vectorised native American grids + segmented dividend schedules;
    None when the native lib is absent.

    ``dividends_ragged``: per trade, a sequence of (tau_from_expiry, amount)
    pairs. ``restart_at_div``: per-trade bool — Rannacher restarts after each
    dividend (the American pricer's call-leg policy). Returns a dict of
    arrays bit-identical to the per-trade Python loop in
    models.pde.batch.build_american_batch (grids via american_log_grid,
    schedules via segmented_schedule, optional spot/strike node snapping).
    Raises ValueError when a trade's segment steps exceed ``n_steps`` —
    the same condition the Python loop raises on.
    """
    lib = _load()
    if lib is None:
        return None
    c = lambda a: np.ascontiguousarray(np.asarray(a, dtype=np.float64))
    spot = c(spot)
    B = spot.shape[0]
    offsets = np.zeros(B + 1, dtype=np.int64)
    for i, divs in enumerate(dividends_ragged):
        offsets[i + 1] = offsets[i] + len(divs)
    div_tau = np.empty(int(offsets[-1]), dtype=np.float64)
    div_amt = np.empty(int(offsets[-1]), dtype=np.float64)
    for i, divs in enumerate(dividends_ragged):
        for j, (t, a) in enumerate(divs):
            div_tau[offsets[i] + j] = float(t)
            div_amt[offsets[i] + j] = float(a)

    x_min = np.empty(B)
    dx = np.empty(B)
    spot_out = np.empty(B)
    strike_out = np.empty(B)
    n = int(n_steps)
    dt = np.empty((B, n))
    theta = np.empty((B, n))
    tau_next = np.empty((B, n))
    div_amount = np.empty((B, n))
    reset = np.empty((B, n), dtype=np.uint8)
    status = np.empty(B, dtype=np.int64)
    lib.american_batch(
        spot, c(strike), c(sigma), c(t_expiry),
        np.ascontiguousarray(np.asarray(restart_at_div, dtype=np.uint8)),
        div_tau, div_amt, offsets,
        B, n, int(rannacher), int(num_space_nodes), float(s_max_mult),
        ctypes.c_uint8(1 if snap else 0),
        x_min, dx, spot_out, strike_out,
        dt, theta, tau_next, div_amount, reset, status,
    )
    bad = np.nonzero(status)[0]
    if bad.size:
        raise ValueError(
            f"segment steps exceeded n_time_steps (trade {int(bad[0])})"
        )
    return {
        "x_min": x_min, "dx": dx, "spot": spot_out, "strike": strike_out,
        "dt": dt, "theta": theta, "tau_next": tau_next,
        "div_amount": div_amount, "reset_lambda": reset.astype(bool),
    }
