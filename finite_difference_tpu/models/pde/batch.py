"""Batched barrier/vanilla PDE pricing — the framework's north-star workload.

The reference prices scenario tables one grid at a time in Python loops
(run_config_scenarios.py:155-186); here a whole struct-of-arrays batch of
trades (each with its own grid, dynamics, barrier, monitor schedule) is
priced in ONE device program: ``vmap(cn_solve)`` over the batch axis with
price/delta/gamma/vega/theta computed on device. Shard the batch axis over
a ``jax.sharding.Mesh`` for multi-chip sweeps (see ``parallel.mesh``).
"""
from __future__ import annotations

import inspect
import math
import os
from dataclasses import dataclass, replace
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.stencils import nonuniform_central
from .grid import barrier_log_grid, uniform_schedule
from .stepper import BarrierSpec, CNDynamics, CNGrid, CNSchedule, cn_solve


@dataclass
class BarrierTradeBatch:
    """Struct-of-arrays batch of discretely-monitored barrier trades.

    All arrays have leading dim B; schedule arrays are (B, n_steps).
    Build with :func:`build_trade_batch` (host) or assemble directly.
    """

    x_min: np.ndarray
    dx: np.ndarray
    strike: np.ndarray
    is_call: np.ndarray
    sigma: np.ndarray
    r: np.ndarray
    b: np.ndarray
    q: np.ndarray
    lower: np.ndarray
    upper: np.ndarray
    has_lower: np.ndarray
    has_upper: np.ndarray
    rebate: np.ndarray
    rebate_at_hit: np.ndarray
    rebate_rate: np.ndarray
    s_eff: np.ndarray  # spot for price interpolation (escrowed)
    spot: np.ndarray  # spot for greek stencils
    # schedule
    dt: np.ndarray
    theta: np.ndarray
    tau_next: np.ndarray
    monitor: np.ndarray
    div_amount: np.ndarray
    reset_lambda: np.ndarray
    # spectral-solver interval layout (attached by price_barrier_batch when
    # solver='spectral'; None for the scan path)
    sp_k_end: "Optional[np.ndarray]" = None     # (B, n_intervals) int32
    sp_apply: "Optional[np.ndarray]" = None     # (B, n_intervals) bool
    sp_rann: "Optional[np.ndarray]" = None      # (B,) Rannacher step count
    # per-interval dt for monitor-aligned (piecewise-constant) schedules;
    # None when dt is globally uniform (the hoisted fast path)
    sp_dt: "Optional[np.ndarray]" = None        # (B, n_intervals)

    @property
    def batch_size(self) -> int:
        return len(self.x_min)

    @property
    def n_steps(self) -> int:
        return self.dt.shape[1]

    def astype(self, dtype) -> "BarrierTradeBatch":
        out = {}
        for k, v in self.__dict__.items():
            if v is None:
                out[k] = None
                continue
            v = np.asarray(v)
            out[k] = v.astype(dtype) if np.issubdtype(v.dtype, np.floating) else v
        return BarrierTradeBatch(**out)


def build_trade_batch(
    spots: Sequence[float],
    strikes: Sequence[float],
    sigmas: Sequence[float],
    t_expiry: Sequence[float],
    r: Sequence[float],
    b: Sequence[float],
    is_call: Sequence[bool],
    n_time_steps: int,
    monitor_times: Sequence[Sequence[float]],
    lower: Optional[Sequence[Optional[float]]] = None,
    upper: Optional[Sequence[Optional[float]]] = None,
    q: Optional[Sequence[float]] = None,
    rebate: Optional[Sequence[float]] = None,
    rebate_at_hit: Optional[Sequence[bool]] = None,
    rannacher_steps: int = 2,
    num_space_nodes: Optional[int] = None,
    dtype=np.float64,
    use_native: bool = True,
    monitor_aligned: bool = False,
    steps_per_interval: int = 10,
) -> BarrierTradeBatch:
    """Host-side canonicalisation: per-trade grids (production barrier grid
    policy) + per-trade monitor schedules into fixed-shape arrays.

    ``num_space_nodes``: static node-count bucket; defaults to the
    reference's ~4.265*N_time rule evaluated once (it is trade-independent).
    ``use_native``: route grid/schedule construction through the C++ batch
    builder (finite_difference_tpu.native) when it is available; the pure
    numpy loop below is the reference implementation and fallback.
    ``monitor_aligned``: use :func:`grid.monitor_aligned_schedule` (the
    reference CN auto-grid's ">= k steps per monitor interval" layout —
    per-interval constant dt, monitors exactly on step boundaries; also
    spectral-eligible) instead of :func:`grid.uniform_schedule`;
    ``n_time_steps`` then acts as the target-dt divisor T/n. Trades must
    share a monitor-interval structure (same step count) to stack.
    """
    B = len(spots)
    if num_space_nodes is None:
        # reference rule: ceil(domain_width * N_time / (2 sigma sqrt(T)))
        # with domain_width = 2*Phi^-1(0.99999)*sigma*sqrt(T) — trade-free
        from .grid import _PPF_99999

        num_space_nodes = math.ceil(2.0 * _PPF_99999 * n_time_steps / 2.0)

    z = lambda v, d: np.asarray(v if v is not None else [d] * B)
    lower = z(lower, None)
    upper = z(upper, None)
    q = np.asarray(q if q is not None else np.zeros(B), dtype=dtype)
    rebate = np.asarray(rebate if rebate is not None else np.zeros(B), dtype=dtype)
    rebate_at_hit = np.asarray(
        rebate_at_hit if rebate_at_hit is not None else np.zeros(B, dtype=bool)
    )

    if use_native and not monitor_aligned:
        from ... import native as _native

        if _native.available():
            has_lower = np.asarray([x is not None for x in lower])
            has_upper = np.asarray([x is not None for x in upper])
            grids = _native.barrier_log_grids(
                spots, strikes, sigmas, t_expiry,
                [x if x is not None else 0.0 for x in lower],
                [x if x is not None else 0.0 for x in upper],
                has_lower, has_upper, num_space_nodes,
            )
            scheds = _native.uniform_schedules(
                t_expiry, n_time_steps, rannacher_steps, monitor_times
            )
            if grids is not None and scheds is not None:
                x_min, dx = grids
                dt_arr, theta, tau_next, monitor = scheds
                f = lambda v: np.asarray(v, dtype=dtype)
                zeros_sched = np.zeros((B, n_time_steps), dtype=dtype)
                return BarrierTradeBatch(
                    x_min=f(x_min), dx=f(dx), strike=f(strikes),
                    is_call=np.asarray(is_call, dtype=bool),
                    sigma=f(sigmas), r=f(r), b=f(b), q=q.astype(dtype),
                    lower=f([x if x is not None else 0.0 for x in lower]),
                    upper=f([x if x is not None else 0.0 for x in upper]),
                    has_lower=has_lower, has_upper=has_upper,
                    rebate=rebate.astype(dtype), rebate_at_hit=rebate_at_hit,
                    rebate_rate=f(b), s_eff=f(spots), spot=f(spots),
                    dt=dt_arr.astype(dtype), theta=theta.astype(dtype),
                    tau_next=tau_next.astype(dtype),
                    monitor=monitor.astype(bool),
                    div_amount=zeros_sched,
                    reset_lambda=np.zeros((B, n_time_steps), dtype=bool),
                )

    cols: Dict[str, List] = {k: [] for k in (
        "x_min", "dx", "dt", "theta", "tau_next", "monitor", "div_amount",
        "reset_lambda",
    )}
    for i in range(B):
        g = barrier_log_grid(
            spot_eff=float(spots[i]),
            strike=float(strikes[i]),
            sigma=float(sigmas[i]),
            t_expiry=float(t_expiry[i]),
            num_time_steps=n_time_steps,
            lower_barrier=lower[i],
            upper_barrier=upper[i],
            num_space_nodes=num_space_nodes,
        )
        cols["x_min"].append(g.x_min)
        cols["dx"].append(g.dx)
        if monitor_aligned:
            from .grid import monitor_aligned_schedule

            sch = monitor_aligned_schedule(
                float(t_expiry[i]), monitor_times[i],
                steps_per_interval=steps_per_interval,
                target_dt=float(t_expiry[i]) / n_time_steps,
                rannacher_steps=rannacher_steps,
            )
        else:
            sch = uniform_schedule(
                float(t_expiry[i]), n_time_steps, rannacher_steps,
                monitor_times[i],
            )
        cols["dt"].append(sch.dt)
        cols["theta"].append(sch.theta)
        cols["tau_next"].append(sch.tau_next)
        cols["monitor"].append(sch.monitor)
        cols["div_amount"].append(sch.div_amount)
        cols["reset_lambda"].append(sch.reset_lambda)

    f = lambda v: np.asarray(v, dtype=dtype)
    return BarrierTradeBatch(
        x_min=f(cols["x_min"]),
        dx=f(cols["dx"]),
        strike=f(strikes),
        is_call=np.asarray(is_call, dtype=bool),
        sigma=f(sigmas),
        r=f(r),
        b=f(b),
        q=f(q),
        lower=f([x if x is not None else 0.0 for x in lower]),
        upper=f([x if x is not None else 0.0 for x in upper]),
        has_lower=np.asarray([x is not None for x in lower]),
        has_upper=np.asarray([x is not None for x in upper]),
        rebate=rebate,
        rebate_at_hit=rebate_at_hit,
        rebate_rate=f(b),
        s_eff=f(spots),
        spot=f(spots),
        dt=np.stack(cols["dt"]).astype(dtype),
        theta=np.stack(cols["theta"]).astype(dtype),
        tau_next=np.stack(cols["tau_next"]).astype(dtype),
        monitor=np.stack(cols["monitor"]),
        div_amount=np.stack(cols["div_amount"]).astype(dtype),
        reset_lambda=np.stack(cols["reset_lambda"]),
    )


def _solve_one(batch: BarrierTradeBatch, sigma, n_nodes: int):
    """Single-trade closure used under vmap; ``sigma`` may be bumped."""
    grid = CNGrid(batch.x_min, batch.dx)
    dyn = CNDynamics(
        strike=batch.strike, is_call=batch.is_call, sigma=sigma,
        r=batch.r, b=batch.b, q=batch.q,
    )
    bar = BarrierSpec(
        lower=batch.lower, upper=batch.upper,
        has_lower=batch.has_lower, has_upper=batch.has_upper,
        rebate=batch.rebate, rebate_at_hit=batch.rebate_at_hit,
        rebate_rate=batch.rebate_rate,
    )
    sch = CNSchedule(
        dt=batch.dt, theta=batch.theta, tau_next=batch.tau_next,
        monitor=batch.monitor, div_amount=batch.div_amount,
        reset_lambda=batch.reset_lambda,
    )
    return cn_solve(grid, dyn, sch, n_nodes, barrier=bar)


def _spectral_solve_one(
    batch: BarrierTradeBatch, sigma, n_nodes: int, mm_dtype=None
):
    """Single-trade spectral (sine-basis) solve; see models.pde.spectral."""
    from .spectral import spectral_solve

    grid = CNGrid(batch.x_min, batch.dx)
    dyn = CNDynamics(
        strike=batch.strike, is_call=batch.is_call, sigma=sigma,
        r=batch.r, b=batch.b, q=batch.q,
    )
    bar = BarrierSpec(
        lower=batch.lower, upper=batch.upper,
        has_lower=batch.has_lower, has_upper=batch.has_upper,
        rebate=batch.rebate, rebate_at_hit=batch.rebate_at_hit,
        rebate_rate=batch.rebate_rate,
    )
    dt_arg = batch.sp_dt if batch.sp_dt is not None else batch.dt[0]
    return spectral_solve(
        grid, dyn, dt_arg, batch.sp_k_end, batch.sp_apply, n_nodes,
        batch.sp_rann, barrier=bar, mm_dtype=mm_dtype,
    )


def _spectral_solve_one_x64dst(batch, sigma, n_nodes: int):
    """Spectral solve with the DSTs contracted in emulated f64 — rescues
    the f32 path on TPUs with noisy f32 accumulators (requires x64)."""
    return _spectral_solve_one(batch, sigma, n_nodes, mm_dtype=jnp.float64)


def _spectral_solve_one_mixed(batch, sigma, n_nodes: int):
    """Mixed-precision spectral solve: f64 transcendentals + x64 DSTs +
    f32 state/elementwise (spectral.spectral_solve_mixed — the next rung
    of the precision ladder after spectral_x64dst; requires x64, uniform
    dt)."""
    from .spectral import spectral_solve_mixed

    grid = CNGrid(batch.x_min, batch.dx)
    dyn = CNDynamics(
        strike=batch.strike, is_call=batch.is_call, sigma=sigma,
        r=batch.r, b=batch.b, q=batch.q,
    )
    bar = BarrierSpec(
        lower=batch.lower, upper=batch.upper,
        has_lower=batch.has_lower, has_upper=batch.has_upper,
        rebate=batch.rebate, rebate_at_hit=batch.rebate_at_hit,
        rebate_rate=batch.rebate_rate,
    )
    return spectral_solve_mixed(
        grid, dyn, batch.dt[0], batch.sp_k_end, batch.sp_apply, n_nodes,
        batch.sp_rann, barrier=bar,
    )


def _effective_is64(batch: BarrierTradeBatch, dtype) -> bool:
    """True iff the solve will actually run in 64-bit ON DEVICE.

    Host f64 arrays silently demote to f32 when ``jax_enable_x64`` is off,
    so the requested/batch dtype only counts when x64 is enabled — routing
    and conditioning thresholds keyed off the host dtype alone would apply
    f64 limits to an f32 computation (silent overflow in the spectral
    symmetrizer).
    """
    if not jax.config.jax_enable_x64:
        return False
    if dtype is not None:
        return jnp.dtype(dtype).itemsize > 4
    # dtype inspection only — np.asarray on a device array would pull the
    # data back to host just to read .dtype
    sig_dtype = getattr(batch.sigma, "dtype", None)
    if sig_dtype is None:
        return np.asarray(batch.sigma).dtype.itemsize > 4
    return np.dtype(sig_dtype).itemsize > 4


def solve_value_surfaces(
    batch: BarrierTradeBatch,
    n_nodes: int,
    solver: str = "auto",
    american: bool = False,
):
    """(V, s): per-trade value FUNCTIONS over the grid, (B, n_nodes) each.

    The surface form of the batched solve — what an XVA engine's
    ``precompute`` hook wants (price an exotic once per scenario date,
    then interpolate simulated spots against the surface;
    instruments/equity_barrier.py). ``solver='auto'`` routes eligible
    batches through the spectral propagator, with the same effective-dtype
    gating as :func:`price_barrier_batch` (TPU f32 stays on the scan; the
    f32 symmetrizer/conditioning thresholds apply when x64 is off).
    ``american=True`` runs the Ikonen-Toivanen early-exercise solve (scan
    only — the per-step projection is inherently sequential).
    """
    if american:
        # static dividend flag: dividend-free ladders skip compiling the
        # per-step spline-jump machinery (same gating as the price driver)
        with_div = _has_dividends(batch)
        dev = jax.tree.map(jnp.asarray, batch)
        fn = jax.jit(
            lambda b: jax.vmap(
                lambda bt: _solve_one_american(
                    bt, bt.sigma, n_nodes, with_div
                )
            )(b)
        )
        v, s = fn(dev)
        return np.asarray(v), np.asarray(s)
    if solver == "auto" and jax.default_backend() != "cpu" and not _effective_is64(batch, None):
        # TPU f32 matmul accumulation noise — same gate as price_barrier_batch
        solver = "scan"
    if solver in ("auto", "spectral"):
        layout = _spectral_layout(batch, n_nodes)
        if layout is not None:
            batch = replace(
                batch, sp_k_end=layout[0], sp_apply=layout[1],
                sp_rann=layout[2], sp_dt=layout[3],
            )
            solver = "spectral"
        elif solver == "spectral":
            raise ValueError("batch is not spectral-eligible")
        else:
            solver = "scan"
    solve_one = _spectral_solve_one if solver == "spectral" else _solve_one
    dev = jax.tree.map(jnp.asarray, batch)
    fn = jax.jit(
        lambda b: jax.vmap(lambda bt: solve_one(bt, bt.sigma, n_nodes))(b)
    )
    v, s = fn(dev)
    return np.asarray(v), np.asarray(s)


def _resolve_dv_sigma(dv_sigma, sigma) -> float:
    """Dtype-aware one-sided vega bump step (used when ``dv_sigma=None``).

    The bump differences two full solves, so the step must clear the
    solver's own noise floor. At f64 (solve noise ~1e-12) 1e-4 is safely
    truncation-limited; at f32 the solve carries ~1e-4 RELATIVE price
    noise (measured — docs/PERF_NOTES.md), which a 1e-4 bump amplifies
    1e4x into the vega (rel err ~3 vs the f64 AD oracle). One full vol
    point (1e-2, the unit vega is quoted in — the reference's bump
    scale, fd_american_equity.py:1014) keeps the differenced noise at
    ~1e-2 of the vega while the truncation term (0.5*volga*dv) stays
    below it (measured: rel err 2.9 -> 0.048 at dv 1e-4 -> 1e-2)."""
    if dv_sigma is not None:
        return dv_sigma
    return 1e-4 if jnp.result_type(sigma) == jnp.float64 else 1e-2


def price_batch_kernel(
    batch_dev,
    n_nodes: int,
    dv_sigma: Optional[float] = None,
    with_greeks: bool = True,
    greeks_mode: str = "bump",
    solver: str = "scan",
    spike_segments=None,
):
    """Device function (jit me): batch pytree of arrays -> dict of (B,) arrays.

    Delta/gamma come from the non-uniform central stencil at spot (free —
    the solved grid is already there); theta from the BS PDE identity
    (discrete_barrier_fdm_pricer.py:843-870). Vega:

    - ``greeks_mode='bump'``: the reference's one-sided sigma bump — a
      second full solve at sigma+dv (fd_american_equity.py:1014-1035).
    - ``greeks_mode='ad'``: forward-mode ``jax.jvp`` of the CN scan wrt
      sigma — ONE augmented solve, exact dP/dsigma (no bump-h truncation),
      same grid (the tangent flows through the dynamics coefficients only,
      exactly like the bump, which also holds the grid fixed).

    ``solver='spectral'`` replaces the sequential CN scan with the
    sine-basis closed-form propagator (models.pde.spectral) — requires the
    sp_* interval fields on the batch (price_barrier_batch attaches them).
    ``solver='spectral_x64dst'`` additionally contracts the DSTs in
    emulated f64 (needs x64 enabled) — the f32-on-TPU accuracy rescue.
    ``solver='spike'`` runs the whole batch in the fused SPIKE pallas
    kernel (pallas_kernel.cn_barrier_solve_spike) — TPU only, the
    piecewise-constant (theta, dt) schedule family (price_barrier_batch
    checks eligibility before routing here). ``spike_segments`` is the
    static ``(segments, set_defs)`` pair from :func:`_spike_schedule`
    (host-derived — it cannot be computed under a jit trace); None means
    the globally-uniform-dt 2-step-Rannacher default.
    """
    dv_sigma = _resolve_dv_sigma(dv_sigma, batch_dev.sigma)
    solve_one = {
        "spectral": _spectral_solve_one,
        "spectral_x64dst": _spectral_solve_one_x64dst,
        "spectral_mixed": _spectral_solve_one_mixed,
    }.get(solver, _solve_one)

    if solver in _SPIKE_SOLVERS:
        solve = _spike_solve_fn(
            batch_dev, n_nodes, solver, spike_segments, with_greeks,
            greeks_mode, american=False,
        )
    else:
        def solve(sig_field):
            v, s = jax.vmap(lambda bt: solve_one(bt, sig_field(bt), n_nodes))(batch_dev)
            return v, s

    if with_greeks and greeks_mode == "ad":
        def price_of_sigma(sig):
            v_, s_ = jax.vmap(lambda bt, sg: solve_one(bt, sg, n_nodes))(
                batch_dev, sig
            )
            return jax.vmap(jnp.interp)(batch_dev.s_eff, s_, v_), (v_, s_)

        (price, (v, s)), (dprice, _) = jax.jvp(
            price_of_sigma,
            (batch_dev.sigma,),
            (jnp.ones_like(batch_dev.sigma),),
        )
        out = {"price": price, "vega": dprice / 100.0}
    else:
        v, s = solve(lambda bt: bt.sigma)
        price = jax.vmap(jnp.interp)(batch_dev.s_eff, s, v)
        out = {"price": price}
        if not with_greeks:
            return out
        v_up, _ = solve(lambda bt: bt.sigma + dv_sigma)
        price_up = jax.vmap(jnp.interp)(batch_dev.s_eff, s, v_up)
        out["vega"] = (price_up - price) / (dv_sigma * 100.0)

    def dg(s_i, v_i, spot_i):
        idx = jnp.clip(jnp.argmin(jnp.abs(s_i - spot_i)), 1, s_i.shape[0] - 2)
        return nonuniform_central(s_i, v_i, idx)

    delta, gamma = jax.vmap(dg)(s, v, batch_dev.spot)
    out["delta"] = delta
    out["gamma"] = gamma
    out["theta"] = -(
        0.5 * batch_dev.sigma**2 * batch_dev.spot**2 * gamma
        + (batch_dev.b - batch_dev.q) * batch_dev.spot * delta
        - batch_dev.r * price
    )
    return out


# Register the batch dataclass as a pytree so it can cross jit boundaries.
jax.tree_util.register_pytree_node(
    BarrierTradeBatch,
    lambda b: (tuple(b.__dict__.values()), tuple(b.__dict__.keys())),
    lambda keys, vals: BarrierTradeBatch(**dict(zip(keys, vals))),
)


def build_american_batch(
    spots: Sequence[float],
    strikes: Sequence[float],
    sigmas: Sequence[float],
    t_expiry: Sequence[float],
    r: Sequence[float],
    b: Sequence[float],
    is_call: Sequence[bool],
    n_time_steps: int,
    dividends_tau: Optional[Sequence[Sequence]] = None,
    rannacher_steps: int = 2,
    num_space_nodes: int = 400,
    s_max_mult: float = 4.5,
    dtype=np.float64,
    snap_to_grid: bool = False,
    use_native: bool = True,
) -> BarrierTradeBatch:
    """Struct-of-arrays batch of American trades on the shared stepper.

    Same container as the barrier batch (barriers disabled); grids use the
    American policy (american_log_grid) and schedules the segmented layout
    with dividend jumps + IT resets. ``dividends_tau``: per trade, a list of
    (tau_from_expiry, amount). ``snap_to_grid`` applies the scalar pricer's
    spot/strike node snapping (fd_american_equity.py:386 — the payoff kink
    and the price readout land exactly on grid nodes; the runner path uses
    it to match AmericanFDMPricer's defaults). ``use_native`` routes the
    dividend-schedule construction through the C++ batch builder
    (finite_difference_tpu.native.american_batches, bit-identical) when it
    is available; dividend-free batches take the vectorized numpy fast path
    either way.
    """
    from .grid import american_log_grid, segmented_schedule

    B = len(spots)
    dividends_tau = dividends_tau or [[] for _ in range(B)]
    spots = [float(s) for s in spots]
    strikes = [float(k) for k in strikes]

    if not any(len(d) for d in dividends_tau):
        # vectorized fast path (the sweep/serving case): dividend-free
        # schedules are a single uniform segment, so the whole per-trade
        # loop below collapses to array expressions. Bit-identical to the
        # loop: same grid formulas (american_log_grid), np.round matches
        # round() (both half-to-even), np.cumsum matches the sequential
        # tau accumulation. ~40x faster at B=4096 (host build was 18x the
        # device solve time).
        sp = np.asarray(spots, float)
        st = np.asarray(strikes, float)
        sg = np.asarray(sigmas, float)
        te = np.asarray(t_expiry, float)
        s_low, s_high = np.minimum(sp, st), np.maximum(sp, st)
        s_c = np.sqrt(np.maximum(s_low * s_high, 1e-12))
        band = s_max_mult * sg * np.sqrt(np.maximum(te, 1e-12))
        x_c = np.log(s_c)
        s_min = np.maximum(
            np.minimum(np.exp(x_c - 0.5 * band), 0.5 * s_low), 1e-8
        )
        s_max = np.maximum(np.exp(x_c + 0.5 * band), 2.0 * s_high)
        x_min = np.log(s_min)
        dx = (np.log(s_max) - x_min) / float(int(num_space_nodes))
        if snap_to_grid:
            # scalar math.exp/log here: np's vectorized exp differs by
            # 1 ulp on some inputs, and the snapped levels must equal the
            # scalar pricer's bit-for-bit (the payoff kink on-node)
            snap1 = lambda lvl, xm, d: math.exp(
                xm + round((math.log(lvl) - xm) / d) * d
            )
            sp = np.array(
                [snap1(sp[i], x_min[i], dx[i]) for i in range(B)]
            )
            st = np.array(
                [snap1(st[i], x_min[i], dx[i]) for i in range(B)]
            )
            spots, strikes = list(sp), list(st)
        n = int(n_time_steps)
        seg_dt = te / float(n)
        dt = np.repeat(seg_dt[:, None], n, axis=1)
        theta = np.broadcast_to(
            np.where(np.arange(n) < rannacher_steps, 1.0, 0.5), (B, n)
        )
        reset = np.zeros((B, n), dtype=bool)
        reset[:, 0] = True
        f = lambda v: np.asarray(v, dtype=dtype)
        zB = np.zeros(B, dtype=dtype)
        fB = np.zeros(B, dtype=bool)
        return BarrierTradeBatch(
            x_min=f(x_min), dx=f(dx), strike=f(st),
            is_call=np.asarray(is_call, dtype=bool), sigma=f(sg), r=f(r),
            b=f(b), q=zB, lower=zB, upper=zB, has_lower=fB, has_upper=fB,
            rebate=zB, rebate_at_hit=fB, rebate_rate=f(b), s_eff=f(sp),
            spot=f(sp),
            dt=dt.astype(dtype),
            theta=np.asarray(theta, dtype=dtype),
            tau_next=np.cumsum(dt, axis=1).astype(dtype),
            monitor=np.zeros((B, n), dtype=bool),
            div_amount=np.zeros((B, n), dtype=dtype),
            reset_lambda=reset,
        )

    if use_native:
        from ... import native as _native

        if _native.available():
            out = _native.american_batches(
                spots, strikes, sigmas, t_expiry,
                [bool(c) for c in is_call], dividends_tau,
                n_time_steps, rannacher_steps, num_space_nodes,
                s_max_mult, snap_to_grid,
            )
            if out is not None:
                f = lambda v: np.asarray(v, dtype=dtype)
                zB = np.zeros(B, dtype=dtype)
                fB = np.zeros(B, dtype=bool)
                n = int(n_time_steps)
                return BarrierTradeBatch(
                    x_min=f(out["x_min"]), dx=f(out["dx"]),
                    strike=f(out["strike"]),
                    is_call=np.asarray(is_call, dtype=bool),
                    sigma=f(sigmas), r=f(r), b=f(b), q=zB,
                    lower=zB, upper=zB, has_lower=fB, has_upper=fB,
                    rebate=zB, rebate_at_hit=fB, rebate_rate=f(b),
                    s_eff=f(out["spot"]), spot=f(out["spot"]),
                    dt=out["dt"].astype(dtype),
                    theta=out["theta"].astype(dtype),
                    tau_next=out["tau_next"].astype(dtype),
                    monitor=np.zeros((B, n), dtype=bool),
                    div_amount=out["div_amount"].astype(dtype),
                    reset_lambda=out["reset_lambda"],
                )

    cols: Dict[str, List] = {k: [] for k in (
        "x_min", "dx", "dt", "theta", "tau_next", "monitor", "div_amount",
        "reset_lambda",
    )}
    for i in range(B):
        g = american_log_grid(
            spots[i], strikes[i], float(sigmas[i]),
            float(t_expiry[i]), num_space_nodes, s_max_mult,
        )
        if snap_to_grid:
            snap = lambda lvl: math.exp(
                g.x_min + round((math.log(lvl) - g.x_min) / g.dx) * g.dx
            )
            spots[i] = snap(spots[i])
            strikes[i] = snap(strikes[i])
        cols["x_min"].append(g.x_min)
        cols["dx"].append(g.dx)
        sch = segmented_schedule(
            float(t_expiry[i]), n_time_steps, dividends_tau[i],
            rannacher_steps=rannacher_steps,
            restart_rannacher_at_div=bool(is_call[i]),
        )
        # segmented schedules share length n_time_steps by construction;
        # guard against per-trade drift from the remainder rule
        if len(sch.dt) != n_time_steps:
            pad = n_time_steps - len(sch.dt)
            if pad < 0:
                raise ValueError("segment steps exceeded n_time_steps")
            z = np.zeros(pad)
            sch = type(sch)(
                dt=np.concatenate([sch.dt, z]),
                theta=np.concatenate([sch.theta, np.full(pad, 0.5)]),
                tau_next=np.concatenate(
                    [sch.tau_next, np.full(pad, sch.tau_next[-1])]
                ),
                monitor=np.concatenate([sch.monitor, np.zeros(pad, bool)]),
                div_amount=np.concatenate([sch.div_amount, z]),
                reset_lambda=np.concatenate([sch.reset_lambda, np.zeros(pad, bool)]),
            )
        cols["dt"].append(sch.dt)
        cols["theta"].append(sch.theta)
        cols["tau_next"].append(sch.tau_next)
        cols["monitor"].append(sch.monitor)
        cols["div_amount"].append(sch.div_amount)
        cols["reset_lambda"].append(sch.reset_lambda)

    f = lambda v: np.asarray(v, dtype=dtype)
    zB = np.zeros(B, dtype=dtype)
    fB = np.zeros(B, dtype=bool)
    return BarrierTradeBatch(
        x_min=f(cols["x_min"]), dx=f(cols["dx"]), strike=f(strikes),
        is_call=np.asarray(is_call, dtype=bool), sigma=f(sigmas), r=f(r),
        b=f(b), q=zB, lower=zB, upper=zB, has_lower=fB, has_upper=fB,
        rebate=zB, rebate_at_hit=fB, rebate_rate=f(b), s_eff=f(spots),
        spot=f(spots),
        dt=np.stack(cols["dt"]).astype(dtype),
        theta=np.stack(cols["theta"]).astype(dtype),
        tau_next=np.stack(cols["tau_next"]).astype(dtype),
        monitor=np.stack(cols["monitor"]),
        div_amount=np.stack(cols["div_amount"]).astype(dtype),
        reset_lambda=np.stack(cols["reset_lambda"]),
    )


def _solve_one_american(
    batch: BarrierTradeBatch, sigma, n_nodes: int,
    with_dividends: bool = True,
):
    grid = CNGrid(batch.x_min, batch.dx)
    dyn = CNDynamics(
        strike=batch.strike, is_call=batch.is_call, sigma=sigma,
        r=batch.r, b=batch.b, q=batch.q,
    )
    sch = CNSchedule(
        dt=batch.dt, theta=batch.theta, tau_next=batch.tau_next,
        monitor=batch.monitor, div_amount=batch.div_amount,
        reset_lambda=batch.reset_lambda,
    )
    return cn_solve(
        grid, dyn, sch, n_nodes, barrier=None, american=True,
        with_dividends=with_dividends, euro_put_lower_boundary=False,
    )


def american_batch_kernel(
    batch_dev,
    n_nodes: int,
    dv_sigma: Optional[float] = None,
    with_greeks: bool = True,
    greeks_mode: str = "bump",
    solver: str = "scan",
    spike_segments=None,
    with_dividends: bool = True,
):
    """Device function (jit with static n_nodes/with_greeks): batched
    American price/greeks — the vmapped twin of AmericanFDMPricer's
    single-trade solve (Richardson omitted; pass a finer n_time_steps
    instead — the sweep use case). ``greeks_mode='ad'`` computes vega by
    jvp through the scan (incl. the Ikonen-Toivanen projection, whose
    jnp.where carries the correct subgradient) instead of the sigma bump.
    ``solver='spike'`` runs the batch in the fused SPIKE pallas kernel
    with the Ikonen-Toivanen projection fused into the step (TPU only;
    price_american_batch checks eligibility). Dividend batches ride the
    spike route via the static ``spike_segments`` schedule — the spline
    jump runs between pallas launches, so ``with_dividends`` only
    affects the scan. ``with_dividends`` is static: the driver sets it
    False for dividend-free scan batches so the scan never compiles the
    per-step spline-jump machinery (a large cost — and a TPU-f32 worker
    crash at the 1024x512 production shape — for a no-op).
    """
    dv_sigma = _resolve_dv_sigma(dv_sigma, batch_dev.sigma)

    if solver in _SPIKE_SOLVERS:
        solve = _spike_solve_fn(
            batch_dev, n_nodes, solver, spike_segments, with_greeks,
            greeks_mode, american=True,
        )
    else:
        def solve(sig_field):
            v, s = jax.vmap(
                lambda bt: _solve_one_american(
                    bt, sig_field(bt), n_nodes, with_dividends
                )
            )(batch_dev)
            return v, s

    if with_greeks and greeks_mode == "ad":
        def price_of_sigma(sig):
            v_, s_ = jax.vmap(
                lambda bt, sg: _solve_one_american(
                    bt, sg, n_nodes, with_dividends
                )
            )(batch_dev, sig)
            return jax.vmap(jnp.interp)(batch_dev.s_eff, s_, v_), (v_, s_)

        (price, (v, s)), (dprice, _) = jax.jvp(
            price_of_sigma,
            (batch_dev.sigma,),
            (jnp.ones_like(batch_dev.sigma),),
        )
        out = {"price": price, "vega": dprice / 100.0}
    else:
        v, s = solve(lambda bt: bt.sigma)
        price = jax.vmap(jnp.interp)(batch_dev.s_eff, s, v)
        out = {"price": price}
        if not with_greeks:
            return out
        v_up, _ = solve(lambda bt: bt.sigma + dv_sigma)
        price_up = jax.vmap(jnp.interp)(batch_dev.s_eff, s, v_up)
        out["vega"] = (price_up - price) / (dv_sigma * 100.0)

    def dg(s_i, v_i, spot_i):
        idx = jnp.clip(jnp.argmin(jnp.abs(s_i - spot_i)), 1, s_i.shape[0] - 2)
        return nonuniform_central(s_i, v_i, idx)

    delta, gamma = jax.vmap(dg)(s, v, batch_dev.spot)
    out["delta"] = delta
    out["gamma"] = gamma
    return out


_JIT_CACHE: Dict[tuple, Any] = {}


def _identity_memo(cache: Dict[tuple, tuple], fields: tuple, extra_key: tuple,
                   compute):
    """Memoize ``compute()`` by the IDENTITY of the arrays in ``fields``.

    Host-side batch inspection pulls device arrays back through the
    tunnel (tens of MB for (B, n_steps) schedules); a serving loop
    re-pricing the same device-resident batch should pay it once. Only
    immutable ``jax.Array`` inputs are cached — host numpy arrays are
    mutable and cost nothing to re-inspect. The cached entry pins the
    field arrays so their ids cannot be recycled; ``fields`` MUST list
    every batch array the computation reads (a missing field means stale
    results when only that field changes)."""
    if not all(isinstance(a, jax.Array) for a in fields):
        return compute()
    key = extra_key + tuple(id(a) for a in fields)
    hit = cache.get(key)
    if hit is not None and all(a is b for a, b in zip(hit[0], fields)):
        return hit[1]
    out = compute()
    if len(cache) > 32:
        cache.clear()
    cache[key] = (fields, out)
    return out


_DIV_ANY_CACHE: Dict[tuple, tuple] = {}


def _has_dividends(batch: "BarrierTradeBatch") -> bool:
    """Host bool for the static with_dividends flag (identity-memoized —
    the (B, n_div) pull is per-call tunnel cost on device batches)."""
    return _identity_memo(
        _DIV_ANY_CACHE, (batch.div_amount,), (),
        lambda: bool(np.asarray(batch.div_amount).any()),
    )


# The SPIKE pallas solver family. 'spike' is the f32 throughput rung;
# 'spike_df64' carries every kernel value as an f32 (hi, lo) double-float
# pair (ops/df64.py) — the on-chip <=1e-6 accuracy rung that replaces the
# XLA-scan fallback for f64 American sweeps. '*_interpret' variants run
# the same kernels under the pallas interpreter (CPU tests).
_SPIKE_SOLVERS = frozenset(
    {"spike", "spike_interpret", "spike_df64", "spike_df64_interpret"}
)


def _spike_solve_fn(batch_dev, n_nodes: int, solver: str, spike_segments,
                    with_greeks: bool, greeks_mode: str, american: bool):
    """The (shared) SPIKE branch of the batch kernels: one pallas solve
    closure over the device batch. Raises on greeks_mode='ad' (a pallas
    custom call has no AD rule)."""
    if with_greeks and greeks_mode == "ad":
        raise ValueError(
            "solver='spike' has no AD rule (pallas custom call); "
            "use greeks_mode='bump'"
        )
    from .pallas_kernel import cn_barrier_solve_spike

    seg, sd, div_steps, reset_steps = (
        spike_segments if spike_segments is not None
        else (None, None, (), ())
    )
    if not american:
        # the barrier scan path ignores div_amount/reset_lambda
        # (_solve_one passes with_dividends=False) — mirror it exactly
        div_steps, reset_steps = (), ()

    def solve(sig_field):
        return cn_barrier_solve_spike(
            batch_dev, sig_field(batch_dev), n_nodes=n_nodes,
            n_steps=batch_dev.dt.shape[1],
            trade_block=min(128, batch_dev.dt.shape[0]),
            interpret=solver.endswith("interpret"),
            segments=seg, set_defs=sd, american=american,
            div_steps=div_steps, reset_steps=reset_steps,
            df64="df64" in solver,
        )

    return solve


_SHARD_MAP_CACHE: Dict[tuple, object] = {}


def _shard_mapped_kernel(kernel, mesh, axis_name: str, kw: dict):
    """jit(shard_map(kernel)) wrapper cache for the mesh SPIKE path.

    A pallas custom call is opaque to the SPMD partitioner — under plain
    ``jit`` + NamedSharding XLA would all-gather the whole batch onto
    every device before the call. ``shard_map`` instead hands each device
    its LOCAL shard of the trade axis and traces the kernel at the local
    shape, so N chips run N independent SPIKE launches with zero
    collectives — the mesh rung carries the same kernel as the
    single-chip headline (VERDICT r4 task 2; SURVEY §5.8). All kernel
    kwargs (statics + the float dv_sigma) are closed over and key the
    cache, like ``_jitted_kernel``."""
    key = (kernel, mesh, axis_name, tuple(sorted(kw.items())))
    fn = _SHARD_MAP_CACHE.get(key)
    if fn is None:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        fn = _SHARD_MAP_CACHE[key] = jax.jit(
            shard_map(
                lambda piece: kernel(piece, **kw),
                mesh=mesh,
                in_specs=(P(axis_name),),
                out_specs=P(axis_name),
                check_rep=False,
            )
        )
    return fn


def _jitted_kernel(kernel, static_argnames: tuple):
    """Module-level jit-wrapper cache. Building a fresh ``jax.jit`` object
    per driver call makes every call re-trace (the wrapper's cache dies
    with it) — ~50-100 ms of pure Python tracing per launch in a serving
    loop even though the XLA executable is cached. One wrapper per
    (kernel, statics) keeps repeat calls on the C++ fast path."""
    key = (kernel, static_argnames)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = jax.jit(kernel, static_argnames=static_argnames)
    return fn


# --------------------------------------------------------------------------
# Packed-transfer launch path (round 5, serving optimization)
#
# Through the TPU tunnel every host->device array transfer and every
# host fetch is a separate RPC with a measured ~31 ms round-trip floor;
# the batch pytree has ~23 leaves and a greeks result 5, so a serving
# request at B=256 paid ~57 ms in transfers + serial fetches against a
# ~7 ms kernel (docs/PERF_NOTES.md "Serving cost breakdown"). This path
# packs the batch into at most FOUR device transfers (per-trade floats,
# per-trade bools, shared schedule rows x2) plus rare extras, unpacks
# INSIDE the jitted program (broadcasts are free under XLA), and stacks
# the kernel's output dict so ONE fetch returns everything.
# --------------------------------------------------------------------------
_PACKED_F = ("x_min", "dx", "strike", "sigma", "r", "b", "q", "lower",
             "upper", "rebate", "rebate_rate", "s_eff", "spot")
_PACKED_BOOL = ("is_call", "has_lower", "has_upper", "rebate_at_hit")
_PACKED_SCHED_F = ("dt", "theta", "tau_next", "div_amount")
_PACKED_SCHED_B = ("monitor", "reset_lambda")
_PACKED_SP = ("sp_k_end", "sp_apply", "sp_rann", "sp_dt")

_PACKED_CACHE: Dict[tuple, tuple] = {}


def _pack_transfers_enabled() -> bool:
    """Default: pack on accelerators (transfer-RPC bound), not on CPU
    (tests pin bit-equality of the unpacked path there; FD_PACK_TRANSFERS
    overrides either way)."""
    flag = os.environ.get("FD_PACK_TRANSFERS")
    if flag is not None:
        return flag not in ("", "0")
    return jax.default_backend() != "cpu"


def _packed_kernel(kernel, kw: dict, shared_f: tuple, shared_b: tuple,
                   sp_present: tuple):
    """jit-wrapper cache for the packed launch; the wrapper reassembles
    the BarrierTradeBatch from the packed arrays inside the trace and
    stacks the kernel's outputs into one (n_keys, B) array."""
    key = (
        kernel, tuple(sorted(kw.items())), shared_f, shared_b, sp_present,
    )
    hit = _PACKED_CACHE.get(key)
    if hit is not None:
        return hit
    keys_box: List[tuple] = []

    def fn(pf, pb, psf, psb, extras):
        B_ = pf.shape[1]
        fields = {n: pf[i] for i, n in enumerate(_PACKED_F)}
        fields.update({n: pb[i] for i, n in enumerate(_PACKED_BOOL)})
        fi = bi = 0
        for n, sh in zip(_PACKED_SCHED_F, shared_f):
            if sh:
                row = psf[fi]
                fi += 1
                fields[n] = jnp.broadcast_to(row[None, :], (B_, row.shape[0]))
            else:
                fields[n] = extras[n]
        for n, sh in zip(_PACKED_SCHED_B, shared_b):
            if sh:
                row = psb[bi]
                bi += 1
                fields[n] = jnp.broadcast_to(row[None, :], (B_, row.shape[0]))
            else:
                fields[n] = extras[n]
        for n, present in zip(_PACKED_SP, sp_present):
            fields[n] = extras[n] if present else None
        out = kernel(BarrierTradeBatch(**fields), **kw)
        if not keys_box:
            keys_box.append(tuple(out))
        return jnp.stack(list(out.values()))

    pair = (jax.jit(fn), keys_box)
    _PACKED_CACHE[key] = pair
    return pair


def _run_packed(kernel, batch: BarrierTradeBatch, kw: dict, B: int):
    """Packed single-launch path, or None when the batch doesn't fit it
    (device-resident leaves, mixed dtypes — the generic path handles
    those)."""
    d = batch.__dict__
    mand = _PACKED_F + _PACKED_BOOL + _PACKED_SCHED_F + _PACKED_SCHED_B
    vals = {}
    for n in mand:
        v = d[n]
        if v is None or isinstance(v, jax.Array):
            return None
        vals[n] = np.asarray(v)
    f_dtype = vals["sigma"].dtype
    if any(vals[n].dtype != f_dtype for n in _PACKED_F):
        return None
    if any(vals[n].dtype != f_dtype for n in _PACKED_SCHED_F):
        return None
    for n in _PACKED_SP:
        if isinstance(d[n], jax.Array):
            return None

    def row_shared(x):
        return x.ndim == 2 and x.shape[0] == B and B > 1 and (x == x[:1]).all()

    shared_f = tuple(bool(row_shared(vals[n])) for n in _PACKED_SCHED_F)
    shared_b = tuple(bool(row_shared(vals[n])) for n in _PACKED_SCHED_B)
    sp_present = tuple(d[n] is not None for n in _PACKED_SP)

    n_steps = vals["dt"].shape[1]
    pf = np.stack([vals[n] for n in _PACKED_F])
    pb = np.stack([vals[n].astype(bool) for n in _PACKED_BOOL])
    psf_rows = [vals[n][0] for n, sh in zip(_PACKED_SCHED_F, shared_f) if sh]
    psb_rows = [vals[n][0] for n, sh in zip(_PACKED_SCHED_B, shared_b) if sh]
    psf = (np.stack(psf_rows) if psf_rows
           else np.zeros((0, n_steps), dtype=f_dtype))
    psb = (np.stack(psb_rows) if psb_rows
           else np.zeros((0, n_steps), dtype=bool))
    extras = {
        n: np.asarray(vals[n])
        for n, sh in zip(_PACKED_SCHED_F, shared_f) if not sh
    }
    extras.update({
        n: np.asarray(vals[n])
        for n, sh in zip(_PACKED_SCHED_B, shared_b) if not sh
    })
    extras.update({
        n: np.asarray(d[n])
        for n, present in zip(_PACKED_SP, sp_present) if present
    })

    fn, keys_box = _packed_kernel(
        kernel, kw, shared_f, shared_b, sp_present
    )
    stacked = np.asarray(fn(pf, pb, psf, psb, extras))  # ONE fetch
    return {k: stacked[i] for i, k in enumerate(keys_box[0])}


def _run_batch_driver(
    kernel,
    batch: BarrierTradeBatch,
    n_nodes: int,
    dv_sigma: float,
    with_greeks: bool,
    mesh,
    axis_name: str,
    max_chunk: Optional[int],
    dtype=None,
    greeks_mode: str = "bump",
    solver: str = "scan",
) -> Dict[str, np.ndarray]:
    """Shared driver: shard over a mesh, or chunk big single-chip batches.

    The per-step working set crosses an HBM cliff above roughly
    B=1024 x N=1024 f32 on one chip (throughput collapses several-fold —
    see docs/PERF_NOTES.md). Chunking at ``max_chunk`` trades keeps every
    launch below the cliff while reusing one compiled kernel; the final
    short chunk is padded with its first trade so a single compiled shape
    serves all chunks.

    ``dtype`` selects the precision ladder (measured, docs/PERF_NOTES.md):
    f32 ~39k grids/s/chip at ~5e-4 rel vs the f64 oracle (SPIKE pallas
    kernel, VMEM-resident so cliff-free; the XLA scan it replaced does
    ~10k); f64 (XLA emulation on TPU) rides the spectral propagator at
    ~6k grids/s at ~1e-11 — far above the 1250 grids/s/chip v5p-8
    baseline share when <=1e-6 accuracy is required.
    """
    if dtype is not None:
        dtype = jnp.dtype(dtype)
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            raise ValueError(
                "dtype=float64 requires jax.config.update('jax_enable_x64', True) "
                "before any jax computation."
            )
        batch = batch.astype(np.dtype(dtype))
        if max_chunk is not None and dtype.itemsize > 4:
            max_chunk = max(1, max_chunk // 2)  # same working-set budget
    static = ["n_nodes", "with_greeks", "greeks_mode"]
    params = inspect.signature(kernel).parameters
    takes_solver = "solver" in params
    if takes_solver:
        static.append("solver")
    takes_segments = (
        takes_solver
        and solver in _SPIKE_SOLVERS
        and "spike_segments" in params
    )
    if takes_segments:
        static.append("spike_segments")
    if "with_dividends" in params:
        static.append("with_dividends")
    fn = _jitted_kernel(kernel, tuple(static))
    kw = dict(
        n_nodes=n_nodes, dv_sigma=dv_sigma, with_greeks=with_greeks,
        greeks_mode=greeks_mode,
    )
    if takes_solver:
        kw["solver"] = solver
    if takes_segments:
        # host-derived static segmentation (piecewise-constant schedules
        # ride the kernel as one pallas segment per (theta, dt) run)
        kw["spike_segments"] = _spike_schedule(batch, n_nodes)
    if "with_dividends" in params:
        # static: dividend-free batches skip the per-step spline-jump
        # machinery entirely. The spike route handles dividends itself
        # (between-launch jumps from the static div_steps schedule), so
        # the scan-only flag stays False there — skipping the
        # (device-pulling) inspection too.
        if takes_solver and solver in _SPIKE_SOLVERS:
            kw["with_dividends"] = False
        else:
            kw["with_dividends"] = _has_dividends(batch)
    B = batch.batch_size

    if (
        mesh is None
        and _pack_transfers_enabled()
        and (
            max_chunk is None
            or B <= max_chunk
            or (takes_solver and solver in _SPIKE_SOLVERS)
        )
    ):
        # single-launch, host-built batch: packed transfers + one fetch
        # (see the packed-path block above). Ineligible batches
        # (device-resident leaves, mixed dtypes) return None and fall
        # through to the generic path.
        packed = _run_packed(kernel, batch, kw, B)
        if packed is not None:
            return packed

    def to_device(x):
        # Sweep batches share one schedule across all trades; the (B, n_steps)
        # schedule arrays then dominate host->device transfer. Ship one row
        # and expand on device (an HBM write, not a PCIe/tunnel transfer).
        if isinstance(x, jax.Array):
            return x  # already device-resident — don't round-trip to host
        x = np.asarray(x)
        if (
            x.ndim >= 1
            and x.shape[0] == B
            and B > 1
            and x.size > B
            and (x == x[:1]).all()
        ):
            one = jnp.asarray(x[:1])
            return jnp.repeat(one, B, axis=0)
        return jnp.asarray(x)

    dev = jax.tree.map(to_device, batch)

    pad_to = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P(axis_name))
        place = lambda x: jax.device_put(x, shard)
        if takes_solver and solver in _SPIKE_SOLVERS:
            # opaque pallas call -> shard_map (see _shard_mapped_kernel):
            # each device launches the SPIKE kernel on its local shard.
            # The VMEM-resident march has no per-chip HBM cliff, so no
            # chunking; shard_map needs equal shards and the kernel
            # needs each LOCAL batch <=128 trades or a 128-multiple
            # (_spike_schedule_impl) -> pad the trade axis up front.
            sm = _shard_mapped_kernel(kernel, mesh, axis_name, kw)
            run = lambda piece: sm(jax.tree.map(place, piece))
            chunk = None
            q = 128 * mesh.size
            pad_to = q if B >= q else mesh.size
        else:
            run = lambda piece: fn(jax.tree.map(place, piece), **kw)
            # the working-set cliff is PER CHIP: chunk so each device's
            # shard stays under max_chunk trades
            chunk = None if max_chunk is None else max_chunk * mesh.size
    else:
        run = lambda piece: fn(piece, **kw)
        chunk = max_chunk
        if takes_solver and solver in _SPIKE_SOLVERS:
            # the SPIKE kernel's march is VMEM-resident — the scan's HBM
            # working-set cliff (max_chunk's reason to exist) does not
            # apply, and one B=4096 launch measures ~2x the chunked
            # B=1024 launches (docs/PERF_NOTES.md); grid blocks already
            # stream through the core sequentially inside the kernel
            chunk = None

    if pad_to is not None and B % pad_to:
        pad = pad_to - B % pad_to
        dev = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]
            ),
            dev,
        )

    if chunk is None or B <= chunk:
        out = run(dev)
        return {k: np.asarray(v)[:B] for k, v in out.items()}

    pieces = []
    for start in range(0, B, chunk):
        stop = min(start + chunk, B)
        piece = jax.tree.map(lambda x: x[start:stop], dev)
        if stop - start < chunk:
            pad = chunk - (stop - start)
            piece = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]
                ),
                piece,
            )
        pieces.append(run(piece))
    return {
        k: np.concatenate([np.asarray(p[k]) for p in pieces])[:B]
        for k in pieces[0]
    }


def price_american_batch(
    batch: BarrierTradeBatch,
    n_nodes: int,
    dv_sigma: Optional[float] = None,
    with_greeks: bool = True,
    mesh=None,
    axis_name: str = "data",
    max_chunk: Optional[int] = 1024,
    dtype=None,
    greeks_mode: str = "bump",
    solver: str = "auto",
) -> Dict[str, np.ndarray]:
    """Batched American sweep; optionally shard the trade axis over a mesh.

    Without a mesh, batches larger than ``max_chunk`` run in chunks to stay
    below the single-chip working-set cliff (pass ``max_chunk=None`` to
    force one launch). ``dtype=jnp.float64`` selects the high-accuracy
    (emulated on TPU) precision rung.

    ``solver='auto'`` routes TPU runs to the fused SPIKE pallas kernel
    with the Ikonen-Toivanen projection fused into the step when the
    batch fits its schedule family (piecewise-constant (theta, dt) with
    a shared theta pattern — dividend batches ride as extra segments
    with the spline jump applied between pallas launches, see
    :func:`_spike_schedule`): f32 batches on the plain f32 kernel, f64
    batches on its double-float (df64) twin — the ≤1e-6 accuracy rung,
    measured 3,791 grids/s at the 1024x512 B=256 production shape vs
    the x64-emulated scan's 591 (docs/PERF_NOTES.md round 4). Everything
    else — CPU, mixed call/put dividend batches (differing Rannacher
    restarts), or greeks_mode='ad' (a pallas call has no AD rule) — runs
    the XLA scan. Mesh-sharded batches ride the same SPIKE kernels via
    ``shard_map`` (one local pallas launch per device, zero collectives
    — see :func:`_shard_mapped_kernel`). The spectral propagator is
    European-only (the IT projection is nonlinear in the state), so
    unlike the barrier sweep there is no spectral rung here.
    """
    if solver == "auto":
        if (
            jax.default_backend() != "cpu"
            and _spike_eligible(batch, n_nodes)
            and (greeks_mode != "ad" or not with_greeks)
        ):
            # f64-on-TPU rides the double-float SPIKE kernel (the <=1e-6
            # accuracy rung, ~2x the x64-emulated XLA scan); f32 rides
            # the plain f32 SPIKE kernel. Mesh runs ride the same kernels
            # via shard_map (see _shard_mapped_kernel).
            solver = (
                "spike_df64" if _effective_is64(batch, dtype) else "spike"
            )
        else:
            solver = "scan"
    if solver in _SPIKE_SOLVERS:
        if not _spike_eligible(batch, n_nodes):
            raise ValueError(
                "batch is not spike-eligible (needs a piecewise-constant "
                "(theta, dt) schedule shared across trades with no "
                "dividend jumps and a batch size divisible by the "
                "128-trade block); use solver='auto'"
            )
    return _run_batch_driver(
        american_batch_kernel, batch, n_nodes, dv_sigma, with_greeks,
        mesh, axis_name, max_chunk, dtype, greeks_mode, solver,
    )


_SPECTRAL_LAYOUT_CACHE: Dict[tuple, tuple] = {}


def _spectral_layout(batch: BarrierTradeBatch, n_nodes: int, dtype=None):
    """(sp_k_end, sp_apply, sp_rann, sp_dt) if the batch is
    spectral-eligible, else None. Eligibility = the schedule shape the
    closed form assumes (dt constant WITHIN each monitor interval —
    globally uniform OR the monitor-aligned piecewise-constant layouts,
    e.g. the reference CN auto-grid's ">= k steps per monitor interval",
    discrete_barrier_fdm_pricer_cn.py:92-118 — Rannacher-prefix thetas,
    no dividend jumps) plus a bounded symmetrizer exponent for the
    working dtype. ``sp_dt`` is None for globally-uniform dt (the hoisted
    fast path) and (B, n_intervals) otherwise.

    Memoized by array identity (immutable jax inputs only), like
    :func:`_spike_schedule`: the inspection pulls the (B, n_steps)
    schedule fields to host, which a device-resident f64 serving loop
    would otherwise pay through the tunnel on every call.
    """
    # EVERY batch field _spectral_layout_impl reads, incl. r
    # (channel_conditioning) — a missing field means stale eligibility
    fields = (
        batch.div_amount, batch.dt, batch.theta, batch.monitor,
        batch.sigma, batch.b, batch.q, batch.r, batch.dx,
    )
    return _identity_memo(
        _SPECTRAL_LAYOUT_CACHE, fields,
        (n_nodes, _effective_is64(batch, dtype)),
        lambda: _spectral_layout_impl(batch, n_nodes, dtype),
    )


def _spectral_layout_impl(batch: BarrierTradeBatch, n_nodes: int, dtype=None):
    from .spectral import spectral_intervals, symmetrizer_exponent

    if _has_dividends(batch):
        return None
    dt = np.asarray(batch.dt, dtype=float)
    uniform = bool(np.all(dt == dt[:, :1]))
    th = np.asarray(batch.theta, dtype=float)
    is_one = th == 1.0
    if not np.all(is_one | (th == 0.5)):
        return None
    R = is_one.sum(axis=1)
    # theta=1 steps must form a prefix
    first_half = np.where(
        is_one.any(axis=1), np.argmax(~is_one, axis=1), 0
    )
    prefix_ok = (~is_one.any(axis=1)) | (first_half == R)
    if not prefix_ok.all():
        return None
    sig2 = np.asarray(batch.sigma, float) ** 2
    mu_x = np.asarray(batch.b, float) - np.asarray(batch.q, float) - 0.5 * sig2
    if np.any(
        np.abs(np.asarray(batch.dx, float) * mu_x / sig2) >= 0.999
    ):  # a_coef/c_coef must stay positive (sine diagonalization)
        return None
    expo = symmetrizer_exponent(
        batch.sigma, batch.b, batch.q, batch.dx, n_nodes
    )
    # thresholds keyed off the EFFECTIVE device dtype: with x64 off, host
    # f64 arrays demote to f32 on device, so the f32 limit applies
    is64 = _effective_is64(batch, dtype)
    if np.any(expo > (200.0 if is64 else 15.0)):
        return None
    from .spectral import channel_conditioning

    k_end, apply_proj = spectral_intervals(np.asarray(batch.monitor))

    sp_dt = None
    if not uniform:
        # dt must be constant within every monitor interval; collect the
        # per-interval values (padded intervals repeat the last dt)
        B, n_iv = k_end.shape
        sp_dt = np.empty((B, n_iv), dtype=float)
        for bb in range(B):
            k0 = 0
            for j in range(n_iv):
                ke = int(k_end[bb, j])
                seg = dt[bb, k0:ke]
                if seg.size == 0:
                    sp_dt[bb, j] = sp_dt[bb, j - 1] if j else dt[bb, 0]
                else:
                    if not np.all(seg == seg[0]):
                        return None
                    sp_dt[bb, j] = seg[0]
                k0 = ke
        if np.allclose(sp_dt, dt[:, :1], rtol=1e-12, atol=0.0):
            # equal monitor intervals land within fp noise of uniform:
            # take the hoisted path (dt[:,0] everywhere is identical to
            # <= 1e-12 relative, far below the solver's own error)
            sp_dt = None
            uniform = True

    cond_dts = dt[:, :1] if uniform else sp_dt
    for col in range(cond_dts.shape[1]):
        cond = channel_conditioning(
            batch.sigma, batch.b, batch.q, batch.r, batch.dx,
            cond_dts[:, col], n_nodes,
        )
        if np.any(cond < 1e-9):
            return None
    return k_end, apply_proj, R.astype(np.int32), sp_dt


_SPIKE_SCHED_CACHE: Dict[tuple, tuple] = {}


def _spike_schedule(
    batch: BarrierTradeBatch, n_nodes: int, max_segments: int = 64
):
    """Static SPIKE segmentation for the batch, or None if ineligible.

    Memoized by array identity: the schedule inspection pulls the
    (B, n_steps) schedule fields to host, which for a DEVICE-resident
    batch is tens of MB back through the tunnel per call — and the
    driver consults it twice per launch (auto-routing + kernel kwargs).
    A serving loop re-pricing the same batch object pays it once.

    The SPIKE pallas kernel (pallas_kernel.cn_barrier_solve_spike) runs
    one pallas segment per run of steps sharing a (theta, dt) pair, so
    any piecewise-constant schedule fits — uniform layouts AND the
    monitor-aligned per-interval-dt layouts the reference CN auto-grid
    produces (grid.monitor_aligned_schedule; discrete_barrier_fdm_pricer_
    cn.py:92-118 semantics). Dividend jumps (the American segmented
    layout, grid.segmented_schedule / fd_american_equity.py:732-827) ride
    as extra segment boundaries: the kernel applies the natural-cubic-
    spline jump V(t-, S) = V(t+, S - D) BETWEEN pallas launches (one
    batched XLA op on the device-resident state), so the in-step
    machinery that crashed the TPU worker at the production shape never
    enters the kernel. Eligibility:

    - theta pattern shared across trades with values in {1.0, 0.5}
      (dt VALUES may differ per trade; only the step indices where any
      trade's dt changes must be shared, which piecewise layouts built
      from one monitor grid satisfy — for dividend batches this means
      one shared call/put Rannacher-restart convention per batch),
    - at most ``max_segments`` (theta-change ∪ dt-change ∪ dividend ∪
      lambda-reset) runs — bounds compile time and the per-segment
      tensor-set HBM footprint,
    - shapes the P=8 sublane partitioning accepts (including the
      128-lane trade blocking).

    Returns ``(segments, set_defs, div_steps, reset_steps)`` — the
    static tuples cn_barrier_solve_spike takes: segments
    ``((k0, k1, set_idx), ...)``, set_defs ``((theta, k_col), ...)``
    deduplicated by (theta, dt-column) signature so e.g. the Rannacher
    prefix and equal-length monitor intervals share one solver-tensor
    set; ``div_steps`` the step indices whose end applies a dividend
    jump (each a segment end); ``reset_steps`` the k>0 step indices
    where any trade's IT multiplier resets (each a segment start;
    amounts/masks stay per-trade, read from the batch arrays).
    """
    # EVERY batch field _spike_schedule_impl reads
    fields = (batch.div_amount, batch.reset_lambda, batch.theta, batch.dt)
    return _identity_memo(
        _SPIKE_SCHED_CACHE, fields, (n_nodes, max_segments),
        lambda: _spike_schedule_impl(batch, n_nodes, max_segments),
    )


def _spike_schedule_impl(
    batch: BarrierTradeBatch, n_nodes: int, max_segments: int
):
    th = np.asarray(batch.theta, dtype=float)
    if not np.all(th == th[:1, :]):
        return None
    th0 = th[0]
    if not np.all((th0 == 1.0) | (th0 == 0.5)):
        return None
    dt = np.asarray(batch.dt, dtype=float)
    n = dt.shape[1]
    # dividend jumps fire at the END of their step (stepper.py step
    # order) -> the step after is a segment start; IT-multiplier resets
    # apply BEFORE their step -> that step is a segment start. Masks and
    # amounts stay per-trade; only the break COLUMNS must be shared,
    # which they are by construction (any trade's event breaks all).
    da = np.asarray(batch.div_amount, dtype=float)
    div_steps = tuple(int(k) for k in np.flatnonzero((da != 0.0).any(axis=0)))
    rl = np.asarray(batch.reset_lambda)
    reset_steps = tuple(
        int(k) for k in np.flatnonzero(rl.any(axis=0)) if k > 0
    )
    event_breaks = {k + 1 for k in div_steps if k + 1 < n}
    event_breaks.update(reset_steps)
    # vectorized column-change detection (a per-step Python loop here cost
    # ~5 ms per serving request at B=256 x n=512 — the schedule memo
    # misses on every request because each builds fresh arrays)
    col_change = th0[1:] != th0[:-1]
    if dt.shape[0] > 0:
        col_change = col_change | (dt[:, 1:] != dt[:, :-1]).any(axis=0)
    break_set = set((np.flatnonzero(col_change) + 1).tolist())
    break_set |= event_breaks
    breaks = [0] + sorted(break_set - {0})
    if len(breaks) > max_segments:
        return None
    breaks.append(n)
    B = th.shape[0]
    if B > 128 and B % 128 != 0:
        return None
    from .pallas_kernel import P_CHUNKS

    n_int = n_nodes - 2
    m = -(-(n_int + 1) // P_CHUNKS)
    if (P_CHUNKS - 1) * m >= n_int or (m * P_CHUNKS - n_int) > m:
        return None
    set_defs: List[Tuple[float, int]] = []
    segments = []
    for k0, k1 in zip(breaks[:-1], breaks[1:]):
        idx = None
        for i, (t_i, kc_i) in enumerate(set_defs):
            if t_i == th0[k0] and np.array_equal(dt[:, kc_i], dt[:, k0]):
                idx = i
                break
        if idx is None:
            set_defs.append((float(th0[k0]), int(k0)))
            idx = len(set_defs) - 1
        segments.append((int(k0), int(k1), idx))
    return tuple(segments), tuple(set_defs), div_steps, reset_steps


def _spike_eligible(batch: BarrierTradeBatch, n_nodes: int) -> bool:
    """True when the batch fits the SPIKE pallas kernel's schedule family
    (see :func:`_spike_schedule`)."""
    return _spike_schedule(batch, n_nodes) is not None


def price_barrier_batch(
    batch: BarrierTradeBatch,
    n_nodes: int,
    dv_sigma: Optional[float] = None,
    with_greeks: bool = True,
    mesh=None,
    axis_name: str = "data",
    max_chunk: Optional[int] = 1024,
    dtype=None,
    greeks_mode: str = "bump",
    solver: str = "auto",
) -> Dict[str, np.ndarray]:
    """Price a trade batch; optionally shard the batch axis over ``mesh``.

    ``greeks_mode='ad'`` computes vega by one jvp-augmented solve instead
    of the sigma-bump re-solve (exact derivative, no bump-h error).

    ``solver``: 'spectral' uses the sine-basis closed-form propagator
    (models.pde.spectral — sequential work per trade drops from n_steps
    tridiagonal solves to ~n_monitors MXU matmul rounds); 'scan' the CN
    time scan; 'auto' (default) picks spectral whenever the batch has the
    uniform_schedule layout it assumes (it is exact — tests pin 1e-9 vs
    the scan) and falls back to the scan otherwise.

    With a mesh, arrays are placed with NamedSharding over ``axis_name`` and
    XLA partitions the whole program with zero collectives (embarrassingly
    parallel over trades). Without a mesh, batches larger than ``max_chunk``
    run in chunks of that size to stay below the single-chip working-set
    cliff (pass ``max_chunk=None`` to force one launch).
    ``dtype=jnp.float64`` selects the high-accuracy (emulated on TPU)
    precision rung — ~3e-11 vs the CPU oracle at ~1.4k grids/s/chip.
    """
    if solver == "auto":
        # the TPU f32 matmul accumulation (any precision/DotAlgorithm,
        # measured — docs/PERF_NOTES.md) is ~30x noisier than CPU f32,
        # which the sine-transform roundtrips amplify to ~1e-2 rel on
        # cheap OTM trades; f32-on-TPU therefore stays on the scan. The
        # f64 rung and CPU runs route to the spectral propagator. The
        # rung is 64-bit only if the arrays actually STAY 64-bit on
        # device (x64 enabled) — a host-f64 batch in a non-x64 session
        # runs in f32 and must take the f32 route: the fused SPIKE
        # pallas kernel when the schedule fits it (~2x the XLA scan,
        # identical math), else the scan.
        if jax.default_backend() != "cpu" and not _effective_is64(batch, dtype):
            # mesh runs ride the same kernel via shard_map (each device
            # launches the pallas call on its local shard — see
            # _shard_mapped_kernel)
            solver = (
                "spike"
                if _spike_eligible(batch, n_nodes)
                and (greeks_mode != "ad" or not with_greeks)
                else "scan"
            )
    if solver in _SPIKE_SOLVERS:
        if not _spike_eligible(batch, n_nodes):
            raise ValueError(
                "batch is not spike-eligible (needs a piecewise-constant "
                "(theta, dt) schedule shared across trades — uniform or "
                "monitor-aligned layouts — with no dividend jumps and a "
                "batch size divisible by the 128-trade block); use "
                "solver='auto'"
            )
    if solver in ("auto", "spectral", "spectral_x64dst", "spectral_mixed"):
        layout = _spectral_layout(batch, n_nodes, dtype)
        if layout is None:
            if solver != "auto":
                raise ValueError(
                    "batch is not spectral-eligible (needs per-interval-"
                    "constant dt, Rannacher-prefix thetas, no dividend "
                    "jumps, bounded symmetrizer exponent); use "
                    "solver='auto' or 'scan'"
                )
            # f64-on-TPU batches the propagator can't take (e.g. an
            # unbounded symmetrizer exponent on extreme grids) still
            # beat the x64-emulated scan ~6x on the double-float SPIKE
            # kernel when the schedule fits it (same routing guards as
            # the f32 spike branch above)
            if (
                jax.default_backend() != "cpu"
                and _effective_is64(batch, dtype)
                and _spike_eligible(batch, n_nodes)
                and (greeks_mode != "ad" or not with_greeks)
            ):
                solver = "spike_df64"
            else:
                solver = "scan"
        else:
            if solver == "spectral_mixed" and layout[3] is not None:
                raise ValueError(
                    "spectral_mixed supports uniform dt only (the hoisted "
                    "layout); use solver='auto'/'spectral' for "
                    "monitor-aligned schedules"
                )
            batch = replace(
                batch, sp_k_end=layout[0], sp_apply=layout[1],
                sp_rann=layout[2], sp_dt=layout[3],
            )
            if solver == "auto":
                solver = "spectral"
    return _run_batch_driver(
        price_batch_kernel, batch, n_nodes, dv_sigma, with_greeks,
        mesh, axis_name, max_chunk, dtype, greeks_mode, solver,
    )


def price_american_batch_richardson(
    *,
    n_nodes: int,
    n_time_steps: int,
    n_time_steps_fine: Optional[int] = None,
    dv_sigma: Optional[float] = None,
    with_greeks: bool = True,
    mesh=None,
    axis_name: str = "data",
    max_chunk: Optional[int] = 1024,
    dtype=None,
    **build_kwargs,
) -> Dict[str, np.ndarray]:
    """Richardson-extrapolated batched American sweep.

    Two batched solves at ``n_time_steps`` and (default) twice that,
    combined as (4 P_fine - P_coarse)/3 per output — the batched twin of
    the scalar pricer's ``price_log2`` (whose reference quirk of refining
    to 2*num_space_nodes can be matched by passing ``n_time_steps_fine``).
    For O(dt^2) CN this cancels the leading time-truncation term, so a
    Richardson pair at (N, 2N) beats a flat run at ~4N steps for ~3/4 the
    sequential work (see docs/PERF_NOTES.md "Speed-of-light check" — step
    count is the binding cost on TPU).
    """
    fine = n_time_steps_fine or 2 * n_time_steps
    common = dict(
        n_nodes=n_nodes, dv_sigma=dv_sigma, with_greeks=with_greeks,
        mesh=mesh, axis_name=axis_name, max_chunk=max_chunk, dtype=dtype,
    )
    out_c = price_american_batch(
        build_american_batch(n_time_steps=n_time_steps, **build_kwargs),
        **common,
    )
    out_f = price_american_batch(
        build_american_batch(n_time_steps=fine, **build_kwargs), **common
    )
    return {k: (4.0 * out_f[k] - out_c[k]) / 3.0 for k in out_f}
