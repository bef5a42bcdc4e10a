"""Shape-bucketed, recompile-free pricing services.

``price_barrier_batch``/``price_american_batch`` compile one executable
per (batch-size, grid, schedule) shape. A serving stream with request
sizes B=1..4096 would therefore pay a fresh XLA compile (tens of seconds
on the TPU tunnel) for every new B. The services here fix the grid and
schedule shapes at construction time and round every request up to a
power-of-two bucket, padding with clones of the first trade — the same
padding idiom the chunked driver uses for tail chunks
(models/pde/batch.py ``_run_batch_driver``) — so at most
``log2(max_bucket/min_bucket)+1`` compiled shapes serve every request
size, and steady-state latency is the kernel rate.

Knock-in trades are served via the framework-wide in-out parity
(KI(R) = vanilla − KO(R at expiry) + R·DF, models/pde/barrier.py
``price_log2`` / runners/barrier_scenarios.py batched path), with the
vanilla leg's greeks from closed-form bumps of the generalized
Black-Scholes price.
"""
from __future__ import annotations

import dataclasses
import threading
import warnings
from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np

__all__ = ["BarrierPricingService", "AmericanPricingService"]

_GREEK_KEYS = ("price", "delta", "gamma", "vega", "theta")


def _resolve_greeks_dtype(dtype, with_greeks: bool, greeks_dtype):
    """The f32-greeks shipping policy (round 5).

    Bump greeks on the f32 throughput rung carry Γ at ~13-32% and Θ at
    ~20% relative error vs the f64 oracle (BENCH_r04 per-greek fields) —
    orders worse than the reference's production greek diffs
    (BASELINE.md: Δ 6.8e-5, Γ/vega at 1e-3-or-better). A service asked
    for greeks therefore solves at the ACCURACY rung by default: an
    effective-f64 batch rides the df64 SPIKE / spectral f64 kernels
    (~3.8-4.7k grids/s/chip, errors ~1e-9..5e-7 vs oracle; price comes
    from the same solve and is strictly more accurate than the f32
    one). Price-only services keep the requested dtype (the 37-39k f32
    rung). Pass ``greeks_dtype=np.float32`` to explicitly opt back into
    fast bump greeks at the documented noise floor.
    """
    if not with_greeks or greeks_dtype is not None:
        return np.dtype(greeks_dtype) if greeks_dtype is not None else np.dtype(dtype)
    dt = np.dtype(dtype)
    if dt == np.float32:
        import jax

        if not jax.config.jax_enable_x64:
            warnings.warn(
                "greeks on an f32 service default to the f64 accuracy "
                "rung, but jax x64 is disabled — greeks will run at f32 "
                "with Γ/Θ noise ~0.1-0.3 rel (see docs/PERF_NOTES.md "
                "'Precision ladder'). Enable x64 or pass "
                "greeks_dtype=np.float32 to silence.",
                stacklevel=3,
            )
            return dt
        return np.dtype(np.float64)
    return dt


def _next_bucket(n: int, min_bucket: int, max_bucket: int) -> int:
    """Smallest power-of-two >= n, clamped to [min_bucket, max_bucket]."""
    if n > max_bucket:
        raise ValueError(
            f"request of {n} trades exceeds max_bucket={max_bucket}; "
            "split the request or raise max_bucket"
        )
    b = max(min_bucket, 1)
    while b < n:
        b <<= 1
    return min(b, max_bucket)


def _pad_batch(tb, pad: int):
    """Append ``pad`` clones of the first trade to every per-trade array."""
    if pad <= 0:
        return tb
    out = {}
    for f in dataclasses.fields(tb):
        v = getattr(tb, f.name)
        if v is None:
            out[f.name] = None
            continue
        v = np.asarray(v)
        out[f.name] = np.concatenate(
            [v, np.broadcast_to(v[:1], (pad,) + v.shape[1:])]
        )
    return type(tb)(**out)


class _BucketedService:
    """Shared bucketing/stats machinery; subclasses build & price batches."""

    def __init__(self, min_bucket: int, max_bucket: int) -> None:
        if min_bucket < 1 or max_bucket < min_bucket:
            raise ValueError("need 1 <= min_bucket <= max_bucket")
        self.min_bucket = int(min_bucket)
        self.max_bucket = int(max_bucket)
        self._lock = threading.Lock()
        self.stats: Dict[str, Any] = {
            "requests": 0,
            "trades": 0,
            "bucket_hits": {},
        }

    def _record(self, n_trades: int, bucket: int) -> None:
        with self._lock:
            self.stats["requests"] += 1
            self.stats["trades"] += n_trades
            hits = self.stats["bucket_hits"]
            hits[bucket] = hits.get(bucket, 0) + 1

    def price(self, trades: Sequence[Mapping[str, Any]]) -> List[Dict[str, float]]:
        if not trades:
            return []
        bucket = _next_bucket(len(trades), self.min_bucket, self.max_bucket)
        self._record(len(trades), bucket)
        return self._price_bucketed(list(trades), bucket)

    def _price_bucketed(self, trades, bucket):  # pragma: no cover - abstract
        raise NotImplementedError


class BarrierPricingService(_BucketedService):
    """Discretely-monitored barrier (and vanilla) pricing service.

    Trade dicts (floats resolved — dates/calendars are the caller's
    host-side concern, per the framework's design stance):

    - ``spot``, ``strike``, ``sigma``, ``t_expiry``, ``r`` (NACC);
      optional ``b`` (carry, default r), ``q`` (escrowed dividend NACC,
      default 0), ``is_call`` (default True);
    - ``monitor_times``: year fractions of the monitor dates (a final
      monitor at expiry is appended when missing, matching
      DiscreteBarrierFDMPricer's convention); default: expiry only;
    - ``barrier_type``: 'none' | 'up-and-out' | 'down-and-out' |
      'double-out' | 'up-and-in' | 'down-and-in' | 'double-in'
      with ``upper``/``lower`` levels as applicable;
    - ``rebate`` (default 0), ``rebate_at_hit`` (default False).

    The grid (``n_time_steps`` x ``num_space_nodes``) and dtype are fixed
    per service instance so every request reuses the bucket's compiled
    kernel; construct one service per grid policy. A greek-bearing
    ``dtype=float32`` service solves at the f64 accuracy rung by default
    (the f32-greeks policy, :func:`_resolve_greeks_dtype`); pass
    ``greeks_dtype=np.float32`` to opt into fast bump greeks at the f32
    noise floor (Γ/Θ ~0.1-0.3 rel — docs/PERF_NOTES.md).

    ``route='hybrid'`` applies the FIS n_lim monitoring decision per trade
    (the runner's --route hybrid; reference semantics
    discrete_barrier_analytic_pricer.py:278-342): continuous-regime
    trades — more monitors than the PDE time grid can resolve — are
    priced by the batched analytic sweep with BGK-shifted barriers
    instead of the CN batch. Rebate-bearing trades always stay on the
    PDE lane (the analytic sweep's rebate legs don't cover doubles).
    """

    def __init__(
        self,
        n_time_steps: int = 512,
        num_space_nodes: int = 1023,
        *,
        with_greeks: bool = True,
        greeks_mode: str = "bump",
        solver: str = "auto",
        dtype=np.float64,
        max_chunk: Optional[int] = 1024,
        min_bucket: int = 8,
        max_bucket: int = 4096,
        mesh=None,
        route: str = "pde",
        greeks_dtype=None,
    ) -> None:
        super().__init__(min_bucket, max_bucket)
        if route not in ("pde", "hybrid"):
            raise ValueError(f"route must be 'pde' or 'hybrid', got {route!r}")
        self.n_time_steps = int(n_time_steps)
        self.num_space_nodes = int(num_space_nodes)
        self.with_greeks = bool(with_greeks)
        self.greeks_mode = greeks_mode
        self.solver = solver
        # greek-bearing f32 services solve at the f64 accuracy rung by
        # default (see _resolve_greeks_dtype — the f32-greeks policy)
        self.dtype = _resolve_greeks_dtype(dtype, self.with_greeks, greeks_dtype)
        self.max_chunk = max_chunk
        self.mesh = mesh
        self.route = route

    @staticmethod
    def _barriers(trade: Mapping[str, Any]):
        bt = str(trade.get("barrier_type", "none"))
        upper = trade.get("upper")
        lower = trade.get("lower")
        is_in = "in" in bt
        if bt == "none":
            upper = lower = None
        elif "up" in bt:
            if upper is None:
                raise ValueError(f"{bt} requires 'upper'")
            lower = None
        elif "down" in bt:
            if lower is None:
                raise ValueError(f"{bt} requires 'lower'")
            upper = None
        elif "double" in bt:
            if upper is None or lower is None:
                raise ValueError(f"{bt} requires 'upper' and 'lower'")
        else:
            raise ValueError(f"unknown barrier_type {bt!r}")
        return lower, upper, is_in

    @staticmethod
    def _monitors(trades) -> List[List[float]]:
        out = []
        for t in trades:
            te = float(t["t_expiry"])
            m = [float(x) for x in t.get("monitor_times", [te])]
            # the engines always monitor at expiry (barrier.py convention)
            if not m or m[-1] < te - 1e-14:
                m.append(te)
            out.append(m)
        return out

    def _price_bucketed(self, trades, bucket):
        if self.route == "hybrid":
            return self._price_hybrid(trades)
        return self._price_pde(trades, bucket)

    def _price_hybrid(self, trades):
        """Split the request by the FIS n_lim rule; price each lane once."""
        from ..models.analytic.batch import monitoring_decision

        use_cont, adj = monitoring_decision(
            np.array([float(t["t_expiry"]) for t in trades]),
            self._monitors(trades),
            np.array([float(t["sigma"]) for t in trades]),
        )
        use_cont &= np.array(
            [float(t.get("rebate", 0.0)) == 0.0 for t in trades]
        )
        pde_i = [i for i in range(len(trades)) if not use_cont[i]]
        cont_i = [i for i in range(len(trades)) if use_cont[i]]
        results: List[Optional[Dict[str, float]]] = [None] * len(trades)
        if pde_i:
            bucket = _next_bucket(len(pde_i), self.min_bucket, self.max_bucket)
            for i, row in zip(
                pde_i, self._price_pde([trades[i] for i in pde_i], bucket)
            ):
                results[i] = row
        if cont_i:
            for i, row in zip(
                cont_i,
                self._price_continuous(
                    [trades[i] for i in cont_i], adj[cont_i]
                ),
            ):
                results[i] = row
        return results

    def _price_continuous(self, trades, bgk_adj):
        """Analytic lane: continuous sweep with BGK-shifted barriers."""
        from ..models.analytic.batch import (
            continuous_barrier_sweep,
            continuous_barrier_sweep_greeks,
        )

        lowers, uppers, is_in = [], [], []
        for t, a in zip(trades, bgk_adj):
            lo, up, ki = self._barriers(t)
            lowers.append(None if lo is None else float(lo) / a)
            uppers.append(None if up is None else float(up) * a)
            is_in.append(ki)
        col = lambda f: np.array([f(t) for t in trades], np.float64)
        s = col(lambda t: t["spot"])
        k = col(lambda t: t["strike"])
        sig = col(lambda t: t["sigma"])
        te = col(lambda t: t["t_expiry"])
        r = col(lambda t: t["r"])
        # the PDE lane's dynamics use carry b with escrowed-dividend NACC q
        # subtracted from the drift; the closed forms fold that into b
        b = col(lambda t: t.get("b", t["r"])) - col(lambda t: t.get("q", 0.0))
        is_call = np.array([bool(t.get("is_call", True)) for t in trades])
        is_in = np.asarray(is_in)
        if not self.with_greeks:
            price = np.asarray(
                continuous_barrier_sweep(
                    s, k, te, r, b, sig, lower=lowers, upper=uppers,
                    is_call=is_call, is_in=is_in,
                ),
                dtype=np.float64,
            )
            return [{"price": float(p)} for p in price]
        out = continuous_barrier_sweep_greeks(
            s, k, te, r, b, sig, lower=lowers, upper=uppers,
            is_call=is_call, is_in=is_in, greeks_mode=self.greeks_mode,
        )
        cols = {
            key: np.asarray(v, dtype=np.float64) for key, v in out.items()
        }
        # theta by central maturity bump (the KI-parity leg's convention)
        dte = np.minimum(1e-5, 0.5 * te)
        px = lambda te_: np.asarray(
            continuous_barrier_sweep(
                s, k, te_, r, b, sig, lower=lowers, upper=uppers,
                is_call=is_call, is_in=is_in,
            ),
            dtype=np.float64,
        )
        cols["theta"] = -(px(te + dte) - px(te - dte)) / (2.0 * dte)
        keys = [key for key in _GREEK_KEYS if key in cols]
        return [
            {key: float(cols[key][i]) for key in keys}
            for i in range(len(trades))
        ]

    def _price_pde(self, trades, bucket):
        from ..models.pde.batch import build_trade_batch, price_barrier_batch

        B = len(trades)
        lowers, uppers, is_in = [], [], []
        for t in trades:
            lo, up, ki = self._barriers(t)
            lowers.append(lo)
            uppers.append(up)
            is_in.append(ki)

        t_exp = [float(t["t_expiry"]) for t in trades]
        monitors = self._monitors(trades)

        tb = build_trade_batch(
            spots=[float(t["spot"]) for t in trades],
            strikes=[float(t["strike"]) for t in trades],
            sigmas=[float(t["sigma"]) for t in trades],
            t_expiry=t_exp,
            r=[float(t["r"]) for t in trades],
            b=[float(t.get("b", t["r"])) for t in trades],
            is_call=[bool(t.get("is_call", True)) for t in trades],
            n_time_steps=self.n_time_steps,
            monitor_times=monitors,
            lower=lowers,
            upper=uppers,
            q=[float(t.get("q", 0.0)) for t in trades],
            rebate=[float(t.get("rebate", 0.0)) for t in trades],
            # the IN parity complement carries its rebate at EXPIRY
            # (KI(R) = vanilla - KO(R at expiry) + R*DF)
            rebate_at_hit=[
                bool(t.get("rebate_at_hit", False)) and not ki
                for t, ki in zip(trades, is_in)
            ],
            num_space_nodes=self.num_space_nodes,
            dtype=self.dtype,
        )
        tb = _pad_batch(tb, bucket - B)
        out = price_barrier_batch(
            tb,
            n_nodes=self.num_space_nodes + 1,
            with_greeks=self.with_greeks,
            greeks_mode=self.greeks_mode,
            solver=self.solver,
            max_chunk=self.max_chunk,
            mesh=self.mesh,
        )
        keys = [k for k in _GREEK_KEYS if k in out]
        cols = {k: np.asarray(out[k])[:B].astype(np.float64) for k in keys}

        in_idx = np.where(np.asarray(is_in))[0]
        if in_idx.size:
            self._apply_ki_parity(trades, in_idx, cols, keys)
        return [{k: float(cols[k][i]) for k in keys} for i in range(B)]

    @staticmethod
    def _apply_ki_parity(trades, in_idx, cols, keys) -> None:
        """KI(R) = vanilla − KO(R at expiry) + R·DF, greeks likewise.

        Vanilla-leg greeks via closed-form bumps of generalized BS (the
        batched runner's convention; vega per 1 vol-point, ONE-SIDED like
        the scalar engine's _vanilla_black76_greeks_fd). The rebate leg
        R·DF is flat in spot/vol, so only price and theta see it.
        Vectorized: a fixed number of closed-form sweeps per request.
        """
        from ..models.analytic import generalized_bs_price

        col = lambda f: np.array([f(trades[i]) for i in in_idx], np.float64)
        s = col(lambda t: t["spot"])
        k = col(lambda t: t["strike"])
        sig = col(lambda t: t["sigma"])
        te = col(lambda t: t["t_expiry"])
        r = col(lambda t: t["r"])
        b = col(lambda t: t.get("b", t["r"])) - col(lambda t: t.get("q", 0.0))
        is_call = np.array(
            [bool(trades[i].get("is_call", True)) for i in in_idx]
        )
        rebate = col(lambda t: t.get("rebate", 0.0))
        df = np.exp(-r * te)

        def v(s_=None, sig_=None, te_=None):
            return np.asarray(
                generalized_bs_price(
                    s if s_ is None else s_,
                    k,
                    sig if sig_ is None else sig_,
                    te if te_ is None else te_,
                    r,
                    b,
                    is_call,
                ),
                dtype=np.float64,
            )

        van = v()
        cols["price"][in_idx] = van - cols["price"][in_idx] + rebate * df
        if "delta" in keys:
            ds = s * 1e-4
            v_up, v_dn = v(s_=s + ds), v(s_=s - ds)
            cols["delta"][in_idx] = (
                (v_up - v_dn) / (2 * ds) - cols["delta"][in_idx]
            )
            cols["gamma"][in_idx] = (
                (v_up - 2 * van + v_dn) / ds**2 - cols["gamma"][in_idx]
            )
        if "vega" in keys:
            dsig = 1e-4
            cols["vega"][in_idx] = (
                (v(sig_=sig + dsig) - van) / (100.0 * dsig)
                - cols["vega"][in_idx]
            )
        if "theta" in keys:
            # theta = dV/dt (valuation time) = -dV/dT; d(R·DF)/dt = r·R·DF
            dte = np.minimum(1e-5, 0.5 * te)
            v_theta = -(v(te_=te + dte) - v(te_=te - dte)) / (2 * dte)
            cols["theta"][in_idx] = (
                v_theta - cols["theta"][in_idx] + r * rebate * df
            )


class AmericanPricingService(_BucketedService):
    """American option pricing service on the batched CN/SPIKE sweep.

    Trade dicts: ``spot``, ``strike``, ``sigma``, ``t_expiry``, ``r``;
    optional ``b`` (default r), ``is_call`` (default False — puts are the
    production American workload), ``dividends``: list of
    ``[tau_from_expiry, amount]`` pairs (build_american_batch layout).

    ``richardson=True`` serves the reference's production convention
    (AmericanFDMPricer.price_log2/greeks_log2, fd_american_equity.py:925):
    each bucket solves at ``n_time_steps`` and twice that, combined as
    (4*P_fine - P_coarse)/3 — two compiled shapes per bucket instead of
    one.
    """

    def __init__(
        self,
        n_time_steps: int = 512,
        num_space_nodes: int = 1022,
        *,
        with_greeks: bool = True,
        greeks_mode: str = "bump",
        solver: str = "auto",
        dtype=np.float64,
        max_chunk: Optional[int] = 1024,
        min_bucket: int = 8,
        max_bucket: int = 4096,
        snap_to_grid: bool = False,
        mesh=None,
        richardson: bool = False,
        greeks_dtype=None,
    ) -> None:
        super().__init__(min_bucket, max_bucket)
        self.n_time_steps = int(n_time_steps)
        self.num_space_nodes = int(num_space_nodes)
        self.with_greeks = bool(with_greeks)
        self.greeks_mode = greeks_mode
        self.solver = solver
        # greek-bearing f32 services solve at the f64 accuracy rung by
        # default (see _resolve_greeks_dtype — the f32-greeks policy)
        self.dtype = _resolve_greeks_dtype(dtype, self.with_greeks, greeks_dtype)
        self.max_chunk = max_chunk
        self.snap_to_grid = bool(snap_to_grid)
        self.mesh = mesh
        self.richardson = bool(richardson)

    def _solve(self, trades, bucket, n_time_steps):
        from ..models.pde.batch import build_american_batch, price_american_batch

        B = len(trades)
        tb = build_american_batch(
            spots=[float(t["spot"]) for t in trades],
            strikes=[float(t["strike"]) for t in trades],
            sigmas=[float(t["sigma"]) for t in trades],
            t_expiry=[float(t["t_expiry"]) for t in trades],
            r=[float(t["r"]) for t in trades],
            b=[float(t.get("b", t["r"])) for t in trades],
            is_call=[bool(t.get("is_call", False)) for t in trades],
            n_time_steps=n_time_steps,
            dividends_tau=[
                [(float(tau), float(amt)) for tau, amt in t.get("dividends", [])]
                for t in trades
            ],
            num_space_nodes=self.num_space_nodes,
            dtype=self.dtype,
            snap_to_grid=self.snap_to_grid,
        )
        tb = _pad_batch(tb, bucket - B)
        out = price_american_batch(
            tb,
            n_nodes=self.num_space_nodes + 2,
            with_greeks=self.with_greeks,
            greeks_mode=self.greeks_mode,
            solver=self.solver,
            max_chunk=self.max_chunk,
            mesh=self.mesh,
        )
        keys = [k for k in _GREEK_KEYS if k in out]
        return {k: np.asarray(out[k])[:B].astype(np.float64) for k in keys}

    def _price_bucketed(self, trades, bucket):
        cols = self._solve(trades, bucket, self.n_time_steps)
        if self.richardson:
            fine = self._solve(trades, bucket, 2 * self.n_time_steps)
            cols = {k: (4.0 * fine[k] - cols[k]) / 3.0 for k in cols}
        keys = list(cols)
        return [
            {k: float(cols[k][i]) for k in keys} for i in range(len(trades))
        ]
