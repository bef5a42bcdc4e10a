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
from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np

__all__ = ["BarrierPricingService", "AmericanPricingService"]

_GREEK_KEYS = ("price", "delta", "gamma", "vega", "theta")


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
    kernel; construct one service per grid policy.
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
    ) -> None:
        super().__init__(min_bucket, max_bucket)
        self.n_time_steps = int(n_time_steps)
        self.num_space_nodes = int(num_space_nodes)
        self.with_greeks = bool(with_greeks)
        self.greeks_mode = greeks_mode
        self.solver = solver
        self.dtype = dtype
        self.max_chunk = max_chunk
        self.mesh = mesh

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

    def _price_bucketed(self, trades, bucket):
        from ..models.pde.batch import build_trade_batch, price_barrier_batch

        B = len(trades)
        lowers, uppers, is_in = [], [], []
        for t in trades:
            lo, up, ki = self._barriers(t)
            lowers.append(lo)
            uppers.append(up)
            is_in.append(ki)

        t_exp = [float(t["t_expiry"]) for t in trades]
        monitors = []
        for t, te in zip(trades, t_exp):
            m = [float(x) for x in t.get("monitor_times", [te])]
            # the engines always monitor at expiry (barrier.py convention)
            if not m or m[-1] < te - 1e-14:
                m.append(te)
            monitors.append(m)

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
    ) -> None:
        super().__init__(min_bucket, max_bucket)
        self.n_time_steps = int(n_time_steps)
        self.num_space_nodes = int(num_space_nodes)
        self.with_greeks = bool(with_greeks)
        self.greeks_mode = greeks_mode
        self.solver = solver
        self.dtype = dtype
        self.max_chunk = max_chunk
        self.snap_to_grid = bool(snap_to_grid)
        self.mesh = mesh

    def _price_bucketed(self, trades, bucket):
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
            n_time_steps=self.n_time_steps,
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
        cols = {k: np.asarray(out[k])[:B].astype(np.float64) for k in keys}
        return [{k: float(cols[k][i]) for k in keys} for i in range(B)]
