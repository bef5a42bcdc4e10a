"""Serving layer: bucketed services + micro-batching HTTP server.

The reference has no serving surface (SURVEY.md §0 — its runners are
``python file.py`` mains); these tests pin the TPU-serving contract the
framework adds: bucket padding must not change any result (the padded
clones are dropped), knock-ins ride the framework-wide in-out parity, and
the HTTP front coalesces concurrent requests into one device batch.
"""
import http.client
import json
import threading
import time

import numpy as np
import pytest

from finite_difference_tpu.models.analytic import generalized_bs_price
from finite_difference_tpu.models.pde.batch import (
    build_american_batch,
    build_trade_batch,
    price_american_batch,
    price_barrier_batch,
)
from finite_difference_tpu.serving import (
    AmericanPricingService,
    BarrierPricingService,
    PricingServer,
)

GRID = dict(n_time_steps=64, num_space_nodes=127)
MONITORS = [0.02, 0.04, 0.06, 0.08]


def _barrier_service(**kw):
    return BarrierPricingService(
        min_bucket=4, max_bucket=64, **{**GRID, **kw}
    )


def _ko_trade(**over):
    t = dict(
        spot=100.0, strike=95.0, sigma=0.3, t_expiry=0.08, r=0.05,
        is_call=True, barrier_type="up-and-out", upper=130.0,
        monitor_times=list(MONITORS),
    )
    t.update(over)
    return t


class TestBarrierService:
    def test_matches_direct_batch_call_despite_padding(self):
        trades = [
            _ko_trade(),
            _ko_trade(spot=90.0, barrier_type="down-and-out", lower=70.0,
                      upper=None, is_call=False),
            _ko_trade(barrier_type="none", upper=None),
        ]
        svc = _barrier_service()
        got = svc.price(trades)  # bucket=4 -> one padded clone

        tb = build_trade_batch(
            spots=[t["spot"] for t in trades],
            strikes=[t["strike"] for t in trades],
            sigmas=[t["sigma"] for t in trades],
            t_expiry=[t["t_expiry"] for t in trades],
            r=[t["r"] for t in trades],
            b=[t["r"] for t in trades],
            is_call=[t["is_call"] for t in trades],
            n_time_steps=GRID["n_time_steps"],
            monitor_times=[MONITORS for _ in trades],
            lower=[t.get("lower") for t in trades],
            upper=[t.get("upper") for t in trades],
            num_space_nodes=GRID["num_space_nodes"],
        )
        want = price_barrier_batch(tb, n_nodes=GRID["num_space_nodes"] + 1)
        for i, row in enumerate(got):
            for k in ("price", "delta", "gamma", "vega", "theta"):
                # B=4 (padded) and B=3 compile different executables whose
                # reduction orders differ at the ulp level; the vega bump
                # quotient amplifies that by 1/(dv*100) -> gate at 1e-9
                assert row[k] == pytest.approx(
                    float(np.asarray(want[k])[i]), rel=1e-9, abs=1e-12
                ), (i, k)
        assert svc.stats == {
            "requests": 1, "trades": 3, "bucket_hits": {4: 1}
        }

    def test_knock_in_parity_sums_to_vanilla(self):
        """KI is served as vanilla − KO, so KI + KO == analytic vanilla
        exactly (the parity identity the scalar engine uses,
        /root/reference/discrete_barrier_fdm_pricer.py:907-946)."""
        svc = _barrier_service()
        out_ko, out_ki = svc.price(
            [_ko_trade(), _ko_trade(barrier_type="up-and-in")]
        )
        s, k, sig, te, r = 100.0, 95.0, 0.3, 0.08, 0.05
        van = float(generalized_bs_price(s, k, sig, te, r, r, True))
        assert out_ko["price"] + out_ki["price"] == pytest.approx(
            van, rel=1e-12
        )
        # greeks obey the same parity against the closed-form bumps
        ds = s * 1e-4
        v = lambda s_=s, sig_=sig: float(
            generalized_bs_price(s_, k, sig_, te, r, r, True)
        )
        delta_van = (v(s + ds) - v(s - ds)) / (2 * ds)
        vega_van = (v(sig_=sig + 1e-4) - van) / (100.0 * 1e-4)
        assert out_ko["delta"] + out_ki["delta"] == pytest.approx(
            delta_van, rel=1e-9
        )
        assert out_ko["vega"] + out_ki["vega"] == pytest.approx(
            vega_van, rel=1e-9
        )

    def test_knock_in_rebate_conserves_discounted_rebate(self):
        """KI rebate pays at expiry iff the barrier is NEVER hit and the KO
        rebate iff it IS hit, so the two rebate legs together are worth
        exactly R*DF (both legs paid at expiry here)."""
        svc = _barrier_service()
        ki0, ki5, ko0, ko5 = svc.price(
            [
                _ko_trade(barrier_type="up-and-in"),
                _ko_trade(barrier_type="up-and-in", rebate=5.0),
                _ko_trade(),
                _ko_trade(rebate=5.0),
            ]
        )
        df = np.exp(-0.05 * 0.08)
        ki_leg = ki5["price"] - ki0["price"]  # 5*DF*P(no hit)
        ko_leg = ko5["price"] - ko0["price"]  # 5*DF*P(hit)
        assert ki_leg > 0 and ko_leg > 0
        assert ki_leg + ko_leg == pytest.approx(5.0 * df, rel=1e-10)

    def test_bucket_rounding_and_overflow(self):
        svc = _barrier_service()
        svc.price([_ko_trade(barrier_type="none", upper=None)] * 5)
        assert svc.stats["bucket_hits"] == {8: 1}
        with pytest.raises(ValueError, match="exceeds max_bucket"):
            svc.price([_ko_trade()] * 65)

    def test_hybrid_route_splits_lanes(self):
        """Continuous-regime trades (FIS n_lim rule) leave the PDE bucket
        for the analytic sweep with BGK-shifted barriers; discrete-regime
        trades price exactly as the pure-PDE service."""
        from finite_difference_tpu.models.analytic.batch import (
            continuous_barrier_sweep_greeks,
            monitoring_decision,
        )

        dense = [0.08 * i / 2100.0 for i in range(1, 2101)]
        tr_pde = _ko_trade()
        tr_cont = _ko_trade(monitor_times=dense)
        got = _barrier_service(route="hybrid").price([tr_pde, tr_cont])

        want_pde = _barrier_service().price([tr_pde])[0]
        for k, v in want_pde.items():
            assert got[0][k] == pytest.approx(v, rel=1e-9, abs=1e-12), k

        use_cont, adj = monitoring_decision(
            np.array([0.08]), [dense], np.array([0.3])
        )
        assert bool(use_cont[0])
        direct = continuous_barrier_sweep_greeks(
            np.array([100.0]), np.array([95.0]), np.array([0.08]),
            np.array([0.05]), np.array([0.05]), np.array([0.3]),
            lower=[None], upper=[130.0 * adj[0]],
            is_call=np.array([True]), is_in=np.array([False]),
        )
        for k in ("price", "delta", "gamma", "vega"):
            assert got[1][k] == pytest.approx(
                float(np.asarray(direct[k])[0]), rel=1e-12
            ), k
        assert np.isfinite(got[1]["theta"])

    def test_hybrid_route_keeps_rebates_on_pde(self):
        dense = [0.08 * i / 2100.0 for i in range(1, 2101)]
        trade = _ko_trade(monitor_times=dense, rebate=5.0, rebate_at_hit=True)
        hybrid = _barrier_service(route="hybrid").price([trade])[0]
        pde = _barrier_service().price([trade])[0]
        for k, v in pde.items():
            assert hybrid[k] == pytest.approx(v, rel=1e-9, abs=1e-12), k

    def test_barrier_level_validation(self):
        svc = _barrier_service()
        with pytest.raises(ValueError, match="requires 'upper'"):
            svc.price([_ko_trade(upper=None)])
        with pytest.raises(ValueError, match="unknown barrier_type"):
            svc.price([_ko_trade(barrier_type="sideways-out")])


class TestGreeksDtypePolicy:
    """The f32-greeks shipping policy (round 5): a greek-bearing f32
    service solves at the f64 accuracy rung unless explicitly opted out
    (service._resolve_greeks_dtype)."""

    def test_f32_greeks_service_defaults_to_f64(self):
        from finite_difference_tpu.serving import (
            AmericanPricingService, BarrierPricingService,
        )

        svc = _barrier_service(dtype=np.float32, with_greeks=True)
        assert np.dtype(svc.dtype) == np.float64
        am = AmericanPricingService(
            n_time_steps=8, num_space_nodes=62, dtype=np.float32,
            with_greeks=True, min_bucket=4, max_bucket=8,
        )
        assert np.dtype(am.dtype) == np.float64

    def test_explicit_f32_greeks_opt_out_and_price_only_keep_f32(self):
        from finite_difference_tpu.serving import BarrierPricingService

        svc = _barrier_service(
            dtype=np.float32, with_greeks=True, greeks_dtype=np.float32
        )
        assert np.dtype(svc.dtype) == np.float32
        price_only = _barrier_service(dtype=np.float32, with_greeks=False)
        assert np.dtype(price_only.dtype) == np.float32
        f64 = _barrier_service(dtype=np.float64, with_greeks=True)
        assert np.dtype(f64.dtype) == np.float64

    def test_policy_warns_when_x64_disabled(self):
        import jax

        from finite_difference_tpu.serving.service import (
            _resolve_greeks_dtype,
        )

        jax.config.update("jax_enable_x64", False)
        try:
            with pytest.warns(UserWarning, match="accuracy rung"):
                dt = _resolve_greeks_dtype(np.float32, True, None)
            assert np.dtype(dt) == np.float32  # honest: can't upgrade
        finally:
            jax.config.update("jax_enable_x64", True)

    def test_f32_greeks_service_ships_f64_accuracy(self):
        """End-to-end: the served greeks from an f32 service equal the
        f64 batch solve (not the noisy f32 one)."""
        trades = [_ko_trade(), _ko_trade(spot=105.0)]
        got = _barrier_service(dtype=np.float32, with_greeks=True).price(
            trades
        )
        want = _barrier_service(dtype=np.float64, with_greeks=True).price(
            trades
        )
        for g, w in zip(got, want):
            for k in ("price", "delta", "gamma", "vega", "theta"):
                assert g[k] == pytest.approx(w[k], rel=1e-12), k


class TestMeshShardedService:
    def test_mesh_sharded_service_matches_single_device(self):
        """A service built with a mesh shards its buckets over the
        (virtual 8-device) mesh; results equal the unsharded service."""
        from finite_difference_tpu.parallel import make_mesh

        trades = [
            _ko_trade(spot=90.0 + 2.0 * i, is_call=bool(i % 2))
            for i in range(8)
        ]
        plain = _barrier_service().price(trades)
        sharded = _barrier_service(mesh=make_mesh(8)).price(trades)
        for a, b in zip(plain, sharded):
            for k, v in a.items():
                assert b[k] == pytest.approx(v, rel=1e-9, abs=1e-12), k


class TestAmericanService:
    def test_matches_direct_batch_call(self):
        trades = [
            dict(spot=100.0, strike=110.0, sigma=0.25, t_expiry=0.5, r=0.06),
            dict(spot=100.0, strike=90.0, sigma=0.35, t_expiry=0.5, r=0.06,
                 is_call=True, dividends=[[0.25, 1.5]]),
        ]
        svc = AmericanPricingService(
            n_time_steps=64, num_space_nodes=126, min_bucket=2, max_bucket=16
        )
        got = svc.price(trades)
        tb = build_american_batch(
            spots=[100.0, 100.0], strikes=[110.0, 90.0],
            sigmas=[0.25, 0.35], t_expiry=[0.5, 0.5], r=[0.06, 0.06],
            b=[0.06, 0.06], is_call=[False, True], n_time_steps=64,
            dividends_tau=[[], [(0.25, 1.5)]], num_space_nodes=126,
        )
        want = price_american_batch(tb, n_nodes=128)
        for i, row in enumerate(got):
            for k in ("price", "delta", "gamma", "vega"):
                assert row[k] == pytest.approx(
                    float(np.asarray(want[k])[i]), rel=1e-12, abs=1e-14
                ), (i, k)
        # early-exercise premium over the analytic European put
        euro = float(
            generalized_bs_price(100.0, 110.0, 0.25, 0.5, 0.06, 0.06, False)
        )
        assert got[0]["price"] > euro

    def test_richardson_matches_batched_driver(self):
        from finite_difference_tpu.models.pde.batch import (
            price_american_batch_richardson,
        )

        trades = [
            dict(spot=100.0, strike=105.0, sigma=0.3, t_expiry=0.5, r=0.05),
            dict(spot=100.0, strike=95.0, sigma=0.2, t_expiry=0.5, r=0.05),
        ]
        svc = AmericanPricingService(
            n_time_steps=64, num_space_nodes=126, min_bucket=2,
            max_bucket=16, richardson=True,
        )
        got = svc.price(trades)
        want = price_american_batch_richardson(
            n_nodes=128, n_time_steps=64,
            spots=[100.0, 100.0], strikes=[105.0, 95.0], sigmas=[0.3, 0.2],
            t_expiry=[0.5, 0.5], r=[0.05, 0.05], b=[0.05, 0.05],
            is_call=[False, False], num_space_nodes=126,
        )
        for i, row in enumerate(got):
            for k in ("price", "delta", "gamma", "vega"):
                assert row[k] == pytest.approx(
                    float(np.asarray(want[k])[i]), rel=1e-9, abs=1e-12
                ), (i, k)


class TestPricingServer:
    @pytest.fixture()
    def server(self):
        svc = _barrier_service(with_greeks=False)
        with PricingServer(svc, window_ms=100.0) as srv:
            yield srv

    @staticmethod
    def _post(srv, payload):
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=120)
        try:
            conn.request(
                "POST", "/price", json.dumps(payload),
                {"Content-Type": "application/json"},
            )
            resp = conn.getresponse()
            return resp.status, json.loads(resp.read())
        finally:
            conn.close()

    def test_concurrent_requests_coalesce_into_one_batch(self, server):
        results = [None, None]

        def post(i):
            results[i] = self._post(
                server, {"trades": [_ko_trade(spot=100.0 + i)]}
            )

        threads = [
            threading.Thread(target=post, args=(i,)) for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, body in results:
            assert status == 200
            assert len(body["results"]) == 1
            assert body["results"][0]["price"] > 0
        # spot=101 knocks out slightly more -> strictly smaller price
        assert (
            results[1][1]["results"][0]["price"]
            != results[0][1]["results"][0]["price"]
        )
        assert server.stats["requests"] == 2
        # both landed within one 100 ms window -> a single device batch
        # (>=1 guards scheduler jitter; ==1 is the expected path)
        assert 1 <= server.stats["batches"] <= 2

    def test_healthz_and_malformed_request(self, server):
        status, body = self._post(server, {"trades": [_ko_trade()]})
        assert status == 200

        conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
        try:
            conn.request("GET", "/healthz")
            resp = conn.getresponse()
            health = json.loads(resp.read())
            assert resp.status == 200
        finally:
            conn.close()
        assert health["ok"] is True
        assert health["stats"]["requests"] >= 1
        assert health["service_stats"]["requests"] >= 1

        status, body = self._post(server, {"nope": 1})
        assert status == 400 and "bad request" in body["error"]

        # a pricing error is reported per-request, not a server crash
        status, body = self._post(
            server, {"trades": [_ko_trade(upper=None)]}
        )
        assert status == 500 and "requires 'upper'" in body["error"]
        status, _ = self._post(server, {"trades": [_ko_trade()]})
        assert status == 200


class _BlockingService:
    """Stub service: records priced trades, blocks until released —
    lets the tests hold the batcher mid-price deterministically."""

    max_bucket = None

    def __init__(self):
        self.stats = {"requests": 0}
        self.release = threading.Event()
        self.started = threading.Event()
        self.priced = []

    def price(self, trades):
        self.started.set()
        self.release.wait(30.0)
        self.priced.extend(trades)
        return [{"price": 1.0} for _ in trades]


class TestServerBackpressure:
    """Overload behavior (VERDICT r3 §weak-6): the pending queue is
    bounded (flood -> 503, no unbounded growth) and a pending whose
    client already timed out at 504 is dropped before pricing."""

    def test_flood_beyond_queue_bound_gets_503(self):
        svc = _BlockingService()
        with PricingServer(
            svc, window_ms=0.0, max_queue=2, request_timeout_s=30.0
        ) as srv:
            statuses = []
            lock = threading.Lock()

            def post(i):
                s, _ = TestPricingServer._post(srv, {"trades": [{"id": i}]})
                with lock:
                    statuses.append(s)

            t0 = threading.Thread(target=post, args=(0,))
            t0.start()
            assert svc.started.wait(10.0)  # batcher is pricing request 0
            fillers = [
                threading.Thread(target=post, args=(i,)) for i in (1, 2)
            ]
            for t in fillers:
                t.start()
            deadline = time.monotonic() + 10.0
            while srv._queue.qsize() < 2 and time.monotonic() < deadline:
                time.sleep(0.01)
            assert srv._queue.qsize() == 2  # bounded queue is full
            # anything beyond the bound is rejected immediately, not queued
            for i in (3, 4):
                s, body = TestPricingServer._post(
                    srv, {"trades": [{"id": i}]}
                )
                assert s == 503 and "overloaded" in body["error"]
            svc.release.set()
            t0.join(20.0)
            for t in fillers:
                t.join(20.0)
            assert statuses.count(200) == 3
            assert srv.stats["rejected"] == 2
            assert sorted(tr["id"] for tr in svc.priced) == [0, 1, 2]

    def test_expired_pending_never_priced(self):
        svc = _BlockingService()
        with PricingServer(
            svc, window_ms=0.0, max_queue=8, request_timeout_s=0.4
        ) as srv:
            res = {}

            def post(key, i):
                res[key] = TestPricingServer._post(
                    srv, {"trades": [{"id": i}]}
                )

            ta = threading.Thread(target=post, args=("a", 0))
            ta.start()
            assert svc.started.wait(10.0)  # batcher holds request a
            tb = threading.Thread(target=post, args=("b", 1))
            tb.start()
            ta.join(10.0)
            tb.join(10.0)
            # both clients timed out while the batcher was held
            assert res["a"][0] == 504 and res["b"][0] == 504
            svc.release.set()
            deadline = time.monotonic() + 10.0
            while (
                srv.stats["dropped_expired"] < 1
                and time.monotonic() < deadline
            ):
                time.sleep(0.02)
            # b was dropped before pricing: only a's trade ever ran
            assert srv.stats["dropped_expired"] == 1
            assert [tr["id"] for tr in svc.priced] == [0]
