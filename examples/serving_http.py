"""HTTP pricing service demo: micro-batched barrier pricing over REST.

Starts a PricingServer around a BarrierPricingService, fires concurrent
single-trade requests from client threads, and reports latency and the
coalescing ratio (requests per device batch). The point being measured:
N concurrent requests inside one window cost ONE kernel launch, so the
per-request latency is the batch kernel's latency, not N times it.

Run on the TPU:  python examples/serving_http.py  (first compile 20-40 s)
Quick CPU check: python examples/serving_http.py --cpu --trades 64
"""
import argparse
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in-process")
    ap.add_argument("--trades", type=int, default=256,
                    help="number of concurrent single-trade requests")
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--nodes", type=int, default=1023)
    ap.add_argument("--window-ms", type=float, default=10.0)
    ap.add_argument("--waves", type=int, default=2,
                    help="request waves; wave 1 pays the bucket compiles, "
                         "later waves show the steady state")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from finite_difference_tpu.serving import (
        BarrierPricingService,
        PricingServer,
    )

    svc = BarrierPricingService(
        n_time_steps=args.steps, num_space_nodes=args.nodes,
        min_bucket=8, max_bucket=4096,
    )

    def post(host, port, payload):
        conn = http.client.HTTPConnection(host, port, timeout=600)
        try:
            conn.request(
                "POST", "/price", json.dumps(payload),
                {"Content-Type": "application/json"},
            )
            return json.loads(conn.getresponse().read())
        finally:
            conn.close()

    base = dict(
        strike=190.0, sigma=0.2879, t_expiry=1.0 / 12.0, r=0.0706,
        is_call=True, barrier_type="up-and-out", upper=260.0,
        monitor_times=[(i + 1) / (24.0 * 12.0) for i in range(24)],
    )

    with PricingServer(svc, window_ms=args.window_ms) as srv:
        print(f"serving on http://{srv.host}:{srv.port}  "
              f"(grid {args.steps}x{args.nodes})")
        # warm the bucket's compiled kernel out-of-band
        t0 = time.perf_counter()
        post(srv.host, srv.port, {"trades": [dict(base, spot=229.74)]})
        print(f"warm-up (compile): {time.perf_counter() - t0:.1f} s")

        for wave in range(1, args.waves + 1):
            lat = [0.0] * args.trades

            def client(i: int) -> None:
                t = time.perf_counter()
                out = post(
                    srv.host, srv.port,
                    {"trades": [dict(base, spot=180.0 + 0.02 * i)]},
                )
                lat[i] = time.perf_counter() - t
                assert out["results"][0]["price"] >= 0.0

            threads = [
                threading.Thread(target=client, args=(i,))
                for i in range(args.trades)
            ]
            batches0 = srv.stats["batches"]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0

            lat_sorted = sorted(lat)
            p50 = lat_sorted[len(lat) // 2]
            p99 = lat_sorted[int(0.99 * (len(lat) - 1))]
            batches = srv.stats["batches"] - batches0
            print(
                f"wave {wave}: {args.trades} concurrent requests in "
                f"{wall:.2f} s ({args.trades / wall:.0f} req/s) | latency "
                f"p50 {p50 * 1e3:.0f} ms p99 {p99 * 1e3:.0f} ms | coalesced "
                f"into {batches} device batch(es) "
                f"({args.trades / max(batches, 1):.0f} req/batch)"
            )
        print(f"bucket hits {svc.stats['bucket_hits']}")


if __name__ == "__main__":
    main()
