"""Launch the micro-batching pricing server from the command line.

    python -m finite_difference_tpu.serving --port 8777
    python -m finite_difference_tpu.serving --service american --steps 512

Then::

    curl -s localhost:8777/healthz
    curl -s -X POST localhost:8777/price -d '{"trades": [{"spot": 100,
        "strike": 95, "sigma": 0.3, "t_expiry": 0.25, "r": 0.05,
        "barrier_type": "up-and-out", "upper": 130}]}'

The reference has no serving surface at all (its runners are ``python
file.py`` mains, SURVEY.md §1 L6); this is the deployment front for the
batched TPU kernels.
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        prog="python -m finite_difference_tpu.serving",
        description="Micro-batching HTTP pricing server",
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8777)
    ap.add_argument(
        "--service", choices=("barrier", "american"), default="barrier"
    )
    ap.add_argument("--steps", type=int, default=512,
                    help="time steps per grid")
    ap.add_argument("--nodes", type=int, default=None,
                    help="space nodes (default: 1023 barrier / 1022 american)")
    ap.add_argument("--window-ms", type=float, default=5.0,
                    help="micro-batch coalescing window")
    ap.add_argument("--max-bucket", type=int, default=4096)
    ap.add_argument("--route", choices=("pde", "hybrid"), default="pde",
                    help="barrier service: 'hybrid' sends continuous-"
                         "regime trades (FIS n_lim rule) to the analytic "
                         "sweep with BGK-shifted barriers")
    ap.add_argument("--no-greeks", action="store_true")
    ap.add_argument("--richardson", action="store_true",
                    help="american service: (N, 2N) Richardson pairs — "
                         "the reference's price_log2 convention")
    ap.add_argument("--f32", action="store_true",
                    help="price in float32 (throughput rung) instead of f64")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in-process")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        import jax

        jax.config.update("jax_enable_x64", True)

    from . import AmericanPricingService, BarrierPricingService, PricingServer

    dtype = np.float32 if args.f32 else np.float64
    common = dict(
        n_time_steps=args.steps,
        with_greeks=not args.no_greeks,
        dtype=dtype,
        max_bucket=args.max_bucket,
    )
    if args.service == "barrier":
        svc = BarrierPricingService(
            num_space_nodes=args.nodes if args.nodes else 1023,
            route=args.route, **common
        )
    else:
        if args.route != "pde":
            ap.error("--route applies to the barrier service only")
        svc = AmericanPricingService(
            num_space_nodes=args.nodes if args.nodes else 1022,
            richardson=args.richardson, **common
        )
    if args.richardson and args.service != "american":
        ap.error("--richardson applies to the american service only")

    server = PricingServer(
        svc, host=args.host, port=args.port, window_ms=args.window_ms
    ).start()
    print(
        f"{type(svc).__name__} on http://{server.host}:{server.port} "
        f"(grid {args.steps}x{svc.num_space_nodes}, dtype {np.dtype(dtype).name}, "
        f"window {args.window_ms} ms) — Ctrl-C to stop"
    )
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        print("shutting down")
    finally:
        server.stop()


if __name__ == "__main__":
    main()
