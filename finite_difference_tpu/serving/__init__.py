"""Serving layer: shape-bucketed pricing services + micro-batching server.

The reference is a batch validation library with no serving surface
(SURVEY.md §0: runners are ``python file.py`` mains). On TPU the missing
piece for production deployment is shape discipline: XLA compiles one
executable per input shape, so a request stream with varying batch sizes
would trigger a multi-second compile per distinct size. This package
provides

- :class:`BarrierPricingService` / :class:`AmericanPricingService` —
  request batches rounded up to power-of-two buckets (padded with clones
  of the first trade, the chunked driver's own tail idiom), so a handful
  of compiled shapes serve every request size at the kernel rate;
- :class:`PricingServer` — a stdlib-only threaded HTTP front that
  coalesces concurrent requests into one device batch (micro-batching).
"""
from .service import AmericanPricingService, BarrierPricingService
from .server import PricingServer

__all__ = [
    "AmericanPricingService",
    "BarrierPricingService",
    "PricingServer",
]
