"""Shared CLI plumbing for the runner mains."""
from __future__ import annotations


def add_backend_flag(parser) -> None:
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU jax backend in-process (a preloaded TPU device "
        "plugin ignores the JAX_PLATFORMS env var, so only an in-process "
        "jax.config update can override it)",
    )


def apply_backend_flag(args) -> None:
    """Must run before the first jax computation of the process."""
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
