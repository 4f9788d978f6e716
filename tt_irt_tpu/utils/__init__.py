"""Configs, profiling counters, misc utilities."""

import os

__all__ = ["set_platform"]


def set_platform(name: str | None = None) -> None:
    """Pin the JAX backend before first device use.

    Some out-of-tree TPU platform plugins register themselves
    unconditionally and ignore the ``JAX_PLATFORMS`` environment
    variable, so a CPU-only run (e.g. an f64 DIRT construction while the
    TPU serves another job) must pin the platform through
    ``jax.config``.  ``name=None`` honors ``JAX_PLATFORMS`` if set and
    otherwise leaves the default platform selection alone.
    """
    import jax

    name = name if name is not None else os.environ.get("JAX_PLATFORMS", "")
    if name:
        jax.config.update("jax_platforms", name)
