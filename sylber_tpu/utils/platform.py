"""JAX platform selection helper for entry-point scripts.

Some TPU plugins (axon) ignore the ``JAX_PLATFORMS`` environment variable;
the platform must be forced through ``jax.config`` BEFORE any backend
initialization (see tests/conftest.py, which additionally sets the simulated
CPU device count). Every CLI/script should call :func:`apply_jax_platform`
first thing instead of repeating this dance.
"""

from __future__ import annotations

import os


def apply_jax_platform(platform: str | None = None) -> None:
    """Force the JAX platform from ``platform`` or ``$JAX_PLATFORMS``.

    No-op when neither is set or when a backend is already initialized
    (RuntimeError from jax.config is swallowed: too late to change, and the
    caller asked for whatever is already active).
    """
    platform = platform or os.environ.get("JAX_PLATFORMS")
    if not platform:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platform)
    except RuntimeError:
        pass
