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


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 2.0) -> str | None:
    """Turn on JAX's persistent compilation cache.

    TPU compiles over the axon tunnel run 30-250 s each (CLAUDE.md); a
    persistent cache makes server restarts and repeated CLI invocations
    skip them entirely. Directory resolution order: argument,
    ``$SYLBER_TPU_CACHE_DIR``, ``~/.cache/sylber_tpu/xla``. Set
    ``SYLBER_TPU_CACHE_DIR=''`` (empty) to disable. Returns the directory
    used, or None when disabled/unsupported.
    """
    env = os.environ.get("SYLBER_TPU_CACHE_DIR")
    if env == "":
        return None
    cache_dir = cache_dir or env or os.path.expanduser(
        "~/.cache/sylber_tpu/xla")
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        # cache every entry regardless of backend-reported autotune state
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir
