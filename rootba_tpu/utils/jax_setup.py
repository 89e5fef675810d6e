"""JAX runtime configuration helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Enable the persistent compilation cache (first compile of the
    solver stages is expensive, especially via remote compile services;
    repeat runs with identical shapes then start in seconds)."""
    import jax

    cache_dir = path or os.environ.get(
        "ROOTBA_JAX_CACHE", os.path.expanduser("~/.cache/rootba_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
