"""JAX runtime configuration helpers."""

from __future__ import annotations

import os


def sync(tree):
    """Reliably wait until every array in `tree` has materialized.

    jax.block_until_ready() silently returns early on some experimental
    remote-device platforms (observed on the 'axon' TPU tunnel), which
    makes naive timing report dispatch latency instead of execution
    time. Pulling a scalar that data-depends on every leaf to the host
    cannot complete before the producing programs have finished, so this
    is used for all timing and host-side control-flow decisions.
    """
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    if leaves:
        acc = jnp.zeros((), jnp.float32)
        for leaf in leaves:
            v = leaf.ravel()[0] if leaf.size else jnp.zeros((), leaf.dtype)
            acc = acc + v.astype(jnp.float32) * 0.0
        jax.device_get(acc)
    return tree


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
