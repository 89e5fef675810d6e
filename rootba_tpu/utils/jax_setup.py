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

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    if leaves:
        jax.device_get(_probe_scalar(tuple(leaves)))
    return tree


def _probe_scalar(leaves):
    """One jitted dispatch producing a 0-d f32 that data-depends on
    every leaf (first element each; no ravel copies). jit caches per
    leaf-shape structure."""
    global _probe_jit
    import jax
    import jax.numpy as jnp

    if _probe_jit is None:
        def probe(ls):
            acc = jnp.zeros((), jnp.float32)
            for leaf in ls:
                if leaf.size:
                    v = jax.lax.slice(
                        leaf.reshape(-1), (0,), (1,))[0]
                    acc = acc + v.astype(jnp.float32) * 0.0
            return acc
        _probe_jit = jax.jit(probe)
    return _probe_jit(leaves)


_probe_jit = None


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
