"""Gather cost from LARGE tables (venice-scale): index order, table
size, and lax.map-chunked vs flat.

    python -u benchmarks/micro_gather_big.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_arg(name, f, K, src, idx):
    """Slope timing with big operands passed as jit args."""
    from rootba_tpu.utils.jax_setup import sync

    def make(KK):
        @jax.jit
        def run(e0, src, idx):
            def body(i, e):
                y = f(src + e * 1e-30, idx)
                s = y.ravel()[0].astype(jnp.float32) * 1e-30
                return e * (1.0 + s) + s
            return jax.lax.fori_loop(0, KK, body, e0)
        return run

    fk, f4 = make(K), make(4 * K)
    z = jnp.zeros((), jnp.float32)

    def once(fn):
        t0 = time.monotonic()
        sync(fn(z, src, idx))
        return time.monotonic() - t0

    once(fk); once(f4)
    tk = sorted(once(fk) for _ in range(3))[1]
    t4 = sorted(once(f4) for _ in range(3))[1]
    print(f"{name:44s} {(t4 - tk) / (3 * K) * 1000:9.3f} ms/op",
          flush=True)


def main():
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    K = 4

    for S, G in ((5_200_000, 12_600_000), (234_000, 12_600_000)):
        src = jnp.asarray(rng.normal(size=(S, 27)).astype(np.float32))
        idx_r = jnp.asarray(rng.integers(0, S, size=G).astype(np.int32))
        idx_s = jnp.asarray(
            np.sort(rng.integers(0, S, size=G)).astype(np.int32))
        win = 262_144
        base = (np.arange(G, dtype=np.int64) * max(S - win, 1) // G)
        loc = base + rng.integers(0, win, size=G)
        idx_l = jnp.asarray(np.minimum(loc, S - 1).astype(np.int32))

        def g(s, idx):
            return jnp.take(s, idx, axis=0, mode="fill", fill_value=0.0)

        for name, idx in (("random", idx_r), ("sorted", idx_s),
                          ("local256k", idx_l)):
            timed_arg(f"take [G={G/1e6:.1f}M,27] S={S/1e6:.2f}M {name}",
                      g, K, src, idx)

        nch = 24
        ch = (G // nch) // 64 * 64

        def gm(s, idx):
            def one(ix):
                return jnp.sum(
                    jnp.take(s, ix, axis=0, mode="fill",
                             fill_value=0.0).reshape(ch // 64, 64, 27),
                    axis=1)

            return jax.lax.map(one, idx[:nch * ch].reshape(nch, ch))

        timed_arg(f"map-chunked take+reduce S={S/1e6:.2f}M", gm, K,
                  src, idx_r)

        def gf(s, idx):
            return jnp.sum(
                jnp.take(s, idx, axis=0, mode="fill",
                         fill_value=0.0).reshape(G // 64, 64, 27),
                axis=1)

        timed_arg(f"flat take+reduce S={S/1e6:.2f}M", gf, K, src, idx_r)




def knee():
    """Find the table-size knee: rows vs bytes.

    python -u benchmarks/micro_gather_big.py knee
    """
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    K = 4
    G = 4_000_000

    def g(s, idx):
        return jnp.take(s, idx, axis=0, mode="fill", fill_value=0.0)

    for S in (250_000, 500_000, 1_000_000, 2_000_000, 4_000_000):
        src = jnp.asarray(rng.normal(size=(S, 27)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, S, size=G).astype(np.int32))
        timed_arg(f"take [G=4M,27] S={S/1e6:.2f}M ({S*108//2**20}MB)",
                  g, K, src, idx)

    # byte-size control: few rows, wide -> same bytes as many-row table
    for S, F in ((250_000, 108), (250_000, 432)):
        src = jnp.asarray(rng.normal(size=(S, F)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, S, size=G).astype(np.int32))
        timed_arg(f"take [G=4M,{F}] S={S/1e6:.2f}M ({S*F*4//2**20}MB)",
                  g, K, src, idx)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "knee":
    knee()
    sys.exit(0)


if __name__ == "__main__":
    if len(sys.argv) <= 1 or sys.argv[1] != "knee":
        main()
