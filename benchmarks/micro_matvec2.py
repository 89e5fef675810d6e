"""Composite matvec-variant benchmark: old (segment_sum) vs new
(CSR-gather-reduce scatter), plus gather-width probes.

    python benchmarks/micro_matvec2.py [O] [N] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _run_once(fn, *args):
    t0 = time.monotonic()
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return time.monotonic() - t0


def timed(name, fn_k, fn_4k, K, *args):
    _run_once(fn_k, *args)
    _run_once(fn_4k, *args)
    tk = sorted(_run_once(fn_k, *args) for _ in range(3))[1]
    t4k = sorted(_run_once(fn_4k, *args) for _ in range(3))[1]
    print(f"{name:46s} {(t4k - tk) / (3 * K) * 1000:9.4f} ms/op")


def chain(f, K):
    @jax.jit
    def run(x0):
        def body(i, c):
            y = f(c)
            if y.shape == c.shape:
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            s = jnp.sum(y) * 1e-30
            return c * (1.0 + 0.0 * s) + s
        return jax.lax.fori_loop(0, K, body, x0)
    return run


def chain2(f, K):
    return chain(f, K), chain(f, 4 * K)


def main():
    O = int(sys.argv[1]) if len(sys.argv) > 1 else 226_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 257
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n = 4
    L = O // n
    O = L * n
    print(f"O={O} N={N} L={L} n={n} K={K}")

    rng = np.random.default_rng(0)
    cam_idx = rng.integers(0, N, (L, n)).astype(np.int32)
    cam_idx = np.sort(cam_idx, axis=1)
    flat_cam = cam_idx.reshape(-1)

    # camera-CSR map: for camera c, the flat-obs positions seeing it,
    # padded to kmax with O (a dump row)
    order = np.argsort(flat_cam, kind="stable")
    counts = np.bincount(flat_cam, minlength=N)
    kmax = int(counts.max())
    csr = np.full((N, kmax), O, np.int32)
    pos = 0
    for c in range(N):
        csr[c, :counts[c]] = order[pos:pos + counts[c]]
        pos += counts[c]
    print(f"kmax={kmax} avg={O/N:.1f} pad_ratio={N*kmax/O:.2f}")

    cam_idx_j = jnp.asarray(cam_idx)
    flat_cam_j = jnp.asarray(flat_cam)
    csr_j = jnp.asarray(csr)

    Jp = jnp.asarray(rng.normal(size=(L, n, 2, 9)).astype(np.float32))
    Q1h = jnp.asarray(rng.normal(size=(L, n, 2, 3)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32))

    def matvec_old(x):
        xg = x[cam_idx_j]
        w = jnp.einsum("lnrj,lnj->lnr", Jp, xg)
        t3 = jnp.einsum("lnrc,lnr->lc", Q1h, w)
        wp = w - jnp.einsum("lnrc,lc->lnr", Q1h, t3)
        yb = jnp.einsum("lnrj,lnr->lnj", Jp, wp)
        return jax.ops.segment_sum(yb.reshape(-1, 9), flat_cam_j,
                                   num_segments=N)

    timed("matvec OLD (segment_sum)", *chain2(matvec_old, K), K, x0)

    def matvec_new(x):
        xg = x[cam_idx_j]
        w = jnp.einsum("lnrj,lnj->lnr", Jp, xg)
        t3 = jnp.einsum("lnrc,lnr->lc", Q1h, w)
        wp = w - jnp.einsum("lnrc,lc->lnr", Q1h, t3)
        yb = jnp.einsum("lnrj,lnr->lnj", Jp, wp).reshape(-1, 9)
        ybp = jnp.concatenate([yb, jnp.zeros((1, 9), yb.dtype)], axis=0)
        return jnp.sum(ybp[csr_j], axis=1)

    timed("matvec NEW (CSR gather-reduce)", *chain2(matvec_new, K), K, x0)

    # gather width probes
    x16 = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    timed("row gather [O,16] from [N,16]",
          *chain2(lambda c: (x16 + c[0, 0])[jnp.asarray(flat_cam)], K),
          K, x16)
    big = jnp.asarray(rng.normal(size=(O + 1, 9)).astype(np.float32))
    timed("CSR map gather+reduce only",
          *chain2(lambda c: jnp.sum((big + c[0, 0])[csr_j], axis=1), K),
          K, x0)

    # correctness
    ref = np.asarray(matvec_old(x0))
    new = np.asarray(matvec_new(x0))
    err = np.abs(ref - new).max() / (np.abs(ref).max() + 1e-30)
    print("rel err old vs new:", err)


if __name__ == "__main__":
    main()
