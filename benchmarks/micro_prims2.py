"""Second round of primitive micro-benchmarks: gather widths, 1-D
gathers, CSR-style broadcast/reduce, slot-major einsums at high K.

    python benchmarks/micro_prims2.py [O] [N] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

RTT = 0.0


def _run_once(fn, *args):
    t0 = time.monotonic()
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return time.monotonic() - t0


def timed(name, fn_k, fn_4k, K, *args):
    """Slope-based: per-op = (t(4K) - t(K)) / 3K, median of 3 each.
    Immune to constant dispatch/RTT offsets."""
    _run_once(fn_k, *args)
    _run_once(fn_4k, *args)
    tk = sorted(_run_once(fn_k, *args) for _ in range(3))[1]
    t4k = sorted(_run_once(fn_4k, *args) for _ in range(3))[1]
    print(f"{name:44s} {(t4k - tk) / (3 * K) * 1000:9.4f} ms/op")


def chain2(f, K):
    return chain(f, K), chain(f, 4 * K)


def chain(f, K):
    @jax.jit
    def run(x0):
        def body(i, c):
            y = f(c)
            if y.shape == c.shape:
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            # fold a full reduction of y back into the carry so the op
            # cannot be DCE'd or narrowed
            s = jnp.sum(y) * 1e-30
            return c * (1.0 + 0.0 * s) + s
        return jax.lax.fori_loop(0, K, body, x0)
    return run


def main():
    global RTT
    O = int(sys.argv[1]) if len(sys.argv) > 1 else 226_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 257
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    print(f"O={O} N={N} K={K}")

    rng = np.random.default_rng(0)
    idx_np = np.sort(rng.integers(0, N, O)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    perm = jnp.asarray(rng.permutation(O).astype(np.int32))

    x = jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(O, 2)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    trivial = jax.jit(lambda x: x + 1.0)
    xs = jnp.zeros((8, 128))
    float(trivial(xs)[0, 0])
    t0 = time.monotonic()
    float(trivial(xs)[0, 0])
    RTT = time.monotonic() - t0
    print(f"RTT {RTT*1000:.1f} ms")

    # ---- gathers of varying width -------------------------------------
    timed("row gather [O,9] sorted", *chain2(lambda c: (x + c[0, 0])[idx], K), K, x)
    timed("row gather [O,2] perm (permutation)", *chain2(lambda c: (c + 0.0)[perm], K), K, v2)
    timed("1-D gather [O]<-[N]", *chain2(lambda c: (x1 + c[0])[idx], K), K, v1)
    idx9 = (idx[:, None] * 9 + jnp.arange(9)[None, :]).reshape(-1)
    xf = x.reshape(-1)
    timed("1-D gather [O*9]<-[N*9] flat", *chain2(lambda c: (xf + c[0])[idx9], K), K, v1)

    # ---- 1-D scatter ----------------------------------------------------
    timed("segment_sum 1-D [O]->[N]", *chain2(lambda c: jax.ops.segment_sum(
              v1 + c[0], idx, num_segments=N,
              indices_are_sorted=True) , K), K, x1)

    # ---- camera-CSR broadcast/reduce ------------------------------------
    # cameras bucketized to fixed k rows: [N, k] obs per camera
    k = max(8, O // N)
    Jpc = jnp.asarray(rng.normal(size=(N, k, 2, 9)).astype(np.float32))
    Jpc_sm = jnp.asarray(rng.normal(size=(k, 2, 9, N)).astype(np.float32))
    wc = jnp.asarray(rng.normal(size=(N, k, 2)).astype(np.float32))
    wc_sm = jnp.asarray(rng.normal(size=(k, 2, N)).astype(np.float32))

    def csr_w(c):
        # w = Jp . x[cam]  with camera implicit: broadcast x
        return jnp.einsum("nkrj,nj->nkr", Jpc + c[0, 0, 0], x)

    timed(f"CSR broadcast w [N,k,2,9] k={k}", *chain2(csr_w, K), K, wc)

    def csr_y(c):
        # y = sum_k Jp^T wp  : clean reduce over k
        return jnp.einsum("nkrj,nkr->nj", Jpc, c)

    timed("CSR reduce y [N,k,2,9]->[N,9]", *chain2(csr_y, K), K, wc)

    def csr_w_sm(c):
        # slot-major CSR: [k,2,9,N] x [N,9]: broadcast x.T [9,N]
        return jnp.einsum("krjn,jn->krn", Jpc_sm + c[0, 0, 0], x.T)

    timed("CSR slot-major w [k,2,9,N]", *chain2(csr_w_sm, K), K, wc_sm)

    def csr_y_sm(c):
        return jnp.einsum("krjn,krn->jn", Jpc_sm, c)

    timed("CSR slot-major y [k,2,9,N]->[9,N]", *chain2(csr_y_sm, K),
          K, wc_sm)

    # ---- slot-major landmark einsums (re-measure, high K) ---------------
    n = 4
    L = O // n
    JpT = jnp.asarray(rng.normal(size=(n, 2, 9, L)).astype(np.float32))
    Q1hT = jnp.asarray(rng.normal(size=(n, 2, 3, L)).astype(np.float32))
    wT = jnp.asarray(rng.normal(size=(n, 2, L)).astype(np.float32))

    def lm_sm(c):
        w = c
        t3 = jnp.einsum("nrcl,nrl->cl", Q1hT, w)
        wp = w - jnp.einsum("nrcl,cl->nrl", Q1hT, t3)
        y = jnp.einsum("nrjl,nrl->njl", JpT, wp)
        w2 = jnp.einsum("nrjl,njl->nrl", JpT, y)
        return w2

    timed("lm slot-major proj+einsums [n,2,9,L]", *chain2(lm_sm, K), K, wT)

    Jp4 = jnp.asarray(rng.normal(size=(L, n, 2, 9)).astype(np.float32))
    Q1h4 = jnp.asarray(rng.normal(size=(L, n, 2, 3)).astype(np.float32))
    w4 = jnp.asarray(rng.normal(size=(L, n, 2)).astype(np.float32))

    def lm_e4(c):
        w = c
        t3 = jnp.einsum("lnrc,lnr->lc", Q1h4, w)
        wp = w - jnp.einsum("lnrc,lc->lnr", Q1h4, t3)
        y = jnp.einsum("lnrj,lnr->lnj", Jp4, wp)
        w2 = jnp.einsum("lnrj,lnj->lnr", Jp4, y)
        return w2

    timed("lm einsum4d proj+einsums [L,n,2,9]", *chain2(lm_e4, K), K, w4)

    # BW floor: read O*24 floats
    flat = jnp.asarray(rng.normal(size=(O * 24,)).astype(np.float32))
    timed("BW floor: reduce O*24 f32",
          *chain2(lambda c: jnp.sum(flat + c[0]) * jnp.ones((8,)), K),
          K, jnp.ones((8,)))


if __name__ == "__main__":
    main()
