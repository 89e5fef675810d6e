"""Flat-layout matvec variants vs the per-bucket baseline.

    python benchmarks/micro_matvec3.py [O] [N] [K]
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
    print(f"{name:44s} {(t4k - tk) / (3 * K) * 1000:9.4f} ms/op")


def chain(f, K):
    @jax.jit
    def run(x0):
        def body(i, c):
            y = f(c)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
        return jax.lax.fori_loop(0, K, body, x0)
    return run


def chain2(f, K):
    return chain(f, K), chain(f, 4 * K)


def build_csr(cam_flat, mask_flat, N, width=64):
    O = cam_flat.size
    pos = np.nonzero(mask_flat)[0].astype(np.int64)
    cams = cam_flat[pos]
    order = np.argsort(cams, kind="stable")
    pos = pos[order]
    counts = np.bincount(cams, minlength=N).astype(np.int64)
    rpc = -(-counts // width)
    R = max(int(rpc.sum()), 1)
    idx = np.full((R, width), O, np.int64)
    rs = np.zeros(N + 1, np.int64)
    rs[1:] = np.cumsum(rpc)
    within = (np.arange(pos.size, dtype=np.int64)
              - np.repeat(np.cumsum(counts) - counts, counts))
    row = np.repeat(rs[:-1], counts) + within // width
    col = within % width
    idx[row, col] = pos
    vmax = max(int(rpc.max(initial=1)), 1)
    idx2 = np.full((N, vmax), R, np.int64)
    rr = np.repeat(np.arange(N, dtype=np.int64), rpc)
    cc = (np.arange(rr.size, dtype=np.int64)
          - np.repeat(np.cumsum(rpc) - rpc, rpc))
    idx2[rr, cc] = np.arange(rr.size, dtype=np.int64)
    return jnp.asarray(idx.astype(np.int32)), jnp.asarray(idx2.astype(np.int32))


def main():
    O = int(sys.argv[1]) if len(sys.argv) > 1 else 226_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 257
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    # two buckets: n=3 and n=5
    rng = np.random.default_rng(0)
    L1 = (O // 2) // 3
    L2 = (O - L1 * 3) // 5
    specs = [(L1, 3), (L2, 5)]
    O = L1 * 3 + L2 * 5
    print(f"O={O} N={N} buckets={specs} K={K}")

    cam_parts = [np.sort(rng.integers(0, N, (L, n)), axis=1).astype(np.int32)
                 for L, n in specs]
    cam_flat = np.concatenate([c.reshape(-1) for c in cam_parts])
    mask = np.ones_like(cam_flat, bool)
    idx1, idx2 = build_csr(cam_flat, mask, N)
    cam_flat_j = jnp.asarray(cam_flat)

    Jp_b = [jnp.asarray(rng.normal(size=(L, n, 2, 9)).astype(np.float32))
            for L, n in specs]
    Q1h_b = [jnp.asarray(rng.normal(size=(L, n, 2, 3)).astype(np.float32))
             for L, n in specs]
    Jp_f = jnp.concatenate([a.reshape(-1, 2, 9) for a in Jp_b])
    Q1h_f = jnp.concatenate([a.reshape(-1, 2, 3) for a in Q1h_b])
    JpT = jnp.asarray(np.ascontiguousarray(
        np.asarray(Jp_f).transpose(1, 2, 0)))  # [2,9,O]
    Q1hT = jnp.asarray(np.ascontiguousarray(
        np.asarray(Q1h_f).transpose(1, 2, 0)))  # [2,3,O]
    x0 = jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32))
    offs = np.cumsum([0] + [L * n for L, n in specs])

    def csr_reduce(yb):
        ybp = jnp.concatenate([yb, jnp.zeros((1, 9), yb.dtype)], axis=0)
        r1 = jnp.sum(ybp[idx1], axis=1)
        r1 = jnp.concatenate([r1, jnp.zeros((1, 9), r1.dtype)], axis=0)
        return jnp.sum(r1[idx2], axis=1)

    # V0: per-bucket (baseline)
    def v0(x):
        ybs = []
        for (L, n), Jp, Q1h, cp in zip(specs, Jp_b, Q1h_b, cam_parts):
            xg = x[jnp.asarray(cp)]
            w = jnp.einsum("lnrj,lnj->lnr", Jp, xg)
            t3 = jnp.einsum("lnrc,lnr->lc", Q1h, w)
            wp = w - jnp.einsum("lnrc,lc->lnr", Q1h, t3)
            ybs.append(jnp.einsum("lnrj,lnr->lnj", Jp, wp).reshape(-1, 9))
        return csr_reduce(jnp.concatenate(ybs))

    timed("V0 per-bucket + csr", *chain2(v0, K), K, x0)

    # V1: flat [O,2,9]
    def v1(x):
        xg = x[cam_flat_j]  # [O,9]
        w = jnp.einsum("orj,oj->or", Jp_f, xg)  # [O,2]
        p = jnp.einsum("orc,or->oc", Q1h_f, w)  # [O,3]
        t3s = []
        for (L, n), (a, b) in zip(specs, zip(offs[:-1], offs[1:])):
            t3s.append(jnp.sum(p[a:b].reshape(L, n, 3), axis=1))
        t3b = jnp.concatenate([
            jnp.broadcast_to(t3[:, None, :], (L, n, 3)).reshape(-1, 3)
            for (L, n), t3 in zip(specs, t3s)])
        wp = w - jnp.einsum("orc,oc->or", Q1h_f, t3b)
        yb = jnp.einsum("orj,or->oj", Jp_f, wp)
        return csr_reduce(yb)

    timed("V1 flat [O,2,9] + csr", *chain2(v1, K), K, x0)

    # V2: transposed [2,9,O], row-gather xg
    def v2(x):
        xg = x[cam_flat_j]  # [O,9]
        w = jnp.einsum("rjo,oj->ro", JpT, xg)  # [2,O]
        p = jnp.einsum("rco,ro->co", Q1hT, w)  # [3,O]
        t3s = []
        for (L, n), (a, b) in zip(specs, zip(offs[:-1], offs[1:])):
            t3s.append(jnp.sum(p[:, a:b].reshape(3, L, n), axis=2))
        t3b = jnp.concatenate([
            jnp.broadcast_to(t3[:, :, None], (3, L, n)).reshape(3, -1)
            for (L, n), t3 in zip(specs, t3s)], axis=1)
        wp = w - jnp.einsum("rco,co->ro", Q1hT, t3b)
        yb = jnp.einsum("rjo,ro->oj", JpT, wp)  # [O,9]
        return csr_reduce(yb)

    timed("V2 transposed [2,9,O] + csr", *chain2(v2, K), K, x0)

    ref = np.asarray(v0(x0))
    for name, f in (("v1", v1), ("v2", v2)):
        err = np.abs(np.asarray(f(x0)) - ref).max() / np.abs(ref).max()
        print(f"rel err {name}: {err:.2e}")


if __name__ == "__main__":
    main()
