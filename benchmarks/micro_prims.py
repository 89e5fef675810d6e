"""Primitive-level TPU micro-benchmarks: gather/scatter/layout variants
for the CG matvec redesign. K-chained inside one dispatch; subtracts
the tunnel RTT.

    python benchmarks/micro_prims.py [O] [N] [K]
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


def timed(name, fn, *args, K=16):
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.monotonic() - t0)
    t = sorted(ts)[1]
    print(f"{name:40s} {(t - RTT) / K * 1000:9.3f} ms/op")


def main():
    global RTT
    O = int(sys.argv[1]) if len(sys.argv) > 1 else 226_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 257
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    print(f"O={O} N={N} K={K}")

    rng = np.random.default_rng(0)
    idx_np = np.sort(rng.integers(0, N, O)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    idx_unsorted = jnp.asarray(rng.permutation(idx_np))
    # start/end offsets per camera for the cumsum trick
    starts = jnp.asarray(np.searchsorted(idx_np, np.arange(N)).astype(np.int32))
    ends = jnp.asarray(np.searchsorted(idx_np, np.arange(N) + 1).astype(np.int32))

    x = jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(O, 9)).astype(np.float32))
    vT = jnp.asarray(np.ascontiguousarray(v.T))

    trivial = jax.jit(lambda x: x + 1.0)
    xs = jnp.zeros((8, 128))
    float(trivial(xs)[0, 0])
    t0 = time.monotonic()
    float(trivial(xs)[0, 0])
    RTT = time.monotonic() - t0
    print(f"RTT {RTT*1000:.1f} ms")

    def chain(f, x0):
        @jax.jit
        def run(x0):
            def body(i, c):
                y = f(c)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, K, body, x0)
        return run

    # ---- gathers: [N,9] -> per-obs ----------------------------------
    timed("row gather x[idx] -> [O,9]",
          chain(lambda c: (x + c[0, 0])[idx], v), v, K=K)
    timed("lane gather x.T[:,idx] -> [9,O]",
          chain(lambda c: (x.T + c[0, 0])[:, idx], vT), vT, K=K)
    timed("row gather unsorted",
          chain(lambda c: (x + c[0, 0])[idx_unsorted], v), v, K=K)

    # ---- scatters: per-obs -> [N,9] ----------------------------------
    timed("segment_sum rows [O,9]->[N,9]",
          chain(lambda c: jax.ops.segment_sum(v + c[0, 0], idx,
                                              num_segments=N), x), x, K=K)
    timed("segment_sum rows sorted-hint",
          chain(lambda c: jax.ops.segment_sum(
              v + c[0, 0], idx, num_segments=N,
              indices_are_sorted=True), x), x, K=K)
    timed("segment_sum rows unsorted ids",
          chain(lambda c: jax.ops.segment_sum(v + c[0, 0], idx_unsorted,
                                              num_segments=N), x), x, K=K)

    def cumsum_scatter(c):
        s = jnp.cumsum(v + c[0, 0], axis=0)
        z = jnp.zeros((1, 9), s.dtype)
        s = jnp.concatenate([z, s], axis=0)
        return s[ends] - s[starts]

    timed("cumsum-diff rows (sorted ids)", chain(cumsum_scatter, x), x, K=K)

    def cumsum_scatter_T(c):
        s = jnp.cumsum(vT + c[0, 0], axis=1)
        z = jnp.zeros((9, 1), s.dtype)
        s = jnp.concatenate([z, s], axis=1)
        return (s[:, ends] - s[:, starts]).T

    timed("cumsum-diff lanes [9,O] (sorted)", chain(cumsum_scatter_T, x),
          x, K=K)

    def onehot_matmul(c):
        vv = (v + c[0, 0]).astype(jnp.bfloat16)
        CH = 32768
        nch = (O + CH - 1) // CH
        Opad = nch * CH
        vp = jnp.pad(vv, ((0, Opad - O), (0, 0)))
        ip = jnp.pad(idx, (0, Opad - O), constant_values=N)
        def body(carry, args):
            vc, ic = args
            oh = (ic[:, None] == jnp.arange(N)[None, :]).astype(jnp.bfloat16)
            return carry + jnp.dot(oh.T, vc,
                                   preferred_element_type=jnp.float32), 0
        y, _ = jax.lax.scan(
            body, jnp.zeros((N, 9), jnp.float32),
            (vp.reshape(nch, CH, 9), ip.reshape(nch, CH)))
        return y

    timed("one-hot bf16 matmul scatter", chain(onehot_matmul, x), x, K=K)

    # ---- einsum layout variants: w = Jp . xg --------------------------
    L, n = O // 4, 4
    Jp4 = jnp.asarray(rng.normal(size=(L, n, 2, 9)).astype(np.float32))
    JpT = jnp.asarray(rng.normal(size=(n, 18, L)).astype(np.float32))
    xg4 = jnp.asarray(rng.normal(size=(L, n, 9)).astype(np.float32))
    xgT = jnp.asarray(rng.normal(size=(n, 9, L)).astype(np.float32))

    def ein4(c):
        w = jnp.einsum("lnrj,lnj->lnr", Jp4 + c[0, 0, 0], xg4)
        y = jnp.einsum("lnrj,lnr->lnj", Jp4, w)
        return y

    timed("einsum [L,n,2,9] w+y", chain(ein4, xg4), xg4, K=K)

    def einT(c):
        outs = []
        for i in range(n):
            Jpi = (JpT[i] + c[0, 0, 0]).reshape(2, 9, L)
            w = jnp.einsum("rjl,jl->rl", Jpi, xgT[i])
            y = jnp.einsum("rjl,rl->jl", Jpi, w)
            outs.append(y)
        return jnp.stack(outs)

    timed("einsum [n,18,L] slot-major w+y", chain(einT, xgT), xgT, K=K)

    # pure read-bandwidth floor on the same bytes
    flat = jnp.asarray(rng.normal(size=(O * 18,)).astype(np.float32))

    timed("reduce-read O*18 floats (BW floor)",
          chain(lambda c: jnp.sum(flat + c[0]) * jnp.ones((8,)), jnp.ones((8,))),
          jnp.ones((8,)), K=K)


if __name__ == "__main__":
    main()
