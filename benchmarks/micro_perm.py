"""Micro-benchmark: cost of O-sized permutes/gathers on TPU, by row
width and formulation. Informs the camera-major layout design.

    python -u benchmarks/micro_perm.py [O]
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
    from rootba_tpu.utils.jax_setup import sync
    t0 = time.monotonic()
    sync(fn(*args))
    return time.monotonic() - t0


def timed(name, make, K, *args):
    fn_k, fn_4k = make(K), make(4 * K)
    _run_once(fn_k, *args)
    _run_once(fn_4k, *args)
    tk = sorted(_run_once(fn_k, *args) for _ in range(3))[1]
    t4k = sorted(_run_once(fn_4k, *args) for _ in range(3))[1]
    print(f"{name:44s} {(t4k - tk) / (3 * K) * 1000:9.3f} ms/op",
          flush=True)


def chain(f):
    def make(KK):
        @jax.jit
        def run(x0, *rest):
            def body(i, c):
                y = f(c, *rest)
                s = jnp.zeros((), jnp.float32)
                for leaf in jax.tree_util.tree_leaves(y):
                    s = s + leaf.ravel()[0].astype(jnp.float32) * 1e-30
                return c * (1.0 + s) + s
            return jax.lax.fori_loop(0, KK, body, x0)
        return run
    return make


def main():
    O = int(sys.argv[1]) if len(sys.argv) > 1 else 228_000
    K = 16
    rng = np.random.default_rng(0)
    S = O + 6000
    perm = jnp.asarray(rng.permutation(S)[:O].astype(np.int32))
    z = jnp.zeros((), jnp.float32)

    for F in (2, 3, 8, 9, 18):
        src = jnp.asarray(rng.normal(size=(S, F)).astype(np.float32))

        def g_concat(eps, src=src, F=F):
            ext = jnp.concatenate(
                [src + eps, jnp.zeros((1, F), jnp.float32)], axis=0)
            return ext[perm]

        timed(f"row gather [O,{F}] + concat-ext", chain(g_concat), K, z)

        def g_take(eps, src=src):
            return jnp.take(src + eps, perm, axis=0, mode="fill",
                            fill_value=0.0)

        timed(f"row gather [O,{F}] take-fill", chain(g_take), K, z)

    # planar: F separate 1-D gathers
    for F in (2, 3):
        src = jnp.asarray(rng.normal(size=(F, S)).astype(np.float32))

        def g_planar(eps, src=src, F=F):
            s = src + eps
            return jnp.stack([jnp.take(s[i], perm, mode="fill",
                                       fill_value=0.0)
                              for i in range(F)])

        timed(f"planar {F} x 1-D [O] gathers", chain(g_planar), K, z)

    # transpose costs
    src = jnp.asarray(rng.normal(size=(O, 2)).astype(np.float32))

    def tr(eps):
        return (src + eps).reshape(O // 4, 8).T

    timed("transpose [O,2]->[8, O/4]", chain(tr), K, z)

    srcp = jnp.asarray(rng.normal(size=(2, O)).astype(np.float32))

    def tr2(eps):
        return (srcp + eps).T

    timed("transpose [2,O]->[O,2]", chain(tr2), K, z)

    # einsum [S,2,9] x [S,9] -> [S,2]
    Jp = jnp.asarray(rng.normal(size=(S, 2, 9)).astype(np.float32))
    xg = jnp.asarray(rng.normal(size=(S, 9)).astype(np.float32))

    def es(eps):
        return jnp.einsum("srj,sj->sr", Jp, xg + eps)

    timed("einsum [S,2,9]x[S,9]->[S,2]", chain(es), K, z)

    def es2(eps):
        w = jnp.einsum("srj,sj->sr", Jp, xg + eps)
        return jnp.einsum("srj,sr->sj", Jp, w)

    timed("einsum down+up (2 Jp passes)", chain(es2), K, z)

    # planar einsum variant: Jp [18, S]
    Jp_pl = jnp.asarray(rng.normal(size=(18, S)).astype(np.float32))
    xg_pl = jnp.asarray(rng.normal(size=(9, S)).astype(np.float32))

    def es_pl(eps):
        s = xg_pl + eps
        w0 = sum(Jp_pl[j] * s[j] for j in range(9))
        w1 = sum(Jp_pl[9 + j] * s[j] for j in range(9))
        return w0, w1

    timed("planar w (18 row-mults)", chain(es_pl), K, z)

    # cm reduce [S,9] -> [R,9]
    width = 64
    R = S // width
    vals = jnp.asarray(rng.normal(size=(S, 9)).astype(np.float32))

    def red(eps):
        return jnp.sum((vals + eps).reshape(R, width, 9), axis=1)

    timed("reshape-reduce [S,9]->[R,9]", chain(red), K, z)




def main2():
    """Fused-consumer gather costs with REAL BAL permutation indices.

    python -u benchmarks/micro_perm.py real [problem]
    """
    name = sys.argv[2] if len(sys.argv) > 2 else "trafalgar"
    K = 16
    from benchmarks.scale_bench import SIZES
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal

    nc, nl, nobs = SIZES[name]
    p = generate_synthetic_bal(num_cams=nc, num_lms=nl,
                               mean_obs_per_lm=nobs / nl, seed=17)
    p.normalize(100.0)
    p.filter_obs(0.1)
    bp = bucketize(p)
    csr = bp.cam_csr
    O = int(csr.total_slots)
    S = int(csr.idx.size)
    lm2cs = jnp.asarray(csr.lm2cs)
    cs2lm = jnp.asarray(csr.idx.reshape(-1))
    rng = np.random.default_rng(0)
    z = jnp.zeros((), jnp.float32)
    print(f"{name}: O={O} S={S}", flush=True)

    w_cs = jnp.asarray(rng.normal(size=(S, 2)).astype(np.float32))
    w_lm = jnp.asarray(rng.normal(size=(O, 2)).astype(np.float32))
    q1h = jnp.asarray(rng.normal(size=(O, 2, 3)).astype(np.float32))

    def g_mat(eps):
        return jnp.take(w_cs + eps, lm2cs, axis=0, mode="fill",
                        fill_value=0.0)

    timed("take [O,2] real-idx materialize", chain(g_mat), K, z)

    def g_fused(eps):
        wl = jnp.take(w_cs + eps, lm2cs, axis=0, mode="fill",
                      fill_value=0.0)
        return jnp.einsum("orc,or->oc", q1h, wl)  # [O,3]

    timed("take [O,2] real-idx + einsum consumer", chain(g_fused), K, z)

    def g_up(eps):
        wcs = jnp.take(w_lm + eps, cs2lm, axis=0, mode="fill",
                       fill_value=0.0)
        return jnp.sum(wcs.reshape(S // 64, 64, 2), axis=1)

    timed("take [S,2] real-idx + reduce consumer", chain(g_up), K, z)

    # random-index baseline, same shapes
    perm = jnp.asarray(rng.permutation(S)[:O].astype(np.int32))

    def g_rand(eps):
        return jnp.take(w_cs + eps, perm, axis=0, mode="fill",
                        fill_value=0.0)

    timed("take [O,2] random-idx materialize", chain(g_rand), K, z)

    # wide-row variant: gather 2 rows per index from a pre-paired table
    w_cs_pairs = w_cs.reshape(S // 2, 4)
    idx_half = lm2cs[::2] // 2  # only valid if pairs aligned; timing only

    def g_wide(eps):
        return jnp.take(w_cs_pairs + eps, idx_half, axis=0, mode="fill",
                        fill_value=0.0)

    timed("take [O/2,4] half-rows (timing only)", chain(g_wide), K, z)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "real":
        main2()
    else:
        main()
