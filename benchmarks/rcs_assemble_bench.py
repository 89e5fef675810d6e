"""Time the explicit-RCS assembly pieces of the flat sqrt solver.

    python -u benchmarks/rcs_assemble_bench.py [problem] [K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.flat_times import chain, timed


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "trafalgar"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from benchmarks.scale_bench import SIZES
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver import sqrt_flat
    from rootba_tpu.solver.lm import create_linearizer, initial_state
    from rootba_tpu.solver.linearization import csr_pair_reduce
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    nc, nl, nobs = SIZES[name]
    p = generate_synthetic_bal(num_cams=nc, num_lms=nl,
                               mean_obs_per_lm=nobs / nl, seed=17)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    opts = SolverOptions(use_double=False, verbosity_level=0)
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lin = create_linearizer(bp, opts, "float32")
    state = initial_state(bp, "float32")
    N = lin.num_cameras
    buckets, csr, cam_flat, pairs = lin.consts
    assert pairs is not None, "explicit mode not active"
    lam = jnp.asarray(1e-4, jnp.float32)
    z = jnp.zeros((), jnp.float32)
    print(f"{name}: N={N} P={pairs.num_pairs} R={pairs.idx.shape[0]} "
          f"slots={pairs.idx.shape[0] * pairs.idx.shape[1]}", flush=True)

    lins, pose_scale, _ = jax.jit(lin.stage1_pure)(
        lin.consts, state.cams, state.lm_ps)
    stage2 = sqrt_flat.flat_stage2(lins, buckets, cam_flat, lam, N,
                                   csr=csr, with_precond=False)

    def st2_min(eps):
        return sqrt_flat.flat_stage2(lins, buckets, cam_flat, lam + eps,
                                     N, csr=csr, with_precond=False)

    timed("stage2 no-precond", chain(st2_min), K, z)

    def asm(eps):
        s2 = stage2._replace(lam=stage2.lam + eps)
        return sqrt_flat.flat_assemble_rcs(lins, s2, buckets, pairs, N)

    timed("flat_assemble_rcs (full)", chain(asm), K, z)

    # pieces: pair products only
    offs = sqrt_flat._bucket_offsets(buckets)

    def prods(eps):
        parts = []
        for bucket, a, b_ in zip(buckets, offs[:-1], offs[1:]):
            L, n = bucket.cam_idx.shape
            Jp = (lins.Jp[a:b_] + eps).reshape(L, n, 2, 9)
            Q1b = stage2.Q1h[a:b_].reshape(L, n, 2, 3)
            W = jnp.einsum("lnrc,lnrj->lncj", Q1b, Jp)
            M = -jnp.einsum("lnci,lmcj->lnmij", W, W)
            D = jnp.einsum("lnri,lnrj->lnij", Jp, Jp)
            eye_n = jnp.eye(n, dtype=jnp.float32)
            M = M + eye_n[None, :, :, None, None] * D[:, :, None]
            parts.append(M.reshape(L * n * n, 81))
        return jnp.concatenate(parts, axis=0)

    timed("pair products + concat", chain(prods), K, z)

    flat = jax.jit(prods)(z)

    def chain_arg(f, big):
        def make(KK):
            @jax.jit
            def run(e0, big):
                def body(i, e):
                    y = f(e, big)
                    s = jnp.zeros((), jnp.float32)
                    for leaf in jax.tree_util.tree_leaves(y):
                        s = s + leaf.ravel()[0].astype(jnp.float32) * 1e-30
                    return e * (1.0 + s) + s
                return jax.lax.fori_loop(0, KK, body, e0)
            return lambda e0: run(e0, big)
        return make

    def red(eps, big):
        return csr_pair_reduce(big + eps, pairs)

    timed("csr_pair_reduce alone", chain_arg(red, flat), K, z)

    Hblk = jax.jit(red)(z, flat)

    def dens(eps, big):
        Hp = jnp.concatenate(
            [big + eps, jnp.zeros((1, 81), jnp.float32)], axis=0)
        Hd = Hp[pairs.dense_idx].reshape(N, N, 9, 9)
        Hd = Hd.transpose(0, 2, 1, 3).reshape(N * 9, N * 9)
        return Hd + lam * jnp.eye(N * 9, dtype=jnp.float32)

    timed("densify + lam eye", chain_arg(dens, Hblk), K, z)

    def red_f32x(eps, big):
        """gather only (no second level)"""
        F = big.shape[1]
        b2 = jnp.concatenate(
            [big + eps, jnp.zeros((1, F), big.dtype)], axis=0)
        return jnp.sum(b2[pairs.idx], axis=1)

    timed("csr level-1 gather+reduce", chain_arg(red_f32x, flat), K, z)


if __name__ == "__main__":
    main()
