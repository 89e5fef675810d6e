"""Breakdown of flat_stage2 internals + explicit-RCS costs on TPU.

    python -u benchmarks/stage2_break.py [problem] [K]
"""

from __future__ import annotations

import os
import sys
import time

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
    from rootba_tpu.ops.batched_qr import householder_qr3
    from rootba_tpu.solver import sqrt_flat
    from rootba_tpu.solver.lm import create_linearizer, initial_state
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
    consts = lin.consts
    buckets, csr, cam_flat = consts[:3]
    lam = jnp.asarray(1e-4, jnp.float32)
    z = jnp.zeros((), jnp.float32)
    O = int(cam_flat.shape[0])
    print(f"{name}: O={O} N={N}", flush=True)

    lins, pose_scale, _ = jax.jit(lin.stage1_pure)(
        consts, state.cams, state.lm_ps)
    offs = sqrt_flat._bucket_offsets(buckets)
    P9 = 9

    # 1. per-bucket augmented QR
    def qr_only(eps):
        outs = []
        for bucket, a, b_ in zip(buckets, offs[:-1], offs[1:]):
            L, n = bucket.cam_idx.shape
            Jl2 = (lins.Jl[a:b_] + eps).reshape(L, 2 * n, 3)
            damp = jnp.sqrt(lam) * jnp.broadcast_to(
                jnp.eye(3, dtype=jnp.float32), (L, 3, 3))
            aug = jnp.concatenate([Jl2, damp], axis=1)
            R, Q1 = householder_qr3(aug)
            outs.append(R)
            outs.append(Q1)
        return outs

    timed("qr (all buckets)", chain(qr_only), K, z)

    stage2 = sqrt_flat.flat_stage2(lins, buckets, cam_flat, lam, N)
    Q1h = stage2.Q1h

    # 2. RHS only
    def rhs_only(eps):
        pq = jnp.einsum("orc,or->oc", Q1h, lins.r + eps)
        t3 = sqrt_flat._per_landmark_broadcast(
            sqrt_flat._per_landmark_sum(pq, buckets, offs), buckets)
        wp = lins.r - jnp.einsum("orc,oc->or", Q1h, t3)
        yb = jnp.einsum("orj,or->oj", lins.Jp, wp)
        return jax.ops.segment_sum(yb, cam_flat, num_segments=N)

    timed("rhs (einsums+segsum9)", chain(rhs_only), K, z)

    # 3. gram81 + precond segsum
    def gram_only(eps):
        M = lins.Jp + eps

        def gram81(M):
            A = jnp.repeat(M, P9, axis=2)
            B = jnp.tile(M, (1, 1, P9))
            return jnp.sum(A * B, axis=1)

        blk = gram81(M)
        A = jnp.repeat(Q1h, P9, axis=2)
        B = jnp.tile(M, (1, 1, 3))
        W27 = jnp.sum(A * B, axis=1)
        blk = blk - gram81(W27.reshape(O, 3, P9))
        return jax.ops.segment_sum(blk, cam_flat, num_segments=N)

    timed("precond gram81+segsum81", chain(gram_only), K, z)

    # 3b. gram81 compute only (no reduction)
    def gram_nored(eps):
        M = lins.Jp + eps

        def gram81(M):
            A = jnp.repeat(M, P9, axis=2)
            B = jnp.tile(M, (1, 1, P9))
            return jnp.sum(A * B, axis=1)

        blk = gram81(M)
        A = jnp.repeat(Q1h, P9, axis=2)
        B = jnp.tile(M, (1, 1, 3))
        W27 = jnp.sum(A * B, axis=1)
        return blk - gram81(W27.reshape(O, 3, P9))

    timed("precond gram81 (no reduce)", chain(gram_nored), K, z)

    # 4. cholesky
    blocks = jnp.eye(P9)[None] * 2.0 + jnp.zeros((N, P9, P9))

    def chol_only(eps):
        return jnp.linalg.cholesky(blocks + eps * jnp.eye(P9))

    timed("cholesky [N,9,9]", chain(chol_only), 4 * K, z)

    # 5. explicit RCS from QR factors: W27 per obs + pair products
    from rootba_tpu.solver.explicit_sc import build_pair_structure
    pairs = build_pair_structure(bp, N)
    print(f"   unique pairs P={pairs.num_pairs} "
          f"sum n^2={sum(int(pid.size) for pid in pairs.pair_ids)}",
          flush=True)

    def rcs_assemble(eps):
        # W_o = Q1h_o^T Jp_o  [O,3,9]; diag: Jp^T Jp
        H = jnp.zeros((pairs.num_pairs + 1, 81), jnp.float32)
        for bucket, pid, a, b_ in zip(buckets, pairs.pair_ids,
                                      offs[:-1], offs[1:]):
            L, n = bucket.cam_idx.shape
            Jp = (lins.Jp[a:b_] + eps).reshape(L, n, 2, 9)
            Q1b = Q1h[a:b_].reshape(L, n, 2, 3)
            D = jnp.einsum("lnri,lnrj->lnij", Jp, Jp)
            diag_pid_b = pid[:, jnp.arange(n), jnp.arange(n)]
            H = H + jax.ops.segment_sum(
                D.reshape(-1, 81), diag_pid_b.reshape(-1),
                num_segments=pairs.num_pairs + 1)
            W = jnp.einsum("lnrc,lnrj->lncj", Q1b, Jp)  # [L,n,3,9]
            M = jnp.einsum("lnci,lmcj->lnmij", W, W)
            H = H + jax.ops.segment_sum(
                (-M).reshape(-1, 81), pid.reshape(-1),
                num_segments=pairs.num_pairs + 1)
        return H

    timed("rcs assemble (segsum pairs)", chain(rcs_assemble), K, z)

    # block-sparse matvec
    H = rcs_assemble(z)
    x = jnp.zeros((N * 9,), jnp.float32)

    def bmv(eps):
        xb = (x + eps).reshape(N, 9)
        xg = xb[pairs.pair_col]
        y = jnp.einsum("pij,pj->pi",
                       H[:pairs.num_pairs].reshape(-1, 9, 9), xg)
        return jax.ops.segment_sum(y, pairs.pair_row, num_segments=N)

    timed("block-sparse matvec", chain(bmv), 4 * K, z)


if __name__ == "__main__":
    main()
