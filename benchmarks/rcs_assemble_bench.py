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
    mode = sys.argv[3] if len(sys.argv) > 3 else "strips"

    from benchmarks.scale_bench import SIZES
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
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
    opts = SolverOptions(use_double=False, verbosity_level=0,
                         pair_gather=mode)
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lin = create_linearizer(bp, opts, "float32")
    state = initial_state(bp, "float32")
    N = lin.num_cameras
    buckets, csr, cam_flat, pairs = lin.consts[:4]
    cstrips = lin.consts[4] if len(lin.consts) > 4 else None
    assert pairs is not None, "explicit mode not active"
    lam = jnp.asarray(1e-4, jnp.float32)
    z = jnp.zeros((), jnp.float32)
    print(f"{name}: N={N} P={pairs.num_pairs} "
          f"kind={type(pairs).__name__}", flush=True)
    if hasattr(pairs, "lm_idx"):
        gsl = sum(int(x.shape[0]) for x in pairs.lm_idx)
        lsl = int(pairs.wi_idx.size)
        print(f"   strips groups={len(pairs.lm_idx)} slots={gsl} "
              f"leftover slots={lsl}", flush=True)

    lins, pose_scale, _ = jax.jit(lin.stage1_pure)(
        lin.consts, state.cams, state.lm_ps)
    stage2 = sqrt_flat.flat_stage2(lins, buckets, cam_flat, lam, N,
                                   csr=csr, with_precond=False,
                                   cam_strips=cstrips)

    def st2_min(eps):
        return sqrt_flat.flat_stage2(lins, buckets, cam_flat, lam + eps,
                                     N, csr=csr, with_precond=False,
                                     cam_strips=cstrips)

    timed("stage2 no-precond", chain(st2_min), K, z)

    def asm(eps):
        s2 = stage2._replace(lam=stage2.lam + eps)
        return sqrt_flat.flat_assemble_rcs(lins, s2, cam_flat, pairs, N,
                                           csr=csr, buckets=buckets,
                                           cam_strips=cstrips)

    timed("flat_assemble_rcs (full)", chain(asm), K, z)

    # pieces
    from rootba_tpu.solver.linearization import (
        PairStripsIndex,
        csr_pair_outer,
        csr_pair_outer_strips,
    )
    is_strips = isinstance(pairs, PairStripsIndex)

    def wstrip(eps):
        return jnp.sum(
            (stage2.Q1h + eps)[:, :, :, None] * lins.Jp[:, :, None, :],
            axis=1)

    timed("W strip [O,3,9]", chain(wstrip), K, z)

    W = jax.jit(wstrip)(z)

    def pouter(eps):
        Wp = W + eps
        if is_strips:
            return csr_pair_outer_strips(Wp, Wp, buckets, pairs)
        return csr_pair_outer(Wp, Wp, pairs)

    timed("csr_pair_outer", chain(pouter), K, z)

    def dstrip(eps):
        Jp = lins.Jp + eps
        if cstrips is not None:
            from rootba_tpu.solver.linearization import cam_gram_strips
            return cam_gram_strips(
                [(Jp, Jp, 1.0), (W, W, -1.0)], buckets, cstrips)
        D = jnp.sum(Jp[:, :, :, None] * Jp[:, :, None, :], axis=1)
        dcon = D - jnp.sum(W[:, :, :, None] * W[:, :, None, :], axis=1)
        from rootba_tpu.solver.linearization import csr_cam_reduce
        return csr_cam_reduce([dcon.reshape(-1, 81)], csr, N)

    timed("diag contrib + cam reduce", chain(dstrip), K, z)


if __name__ == "__main__":
    main()
