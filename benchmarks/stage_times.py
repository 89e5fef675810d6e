"""Slope-based timing of the real solver stage functions.

    python benchmarks/stage_times.py [problem] [K] [layout]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _run_once(fn, *args):
    from rootba_tpu.utils.jax_setup import sync
    t0 = time.monotonic()
    sync(fn(*args))
    return time.monotonic() - t0


def timed(name, fn_k, fn_4k, K, *args):
    _run_once(fn_k, *args)
    _run_once(fn_4k, *args)
    tk = sorted(_run_once(fn_k, *args) for _ in range(3))[1]
    t4k = sorted(_run_once(fn_4k, *args) for _ in range(3))[1]
    print(f"{name:34s} {(t4k - tk) / (3 * K) * 1000:9.3f} ms/op")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "trafalgar"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from benchmarks.scale_bench import SIZES
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver import sqrt_qr
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
    if len(sys.argv) > 3:
        opts.kernel_layout = sys.argv[3]
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lin = create_linearizer(bp, opts, "float32")
    state = initial_state(bp, "float32")
    if hasattr(lin, "prepare_state"):
        state = lin.prepare_state(state)
    N = lin.num_cameras
    consts = lin.consts
    lam = jnp.asarray(1e-4, jnp.float32)

    def chain2(f, shape_probe):
        def make(KK):
            @jax.jit
            def run(x0):
                def body(i, c):
                    y = f(c)
                    s = jnp.zeros((), jnp.float32)
                    for leaf in jax.tree_util.tree_leaves(y):
                        s = s + leaf.ravel()[0].astype(jnp.float32) * 1e-30
                    return c * (1.0 + s) + s
                return jax.lax.fori_loop(0, KK, body, x0)
            return run
        return make(K), make(4 * K)

    # stage1 (depends on a scalar-perturbed cams)
    def s1(eps):
        cams = state.cams._replace(t=state.cams.t + eps)
        return lin.stage1_pure(consts, cams, state.lm_ps)

    z = jnp.zeros((), jnp.float32)
    timed("stage1", *chain2(s1, None), K, z)

    def er(eps):
        cams = state.cams._replace(t=state.cams.t + eps)
        return lin.error_pure(consts, cams, state.lm_ps)

    timed("error", *chain2(er, None), K, z)

    lins, pose_scale, _ = jax.jit(lin.stage1_pure)(consts, state.cams,
                                                   state.lm_ps)

    def sv(eps):
        return lin.solve_pure(consts, lins, lam + eps)

    out = jax.jit(lin.solve_pure)(consts, lins, lam)
    print("   (cg iters in this solve:", int(out[2]), ")")
    timed("solve(stage2+CG)", *chain2(sv, None), K, z)

    inc, stage2, _, _ = out

    def ap(eps):
        return lin.apply_pure(consts, state.cams, state.lm_ps, lins,
                              stage2, pose_scale, inc + eps)

    timed("apply", *chain2(ap, None), K, z)

    if hasattr(lin, "cam_csr"):
        csr = lin.cam_csr

        def mv(eps):
            return sqrt_qr.sqrt_matvec(lins, consts[0], stage2, N,
                                       stage2.b + eps, csr=csr)

        timed("matvec (as in solve)", *chain2(mv, None), K, z)

        def st2(eps):
            return sqrt_qr.sqrt_stage2(
                lins, consts[0], lam + eps, N, csr=csr)

        timed("stage2 only", *chain2(st2, None), K, z)


if __name__ == "__main__":
    main()
