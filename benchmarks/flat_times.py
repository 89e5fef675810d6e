"""Slope-based timing of the flat-layout solver pieces.

    python -u benchmarks/flat_times.py [problem] [K]

Times each device function by chaining K and 4K data-dependent
applications inside one jitted fori_loop and reporting the slope, so
dispatch latency and the tunnel round trip cancel.
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


def timed(name, make, K, *args):
    fn_k, fn_4k = make(K), make(4 * K)
    _run_once(fn_k, *args)
    _run_once(fn_4k, *args)
    tk = sorted(_run_once(fn_k, *args) for _ in range(3))[1]
    t4k = sorted(_run_once(fn_4k, *args) for _ in range(3))[1]
    print(f"{name:34s} {(t4k - tk) / (3 * K) * 1000:9.3f} ms/op",
          flush=True)


def chain(f):
    """f: scalar-perturbation -> pytree. Chain via tiny scalar feedback."""
    def make(KK):
        @jax.jit
        def run(e0):
            def body(i, e):
                y = f(e)
                s = jnp.zeros((), jnp.float32)
                for leaf in jax.tree_util.tree_leaves(y):
                    if hasattr(leaf, "ravel") and leaf.size:
                        s = s + leaf.ravel()[0].astype(jnp.float32) * 1e-30
                return e * (1.0 + s) + s
            return jax.lax.fori_loop(0, KK, body, e0)
        return run
    return make


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "trafalgar"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

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
    opts = SolverOptions(use_double=False, verbosity_level=0)
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lin = create_linearizer(bp, opts, "float32")
    state = initial_state(bp, "float32")
    if hasattr(lin, "prepare_state"):
        state = lin.prepare_state(state)
    N = lin.num_cameras
    consts = lin.consts
    buckets, csr, cam_flat = consts[:3]
    lam = jnp.asarray(1e-4, jnp.float32)
    z = jnp.zeros((), jnp.float32)
    O = int(cam_flat.shape[0])
    print(f"{name}: O={O} N={N} buckets="
          f"{[(b.cam_idx.shape) for b in buckets]}", flush=True)

    def s1(eps):
        cams = state.cams._replace(t=state.cams.t + eps)
        return lin.stage1_pure(consts, cams, state.lm_ps)

    timed("stage1", chain(s1), K, z)

    def er(eps):
        cams = state.cams._replace(t=state.cams.t + eps)
        return lin.error_pure(consts, cams, state.lm_ps)

    timed("error", chain(er), K, z)

    lins, pose_scale, _ = jax.jit(lin.stage1_pure)(
        consts, state.cams, state.lm_ps)

    out = jax.jit(lin.solve_pure)(consts, lins, lam)
    inc, stage2, n_cg, _ = out
    print("   (cg iters in this solve:", int(n_cg), ")", flush=True)

    def sv(eps):
        return lin.solve_pure(consts, lins, lam + eps)

    timed("solve(stage2+CG)", chain(sv), max(2, K // 4), z)

    def st2(eps):
        return sqrt_flat.flat_stage2(lins, buckets, cam_flat, lam + eps, N)

    timed("stage2 alone", chain(st2), K, z)

    def mv(eps):
        return sqrt_flat.flat_matvec(lins, stage2, buckets, cam_flat, N,
                                     stage2.b + eps, csr=csr)

    timed("matvec (csr)", chain(mv), 4 * K, z)

    def mv2(eps):
        return sqrt_flat.flat_matvec(lins, stage2, buckets, cam_flat, N,
                                     stage2.b + eps, csr=None)

    timed("matvec (segsum)", chain(mv2), 4 * K, z)

    from rootba_tpu.solver.sqrt_qr import precond_apply

    def pa(eps):
        return precond_apply(stage2.precond_chol, stage2.b + eps)

    timed("precond apply", chain(pa), 4 * K, z)

    from rootba_tpu.solver.linearization import csr_cam_reduce

    yb = jnp.zeros((O, 9), jnp.float32)

    def cr(eps):
        return csr_cam_reduce([yb + eps], csr, N)

    timed("csr reduce [O,9] alone", chain(cr), 4 * K, z)

    def ap(eps):
        return lin.apply_pure(consts, state.cams, state.lm_ps, lins,
                              stage2, pose_scale, inc + eps)

    timed("apply", chain(ap), K, z)


if __name__ == "__main__":
    main()
