"""Micro-benchmark of sqrt-solver pieces at a chosen problem scale.

Times each op with K chained repetitions inside ONE dispatch (carrying
the output into the next input so XLA cannot CSE them), then divides by
K -- this removes the host<->device tunnel latency (~30 ms RTT on the
axon setup) from the measurement.

    python benchmarks/micro_stages.py [trafalgar|venice|...] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, K=16):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # force host sync via scalar pull (block_until_ready is unreliable
    # over the axon tunnel)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append((time.monotonic() - t0))
    t = sorted(ts)[1]
    print(f"{name:34s} {(t - RTT) / K * 1000:9.3f} ms/op   "
          f"(dispatch {t * 1000:.1f} ms, K={K})")


RTT = 0.0


def main():
    global RTT
    name = sys.argv[1] if len(sys.argv) > 1 else "trafalgar"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16

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
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    print("buckets:", [(b.cam_idx.shape) for b in bp.buckets])
    lin = create_linearizer(bp, opts, "float32")
    state = initial_state(bp, "float32")
    if hasattr(lin, "prepare_state"):
        state = lin.prepare_state(state)
    N = lin.num_cameras

    # measure RTT floor
    trivial = jax.jit(lambda x: x + 1.0)
    xs = jnp.zeros((8, 128))
    float(trivial(xs)[0, 0])
    t0 = time.monotonic()
    float(trivial(xs)[0, 0])
    RTT = time.monotonic() - t0
    print(f"tunnel RTT floor: {RTT * 1000:.1f} ms")

    lins, pose_scale, _ = lin._stage1_fn(lin.consts, state.cams,
                                         state.lm_ps)
    lam = jnp.asarray(1e-4, jnp.float32)

    # ---- chained stage1 ------------------------------------------------
    @jax.jit
    def rep_stage1(cams, lm_ps):
        def body(i, carry):
            cams, s = carry
            ls, psc, _ = lin.stage1_pure(lin.consts, cams, lm_ps)
            s = s + psc[0, 0]
            # fold a scalar back into cams so iterations are dependent
            cams2 = cams._replace(t=cams.t + 0.0 * s)
            return (cams2, s)
        return jax.lax.fori_loop(0, K, body, (cams, jnp.zeros((), jnp.float32)))[1]

    timed("stage1 (linearize+scale)", rep_stage1, state.cams, state.lm_ps, K=K)

    # ---- chained error -------------------------------------------------
    @jax.jit
    def rep_error(cams, lm_ps):
        def body(i, carry):
            cams, s = carry
            ri = lin.error_pure(lin.consts, cams, lm_ps)
            s = s + ri.all.error.astype(jnp.float32)
            cams2 = cams._replace(t=cams.t + 0.0 * s)
            return (cams2, s)
        return jax.lax.fori_loop(0, K, body, (cams, jnp.zeros((), jnp.float32)))[1]

    timed("error", rep_error, state.cams, state.lm_ps, K=K)

    if hasattr(lin, "_lins") or True:
        try:
            stage2 = sqrt_qr.sqrt_stage2(lins, lin.consts, lam, N)
        except Exception:
            stage2 = None

    if stage2 is not None:
        # ---- chained stage2 (QR + RHS + precond) -----------------------
        @jax.jit
        def rep_stage2(lam0):
            def body(i, lamc):
                s2 = sqrt_qr.sqrt_stage2(lins, lin.consts, lamc, N)
                return lamc + 0.0 * s2.b[0, 0] + 0.0 * i
            return jax.lax.fori_loop(0, K, body, lam0)

        timed("stage2 (aug-QR+RHS+precond)", rep_stage2, lam, K=K)

        # ---- chained matvec --------------------------------------------
        @jax.jit
        def rep_matvec(x0):
            def body(i, x):
                y = sqrt_qr.sqrt_matvec(lins, lin.consts, stage2, N, x)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, K, body, x0)

        x0 = jnp.ones((N, 9), jnp.float32)
        timed("CG matvec", rep_matvec, x0, K=K)

        # ---- matvec pieces ---------------------------------------------
        bkt = lin.consts[0] if isinstance(lin.consts, tuple) else None
        lin0 = lins[0]
        Q1h0 = stage2.Q1h[0]

        @jax.jit
        def rep_gather(x0):
            def body(i, x):
                acc = x
                for lb, bk in zip(lins, lin.consts):
                    xg = x[bk.cam_idx]  # [L,n,9]
                    acc = acc + 0.0 * jnp.sum(xg[..., 0])
                return acc
            return jax.lax.fori_loop(0, K, body, x0)

        timed("  gather x[cam_idx] (all buckets)", rep_gather, x0, K=K)

        @jax.jit
        def rep_scatter(x0):
            def body(i, x):
                y = 0.0 * x
                for lb, bk in zip(lins, lin.consts):
                    Ln = bk.cam_idx.shape[0] * bk.cam_idx.shape[1]
                    yb = jnp.broadcast_to(
                        x[0, 0], (Ln, 9)) + 0.0 * i
                    y = y + jax.ops.segment_sum(
                        yb, bk.cam_idx.reshape(-1), num_segments=N)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, K, body, x0)

        timed("  segment_sum only (all buckets)", rep_scatter, x0, K=K)

        @jax.jit
        def rep_einsum(x0):
            def body(i, x):
                s = jnp.zeros((), jnp.float32)
                for lb, Q1h in zip(lins, stage2.Q1h):
                    w = jnp.einsum("lnrj,lnj->lnr", lb.Jp,
                                   jnp.broadcast_to(x[:1, None, :],
                                                    lb.Jp.shape[:2] + (9,)))
                    w = sqrt_qr._project_out(Q1h, w)
                    yb = jnp.einsum("lnrj,lnr->lnj", lb.Jp, w)
                    s = s + jnp.sum(yb[..., 0])
                return x + 0.0 * s
            return jax.lax.fori_loop(0, K, body, x0)

        timed("  einsums+project (all buckets)", rep_einsum, x0, K=K)


if __name__ == "__main__":
    main()
