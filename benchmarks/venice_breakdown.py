"""Per-piece device-time breakdown of the venice SQUARE_ROOT attempt
(VERDICT r4: find where the ~1.5 s/LM-iter actually goes before
optimizing). Times each stage function and the assembly/CG pieces
separately.

    python -u benchmarks/venice_breakdown.py [problem] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "venice"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from benchmarks.suite import make_problem, protocol_overrides
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.config.options import SolverOptions, SolverType
    from rootba_tpu.solver.lm import create_linearizer, initial_state
    from rootba_tpu.utils.jax_setup import enable_compilation_cache, sync

    enable_compilation_cache()
    p = make_problem(name)
    opts = SolverOptions(
        use_double=False, verbosity_level=0,
        solver_type=SolverType.SQUARE_ROOT,
        **protocol_overrides("SQUARE_ROOT"))
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lin = create_linearizer(bp, opts, jnp.float32)
    state = initial_state(bp, jnp.float32)
    lam = jnp.asarray(1e-4, jnp.float32)

    def timeit(label, fn, *args, n=reps):
        """Median of n sync'd executions (whole-dispatch wall time;
        the pieces here are 10s-100s of ms, far above the ~25 ms sync
        cost)."""
        out = sync(fn(*args))
        ts = []
        for _ in range(n):
            t0 = time.monotonic()
            sync(fn(*args))
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label:44s} {med*1e3:9.1f} ms   (min {min(ts)*1e3:.1f})",
              flush=True)
        return out, med

    consts = lin.consts
    buckets, csr, cam_flat, pairs, cstrips, bsr = consts
    N = lin.num_cameras
    jfn = jax.jit

    (lins, ps, fails), t_s1 = timeit(
        "stage1 (linearize+scale)", lin._stage1_fn, consts, state.cams,
        state.lm_ps)

    aux, t_s2full = timeit("stage2_fn (QR+RHS+assembly+chol)",
                           lin._stage2_fn, consts, lins, lam)
    stage2 = aux[0]

    from rootba_tpu.solver import sqrt_flat as sf

    s2only = jfn(lambda l_, lam_: sf.flat_stage2(
        l_, buckets, cam_flat, lam_, N, with_precond=False,
        csr=csr, cam_strips=cstrips))
    stage2b, t_qr_rhs = timeit("  flat_stage2 (damped QR + RHS)",
                               s2only, lins, lam)

    if lin.bsr_rcs:
        asm = jfn(lambda l_, s_: sf.flat_assemble_rcs_bsr(
            l_, s_, cam_flat, pairs, N, csr=csr, buckets=buckets,
            cam_strips=cstrips))
        (blocks2, diag), t_asm = timeit("  flat_assemble_rcs_bsr",
                                        asm, lins, stage2b)

        wfac = jfn(lambda l_, s_: sf._rcs_factors(
            l_, s_, buckets, pairs, cstrips)[0])
        _, t_w = timeit("    W table build (_rcs_factors)", wfac,
                        lins, stage2b)

        from rootba_tpu.solver.linearization import bsr_matvec

        x = jnp.ones((N, 9), jnp.float32)

        def mv30(x_):
            def body(i, v):
                v = bsr_matvec(blocks2, diag, bsr, v)
                return v / jnp.linalg.norm(v.ravel())
            return jax.lax.fori_loop(0, 30, body, x_)

        _, t_mv30 = timeit("  bsr_matvec x30 (serial chain)",
                           jfn(mv30), x)
        print(f"{'  -> per CG matvec':44s} {t_mv30/30*1e3:9.2f} ms")

        from rootba_tpu.solver.sqrt_qr import precond_apply

        def pc30(x_):
            def body(i, v):
                v = precond_apply(stage2.precond_chol, v)
                return v / jnp.linalg.norm(v.ravel())
            return jax.lax.fori_loop(0, 30, body, x_)

        _, t_pc30 = timeit("  precond_apply x30", jfn(pc30), x)
        print(f"{'  -> per precond apply':44s} {t_pc30/30*1e3:9.2f} ms")

    out, t_lsolve = timeit("lsolve_fn (CG at lam=1e-4)",
                           lin._lsolve_fn, consts, lins, aux)
    print(f"{'  (CG iterations used)':44s} {int(out[2]):9d}")

    inc = jnp.zeros((N, 9), jnp.float32)
    _, t_apply = timeit(
        "apply_fn (back-substitute + update)", lin._apply_fn, consts,
        state.cams, state.lm_ps, lins, stage2, ps, inc)
    _, t_err = timeit("error_fn", lin._error_fn, consts, state.cams,
                      state.lm_ps)


if __name__ == "__main__":
    main()
