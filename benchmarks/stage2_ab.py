"""Time the real stage2_pure (QR + RHS + RCS assembly) of the flat
sqrt solver, amortized on-device.

    python -u benchmarks/stage2_ab.py [problem] [reps]
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from benchmarks.scale_bench import SIZES
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver.lm import create_linearizer, initial_state
    from rootba_tpu.utils.jax_setup import enable_compilation_cache, sync

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
    consts = lin.consts
    lam = jnp.asarray(1e-4, jnp.float32)
    print(f"{name}: mode bsr={getattr(lin, 'bsr_rcs', '?')} "
          f"dense={getattr(lin, 'explicit_rcs', '?')}", flush=True)

    t0 = time.monotonic()
    lins, pose_scale, _ = sync(jax.jit(lin.stage1_pure)(
        consts, state.cams, state.lm_ps))
    print(f"stage1 dispatch: {time.monotonic() - t0:.3f} s", flush=True)

    @jax.jit
    def chain(lins, lam0):
        def body(i, c):
            out = lin.stage2_pure(consts, lins, lam0 * (1.0 + c * 1e-30))
            stage2 = out[0]
            return c + stage2.b[0, 0] * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    t0 = time.monotonic()
    sync(chain(lins, lam))
    print(f"stage2 compile+first: {time.monotonic() - t0:.1f} s",
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        sync(chain(lins, lam))
        ts.append((time.monotonic() - t0) / reps)
    print(f"stage2_pure: {sorted(ts)[1] * 1e3:.1f} ms/op "
          f"(runs: {[f'{t * 1e3:.1f}' for t in sorted(ts)]})", flush=True)


if __name__ == "__main__":
    main()
