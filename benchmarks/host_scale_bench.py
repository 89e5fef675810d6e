"""Host-loop LM solve at venice/final scale (the fused one-program
driver is compile-hostile above ~2M obs; the host driver jits the four
stages separately, like the reference's per-stage calls).

    python -u benchmarks/host_scale_bench.py [venice] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "venice"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from benchmarks.scale_bench import SIZES
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.log.summary import SolverSummary
    from rootba_tpu.solver.lm import optimize_lm
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    nc, nl, nobs = SIZES[name]
    t0 = time.monotonic()
    p = generate_synthetic_bal(num_cams=nc, num_lms=nl,
                               mean_obs_per_lm=nobs / nl,
                               pixel_noise=1.0, seed=17)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    t_gen = time.monotonic() - t0
    print(f"gen {t_gen:.1f}s: {p.num_cameras} cams {p.num_landmarks} "
          f"lms {p.num_observations} obs", flush=True)

    opts = SolverOptions(use_double=False, max_num_iterations=iters,
                         function_tolerance=0.0, verbosity_level=2,
                         lm_loop="host")
    t0 = time.monotonic()
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    t_bucket = time.monotonic() - t0

    # warm-up solve (compiles cached); then timed solve
    summary = SolverSummary()
    t0 = time.monotonic()
    state, summary = optimize_lm(bp, opts, summary)
    t_first = time.monotonic() - t0
    summary2 = SolverSummary()
    t0 = time.monotonic()
    state, summary2 = optimize_lm(bp, opts, summary2)
    elapsed = time.monotonic() - t0

    n_it = len(summary2.iterations) - 1
    final = (summary2.final_cost.all.error
             if summary2.iterations else -1.0)
    cg_total = sum(it.linear_solver_iterations
                   for it in summary2.iterations)
    # steady-state: median per-iteration wall time after iteration 1
    # (excludes per-call trace/cache-load overhead and mid-run compiles
    # of backtracking/calibration program variants)
    its = summary2.iterations
    per_it = sorted(it.iteration_time_in_seconds for it in its[2:])
    steady = (per_it[len(per_it) // 2] if per_it
              else elapsed / max(n_it, 1))
    print(json.dumps({
        "problem": name, "cams": nc, "lms": p.num_landmarks,
        "obs": p.num_observations, "bucketize_s": round(t_bucket, 2),
        "first_solve_s": round(t_first, 1),
        "solve_s": round(elapsed, 3),
        "lm_iters_per_s": round(n_it / elapsed, 3),
        "steady_s_per_lm_iter": round(steady, 3),
        "steady_lm_iters_per_s": round(1.0 / steady, 3),
        "cg_total": cg_total,
        "final_cost": final,
    }))


if __name__ == "__main__":
    main()
