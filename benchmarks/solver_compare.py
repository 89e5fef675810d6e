"""Cross-solver comparison at a given scale: SQUARE_ROOT vs
SCHUR_COMPLEMENT vs POWER_SCHUR_COMPLEMENT reach the same cost
(the reference's README claim for QR vs SC) -- with timings.

    python -u benchmarks/solver_compare.py [problem] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "trafalgar"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from benchmarks.scale_bench import SIZES
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions, SolverType
    from rootba_tpu.log.summary import SolverSummary
    from rootba_tpu.solver.lm import optimize_lm
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    nc, nl, nobs = SIZES[name]
    p = generate_synthetic_bal(num_cams=nc, num_lms=nl,
                               mean_obs_per_lm=nobs / nl,
                               pixel_noise=1.0, seed=17)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)

    for st in (SolverType.SQUARE_ROOT, SolverType.SCHUR_COMPLEMENT,
               SolverType.POWER_SCHUR_COMPLEMENT):
        opts = SolverOptions(use_double=False, max_num_iterations=iters,
                             function_tolerance=0.0, verbosity_level=0,
                             lm_loop="host", solver_type=st)
        bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
        s1 = SolverSummary()
        state, s1 = optimize_lm(bp, opts, s1)  # warm
        s2 = SolverSummary()
        t0 = time.monotonic()
        state, s2 = optimize_lm(bp, opts, s2)
        dt = time.monotonic() - t0
        its = s2.iterations
        n_it = len(its) - 1
        steady = ((its[-1].cumulative_time_in_seconds
                   - its[1].cumulative_time_in_seconds)
                  / max(n_it - 1, 1)) if n_it >= 2 else dt
        print(json.dumps({
            "problem": name, "solver": st.name,
            "final_cost": s2.final_cost.all.error,
            "solve_s": round(dt, 3),
            "steady_s_per_lm_iter": round(steady, 4),
            "lin_iters": sum(i.linear_solver_iterations for i in its),
        }), flush=True)


if __name__ == "__main__":
    main()
