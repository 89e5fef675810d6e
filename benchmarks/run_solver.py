"""Run one solver config at a named scale and print a JSON summary.

    python -u benchmarks/run_solver.py <problem> <solver> <iters> [k=v ...]

problem: name from scale_bench.SIZES; solver: SQUARE_ROOT |
SCHUR_COMPLEMENT | POWER_SCHUR_COMPLEMENT; extra k=v pairs override
SolverOptions fields (ints/floats/bools parsed).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v in ("true", "True"):
        return True
    if v in ("false", "False"):
        return False
    return v


def main():
    name = sys.argv[1]
    solver = sys.argv[2] if len(sys.argv) > 2 else "SQUARE_ROOT"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    overrides = dict(kv.split("=", 1) for kv in sys.argv[4:])
    overrides = {k: _parse(v) for k, v in overrides.items()}

    from benchmarks.suite import make_problem
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.config.options import SolverOptions, SolverType
    from rootba_tpu.log.summary import SolverSummary
    from rootba_tpu.solver.lm import optimize_lm
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.monotonic()
    p = make_problem(name)
    print(f"gen {time.monotonic() - t0:.1f}s: {p.num_cameras} cams "
          f"{p.num_landmarks} lms {p.num_observations} obs", flush=True)

    opts = SolverOptions(use_double=False, max_num_iterations=iters,
                         function_tolerance=0.0, verbosity_level=2,
                         lm_loop="host", solver_type=SolverType[solver],
                         **overrides)
    t0 = time.monotonic()
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    print(f"bucketize {time.monotonic() - t0:.1f}s", flush=True)

    s1 = SolverSummary()
    t0 = time.monotonic()
    state, s1 = optimize_lm(bp, opts, s1)  # warm (compile)
    t_first = time.monotonic() - t0
    s2 = SolverSummary()
    t0 = time.monotonic()
    state, s2 = optimize_lm(bp, opts, s2)
    dt = time.monotonic() - t0
    its = s2.iterations
    n_it = len(its) - 1
    steady = ((its[-1].cumulative_time_in_seconds
               - its[1].cumulative_time_in_seconds)
              / max(n_it - 1, 1)) if n_it >= 2 else dt
    cg_total = sum(it.linear_solver_iterations for it in its)
    print(json.dumps({
        "problem": name, "solver": solver, "cams": nc,
        "lms": p.num_landmarks, "obs": p.num_observations,
        "first_solve_s": round(t_first, 1),
        "solve_s": round(dt, 3),
        "steady_s_per_lm_iter": round(steady, 4),
        "steady_lm_iters_per_s": round(1.0 / max(steady, 1e-9), 3),
        "cg_total": cg_total,
        "final_cost": s2.final_cost.all.error,
        "overrides": overrides,
    }), flush=True)


if __name__ == "__main__":
    main()
