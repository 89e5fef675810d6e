"""Scale benchmark: fused-LM sqrt-BA solve time vs problem size.

Times the full 20-iteration LM solve (device execution only, after
warmup) on synthetic problems matching the BAL family sizes in
BASELINE.md (ladybug-49, trafalgar-257, venice-1778-shaped). Usage:

    python benchmarks/scale_bench.py [ladybug|trafalgar|venice|final4585]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = {
    # name: (num_cams, num_lms, num_obs)
    "ladybug": (49, 7776, 31843),
    "trafalgar": (257, 65132, 225911),
    "dubrovnik": (356, 226730, 1255268),
    "venice": (1778, 993923, 5001946),
    "final4585": (4585, 1324582, 9125125),
    "final13682": (13682, 4456117, 28987644),
}


def main():
    names = sys.argv[1:] or ["ladybug", "trafalgar"]
    import jax

    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver.fused_lm import build_fused_lm
    from rootba_tpu.solver.lm import create_linearizer, initial_state
    from rootba_tpu.utils.jax_setup import enable_compilation_cache, sync

    enable_compilation_cache()

    for name in names:
        nc, nl, nobs = SIZES[name]
        t0 = time.monotonic()
        p = generate_synthetic_bal(
            num_cams=nc, num_lms=nl, mean_obs_per_lm=nobs / nl,
            pixel_noise=1.0, seed=17)
        p.normalize(100.0)
        p.perturb(0.0, 0.01, 0.01, 38401)
        p.filter_obs(0.1)
        t_gen = time.monotonic() - t0

        opts = SolverOptions(use_double=False, max_num_iterations=20,
                             function_tolerance=0.0, verbosity_level=0)
        t0 = time.monotonic()
        bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
        t_bucket = time.monotonic() - t0

        t0 = time.monotonic()
        linearizer = create_linearizer(bp, opts, "float32")
        solve_fn = build_fused_lm(linearizer, opts)
        state = initial_state(bp, "float32")
        if hasattr(linearizer, "prepare_state"):
            state = linearizer.prepare_state(state)
        out = sync(
            solve_fn(linearizer.consts, state.cams, state.lm_ps))
        t_compile = time.monotonic() - t0

        times = []
        for _ in range(3):
            t0 = time.monotonic()
            out = sync(
                solve_fn(linearizer.consts, state.cams, state.lm_ps))
            times.append(time.monotonic() - t0)
        elapsed = sorted(times)[1]
        n_it = int(out[4]) - 1
        final_cost = float(out[2].cost_all_error[n_it])
        cg_total = int(out[2].cg_iters[:n_it + 1].sum())
        print(json.dumps({
            "problem": name, "cams": nc, "lms": p.num_landmarks,
            "obs": p.num_observations,
            "solve_s": round(elapsed, 4),
            "lm_iters_per_s": round(n_it / elapsed, 2),
            "gen_s": round(t_gen, 2), "bucketize_s": round(t_bucket, 2),
            "compile_s": round(t_compile, 1),
            "final_cost": round(final_cost, 1), "cg_total": cg_total,
        }))


if __name__ == "__main__":
    main()
