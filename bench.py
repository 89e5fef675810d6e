"""Benchmark: sqrt-BA float32 solve on a ladybug-49-sized problem.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference solves BAL ladybug-49 (49 cams / 7,776 lms /
31,843 obs) with the sqrt-BA double solver in ~0.32 s wall on a dev CPU
(reference docs/PoBATutorial.md:160-169). The BAL data files are not
vendored, so the benchmark uses a synthetic problem of identical size
and statistics, solved with the same LM/CG protocol (20 iterations,
Huber-off, seed-38401 perturbation). vs_baseline = baseline_time /
our_time (>1 means faster than the reference).

A warmup solve on identical shapes is run first so jit compilation is
excluded (the reference's 0.32 s also excludes its compile: C++ is AOT).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_SECONDS = 0.32


def make_problem(seed: int):
    from benchmarks.scale_bench import STRUCTURE
    from rootba_tpu.bal.synthetic import generate_synthetic_bal

    # round 5: clustered heavy-tail covisibility (the structurally
    # honest twin; scale_bench.STRUCTURE documents the calibration) --
    # the legacy consecutive-ring band was materially easier than real
    # BAL data (VERDICT r4)
    p = generate_synthetic_bal(
        num_cams=49, num_lms=7776, mean_obs_per_lm=31843 / 7776,
        pixel_noise=1.0, seed=seed, **STRUCTURE["ladybug"])
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    return p


def main():
    os.environ.setdefault("JAX_PLATFORMS", "")
    from rootba_tpu.utils.jax_setup import sync, enable_compilation_cache

    enable_compilation_cache()
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.log.summary import SolverSummary
    from rootba_tpu.solver.lm import bundle_adjust

    import jax

    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.solver.fused_lm import build_fused_lm
    from rootba_tpu.solver.lm import create_linearizer, initial_state

    opts = SolverOptions(
        use_double=False,
        max_num_iterations=20,
        function_tolerance=0.0,  # run all 20 iterations like the
        verbosity_level=0,       # reference's example protocol
    )

    p = make_problem(seed=17)
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    linearizer = create_linearizer(bp, opts, "float32")
    solve_fn = build_fused_lm(linearizer, opts)
    state = initial_state(bp, "float32")

    # compile + warm up on the real shapes
    out = sync(
        solve_fn(linearizer.consts, state.cams, state.lm_ps))

    # timed: median of 3 full 20-iteration LM solves (device execution
    # only -- the reference's 0.32 s is AOT-compiled C++, so compile
    # time is excluded on both sides)
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        out = sync(
            solve_fn(linearizer.consts, state.cams, state.lm_ps))
        times.append(time.monotonic() - t0)
    elapsed = sorted(times)[1]
    final_cost = float(out[2].cost_all_error[int(out[4]) - 1])

    # secondary rows: trafalgar-scale solve + time-to-threshold and
    # measured kernel TFLOP/s (VERDICT r1 item 5); recorded venice/
    # final-scale results from this round's benchmark suite runs are
    # attached verbatim (they take minutes-to-hours and are produced by
    # benchmarks/suite.py / run_solver.py on the same chip; each row
    # carries its own 'recorded' timestamp and device)
    suite_rows = []
    kernels = {}
    recorded = {}
    try:
        from benchmarks.suite import (
            RESULTS_PATH,
            kernel_throughput,
            run_problem,
        )

        suite_rows.append(run_problem("trafalgar"))
        kernels = kernel_throughput("trafalgar")
        if os.path.exists(RESULTS_PATH):
            data = json.load(open(RESULTS_PATH))
            recorded = {k: v for k, v in data.get("problems", {}).items()
                        if k.split(":")[0] in ("dubrovnik",
                                               "venice",
                                               "final4585",
                                               "final13682")}
    except Exception as e:  # keep the headline metric robust
        kernels = {"error": str(e).splitlines()[0][:200]}

    # --- perf-regression gate (VERDICT r2 item 8): diff against the
    # newest committed BENCH_r*.json so a refactor can never silently
    # ship a slowdown again. >20% slower on any comparable metric =>
    # loud stderr warning + a "regressions" field in the JSON line.
    regressions = []
    try:
        import glob
        import re as _re

        prev_files = sorted(
            glob.glob(os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "BENCH_r*.json")),
            key=lambda f: int(_re.search(r"r(\d+)", f).group(1)))
        if prev_files:
            prev = json.load(open(prev_files[-1])).get("parsed") or {}
            checks = []
            # comparable only on the same synthetic structure (r5
            # switched every row to the clustered heavy-tail twins)
            if prev.get("structure") == "clustered":
                checks.append(("ladybug49_sqrt32_solve_time",
                               prev.get("value"), elapsed))
            prev_suite = {(r["problem"], r["solver"]): r
                          for r in prev.get("suite", [])}
            for r in suite_rows:
                pr = prev_suite.get((r["problem"], r["solver"]))
                # comparable only under the same benchmark protocol
                # (r4 switched the suite to the CVPR'21 Huber +
                # eta=0.01 protocol, which changes CG iteration counts)
                if pr and pr.get("protocol") != r.get("protocol"):
                    continue
                if pr and pr.get("steady_s_per_it"):
                    checks.append(
                        (f"{r['problem']}_steady_s_per_it",
                         pr["steady_s_per_it"], r["steady_s_per_it"]))
            for name, old, new in checks:
                if old and new and new > 1.2 * old:
                    regressions.append(
                        {"metric": name, "was": old, "now": round(new, 4),
                         "slowdown": round(new / old, 2)})
                    print(f"PERF REGRESSION: {name} {old} -> "
                          f"{new:.4f} ({new / old:.2f}x slower than "
                          f"{os.path.basename(prev_files[-1])})",
                          file=sys.stderr)
    except Exception as e:
        print(f"regression gate skipped: {e}", file=sys.stderr)

    # detail first, compact headline LAST: the driver records the tail
    # of long output, and r3's multi-KB single line truncated into an
    # unparseable "parsed": null -- the final line must stay small
    print(json.dumps({
        "detail": {
            "suite": suite_rows,
            "kernels": kernels,
            "recorded_runs": recorded,
        },
    }))
    venice = recorded.get("venice:SQUARE_ROOT", {})
    final = recorded.get("final13682:SQUARE_ROOT", {})
    print(json.dumps({
        "metric": "ladybug49_sqrt32_solve_time",
        "value": round(elapsed, 4),
        "unit": "s",
        "structure": "clustered",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 3),
        "final_cost": round(final_cost, 2),
        "lm_iters": int(out[4]) - 1,
        "venice_steady_s_per_it": venice.get("steady_s_per_it"),
        "final13682_steady_s_per_it": final.get("steady_s_per_it"),
        "regressions": regressions,
    }))


if __name__ == "__main__":
    main()
