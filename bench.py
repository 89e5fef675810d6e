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
    from rootba_tpu.bal.synthetic import generate_synthetic_bal

    p = generate_synthetic_bal(
        num_cams=49, num_lms=7776, mean_obs_per_lm=31843 / 7776,
        pixel_noise=1.0, seed=seed)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    return p


def main():
    os.environ.setdefault("JAX_PLATFORMS", "")
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.log.summary import SolverSummary
    from rootba_tpu.solver.lm import bundle_adjust

    opts = SolverOptions(
        use_double=False,
        max_num_iterations=20,
        verbosity_level=0,
    )

    # warmup: compile all stages on identical shapes
    p_warm = make_problem(seed=17)
    bundle_adjust(p_warm, opts)

    # timed run
    p = make_problem(seed=17)
    summary = SolverSummary()
    t0 = time.monotonic()
    bundle_adjust(p, opts, summary)
    elapsed = time.monotonic() - t0

    print(json.dumps({
        "metric": "ladybug49_sqrt32_solve_time",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
