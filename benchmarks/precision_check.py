"""f32-at-scale hardening check: cost-trajectory drift of the f32
(compensated) solver vs an f64 reference solve on the same problem
(SURVEY §7.6 hard part (c); VERDICT r1 item 7).

    python -u benchmarks/precision_check.py [problem] [iters]

Runs three 20-iteration SQUARE_ROOT solves on the named synthetic
problem (default trafalgar):
  * f32 with compensated accumulation (default config) on the default
    backend (TPU when present),
  * f32 with plain accumulation,
  * f64 on CPU (subprocess: x64 is a process-global jax config),
and reports the max relative cost drift vs the f64 trajectory. Results
merge into benchmarks/RESULTS.json under "precision".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(name, iters, compensated, use_double=False):
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.log.summary import SolverSummary
    from rootba_tpu.solver.lm import bundle_adjust
    from benchmarks.suite import make_problem

    p = make_problem(name)
    opts = SolverOptions(
        use_double=use_double, max_num_iterations=iters,
        function_tolerance=0.0, verbosity_level=0, lm_loop="host",
        compensated_accumulation=compensated)
    s = SolverSummary()
    bundle_adjust(p, opts, s)
    # accepted-cost envelope: rejected/invalid backtracking attempts
    # record their ATTEMPTED cost (may be inf when an overlong step
    # overflows f32) but the solver state keeps the previous cost --
    # that is the trajectory the drift metric compares
    import math

    costs, cur = [], None
    for it in s.iterations:
        c = it.cost.all.error
        if it.step_is_successful and math.isfinite(c):
            cur = c
        costs.append(cur if cur is not None else c)
    return costs


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "trafalgar"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    if os.environ.get("ROOTBA_PRECISION_LEG") == "f64cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        costs = run_leg(name, iters, compensated=False, use_double=True)
        json.dump(costs, open(f"/tmp/precision_f64_{name}.json", "w"))
        return

    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.monotonic()
    costs_comp = run_leg(name, iters, compensated=True)
    costs_plain = run_leg(name, iters, compensated=False)
    print(f"f32 legs done ({time.monotonic() - t0:.0f}s)", flush=True)

    f64_path = f"/tmp/precision_f64_{name}.json"
    if not os.path.exists(f64_path):  # hours-long at venice scale on
        env = dict(os.environ)        # CPU; reuse a cached leg
        env["ROOTBA_PRECISION_LEG"] = "f64cpu"
        env["PYTHONPATH"] = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
        subprocess.run([sys.executable, "-u", os.path.abspath(__file__),
                        name, str(iters)], env=env, check=True)
    costs_f64 = json.load(open(f64_path))

    n = min(len(costs_comp), len(costs_plain), len(costs_f64))

    def drift(cs):
        return max(abs(a - b) / b
                   for a, b in zip(cs[:n], costs_f64[:n]))

    row = {
        "problem": name,
        "iters": n - 1,
        "final_cost_f64": costs_f64[n - 1],
        "final_cost_f32_comp": costs_comp[n - 1],
        "final_cost_f32_plain": costs_plain[n - 1],
        "max_rel_drift_comp": drift(costs_comp),
        "max_rel_drift_plain": drift(costs_plain),
        "recorded": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(row, indent=1))
    from benchmarks.suite import RESULTS_PATH

    results = (json.load(open(RESULTS_PATH))
               if os.path.exists(RESULTS_PATH) else {})
    results.setdefault("precision", {})[name] = row
    with open(RESULTS_PATH, "w") as fp:
        json.dump(results, fp, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
