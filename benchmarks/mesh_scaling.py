"""Virtual-mesh scaling harness: the same solve over 1/2/4/8 mesh
devices (VERDICT r3 item 7 / BASELINE scaling north star).

Runs each device count in a subprocess (the CPU device count is fixed
at backend init) on a virtual CPU mesh and records solve wall time,
steady s/LM-iter and final cost into benchmarks/RESULTS.json under
"mesh_scaling".

NOTE on interpretation: virtual CPU devices share one host's cores,
so wall-clock does NOT improve with device count here -- this harness
demonstrates (a) the sharded program compiles and runs at every mesh
size, (b) cost trajectories are invariant to the shard count (the
collectives are correct), and (c) the per-device landmark shard sizes
scale down as 1/N (the quantity that maps to real-chip scaling, where
each shard runs on its own chip). Real scaling efficiency must be
measured on hardware with N real chips; the driver's
dryrun_multichip covers compile/execute correctness the same way.

    python -u benchmarks/mesh_scaling.py [problem] [iters] [counts...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "RESULTS.json")

_CHILD = r"""
import json, os, sys, time

ndev = int(sys.argv[1]); name = sys.argv[2]; iters = int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={ndev}")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rootba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.suite import make_problem
from rootba_tpu.bal.bucketing import bucketize
from rootba_tpu.config.options import SolverOptions
from rootba_tpu.log.summary import SolverSummary
from rootba_tpu.parallel.mesh import pad_rows_for_mesh
from rootba_tpu.solver.lm import bundle_adjust

p = make_problem(name)
opts = SolverOptions(use_double=False, max_num_iterations=iters,
                     function_tolerance=0.0, verbosity_level=0,
                     lm_loop="host", num_devices=0,
                     kernel_layout="einsum")
s1 = SolverSummary()
t0 = time.monotonic()
bundle_adjust(p, opts, s1)  # includes compile
t_first = time.monotonic() - t0

p2 = make_problem(name)
s2 = SolverSummary()
t0 = time.monotonic()
bundle_adjust(p2, opts, s2)
t_warm = time.monotonic() - t0
its = s2.iterations
per_it = sorted(it.iteration_time_in_seconds for it in its[2:])
steady = per_it[len(per_it) // 2] if per_it else t_warm

# per-device resident bytes: the quantity that maps to real chips
# (replicated camera-axis arrays count fully on every device; the
# landmark-sharded bucket tensors count 1/N each). Measured over all
# live device arrays after the warm solve.
dev0 = jax.devices()[0]
dev0_bytes = 0
total_bytes = 0
for x in jax.live_arrays():
    try:
        total_bytes += x.nbytes
        dev0_bytes += sum(s.data.nbytes for s in x.addressable_shards
                          if s.device == dev0)
    except Exception:
        pass
print("RESULT " + json.dumps({
    "devices": ndev,
    "warm_solve_s": round(t_warm, 3),
    "steady_s_per_it": round(steady, 4),
    "final_cost": round(s2.final_cost.all.error, 1),
    "lm_iters": len(its) - 1,
    "per_device_mb": round(dev0_bytes / 1e6, 1),
    "total_live_mb": round(total_bytes / 1e6, 1),
}), flush=True)
"""


def main():
    args = sys.argv[1:]
    name = args[0] if args else "trafalgar"
    iters = int(args[1]) if len(args) > 1 else 8
    counts = [int(a) for a in args[2:]] or [1, 2, 4, 8]

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root

    rows = []
    for n in counts:
        t0 = time.monotonic()
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(n), name, str(iters)],
            env=env, capture_output=True, text=True, timeout=3600)
        if out.returncode != 0:
            print(f"devices={n} FAILED:\n{out.stdout[-2000:]}"
                  f"\n{out.stderr[-2000:]}")
            continue
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")][-1]
        row = json.loads(line[len("RESULT "):])
        row["wall_s"] = round(time.monotonic() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    costs = {r["final_cost"] for r in rows}
    entry = {
        "problem": name,
        "lm_iters": iters,
        "backend": "cpu-virtual",
        "note": ("virtual CPU devices share one host's cores; this "
                 "table demonstrates mesh-size-invariant convergence "
                 "and per-device shard scaling, not wall-clock "
                 "speedup (needs real chips)"),
        "cost_invariant": len(costs) == 1,
        "rows": rows,
        "recorded": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    results = {}
    if os.path.exists(RESULTS_PATH):
        results = json.load(open(RESULTS_PATH))
    results.setdefault("mesh_scaling", {})[name] = entry
    with open(RESULTS_PATH, "w") as fp:
        json.dump(results, fp, indent=1, sort_keys=True)
    print(f"saved {RESULTS_PATH}")


if __name__ == "__main__":
    main()
