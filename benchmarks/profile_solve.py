"""Capture a device profile of the sqrt solve (stage2+CG) and print the
top ops by self time.

    python -u benchmarks/profile_solve.py [problem] [mode]
"""

from __future__ import annotations

import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def op_totals(logdir):
    """Op name -> total self-time ms over all device planes."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    totals = {}
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_names = {i: m.name for i, m in plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    totals[name] = totals.get(name, 0) + ev.duration_ps
    return {n: ps / 1e9 for n, ps in totals.items()}


def top_ops(logdir, k=30):
    totals = op_totals(logdir)
    if not totals:
        print("no xplane files under", logdir)
        return
    for name, ms in sorted(totals.items(), key=lambda x: -x[1])[:k]:
        print(f"{ms:10.3f} ms  {name[:110]}")


def profile_stages(name="trafalgar", reps=20, record=True,
                   solver="SQUARE_ROOT", **opt_overrides):
    """Op-level breakdown of stage1 and stage2 separately (VERDICT r4
    item 3: explain the stage roofline gap per op). Traces `reps`
    dispatches of each stage, prints the top ops, and records the
    table (top 12 ops + dispatch counts) under kernels.<name>.op_table
    in RESULTS.json."""
    from benchmarks.suite import RESULTS_PATH, make_problem
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.config.options import SolverOptions, SolverType
    from rootba_tpu.solver.lm import create_linearizer, initial_state
    from rootba_tpu.utils.jax_setup import enable_compilation_cache, sync

    enable_compilation_cache()
    p = make_problem(name)
    opts = SolverOptions(use_double=False, verbosity_level=0,
                         solver_type=SolverType[solver], **opt_overrides)
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lin = create_linearizer(bp, opts, "float32")
    state = initial_state(bp, "float32")
    lam = jnp.asarray(1e-4, jnp.float32)

    lins, pose_scale, _ = sync(lin._stage1_fn(lin.consts, state.cams,
                                              state.lm_ps))
    sync(lin._stage2_fn(lin.consts, lins, lam))  # warm

    tables = {}
    for stage, run in [
        ("stage1", lambda i: lin._stage1_fn(lin.consts, state.cams,
                                            state.lm_ps)),
        ("stage2", lambda i: lin._stage2_fn(lin.consts, lins,
                                            lam * (1.0 + 1e-6 * i))),
    ]:
        logdir = f"/tmp/prof_stage_{name}_{solver}_{stage}"
        os.system(f"rm -rf {logdir}")
        with jax.profiler.trace(logdir):
            for i in range(reps):
                sync(run(i))
        totals = op_totals(logdir)
        rows = sorted(totals.items(), key=lambda x: -x[1])
        total_ms = sum(ms for _, ms in rows)
        print(f"=== {stage} top ops ({reps} dispatches, "
              f"{total_ms / reps:.2f} ms/dispatch device total) ===")
        for n, ms in rows[:15]:
            print(f"{ms / reps:9.3f} ms  {100 * ms / total_ms:5.1f}%  "
                  f"{n[:100]}")
        tables[stage] = {
            "device_ms_per_dispatch": round(total_ms / reps, 3),
            "num_ops": len(rows),
            "top_ops": [{"op": n[:100], "ms": round(ms / reps, 4),
                         "pct": round(100 * ms / total_ms, 1)}
                        for n, ms in rows[:12]],
        }
    if record:
        import json as _json
        import time as _time

        results = {}
        if os.path.exists(RESULTS_PATH):
            results = _json.load(open(RESULTS_PATH))
        k = results.setdefault("kernels", {}).setdefault(name, {})
        key = ("op_table" if solver == "SQUARE_ROOT"
               else f"op_table_{solver.lower()}")
        k[key] = dict(tables,
                      recorded=_time.strftime("%Y-%m-%dT%H:%M:%S"))
        with open(RESULTS_PATH, "w") as fp:
            _json.dump(results, fp, indent=1, sort_keys=True)
        print(f"saved op_table to {RESULTS_PATH}")
    return tables


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "stages":
        profile_stages(sys.argv[2] if len(sys.argv) > 2 else "trafalgar")
        return
    name = sys.argv[1] if len(sys.argv) > 1 else "trafalgar"
    mode = sys.argv[2] if len(sys.argv) > 2 else "auto"

    from benchmarks.suite import make_problem
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver.lm import create_linearizer, initial_state
    from rootba_tpu.utils.jax_setup import enable_compilation_cache, sync

    enable_compilation_cache()
    p = make_problem(name)
    opts = SolverOptions(use_double=False, verbosity_level=0,
                         sqrt_rcs_mode=mode)
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lin = create_linearizer(bp, opts, "float32")
    state = initial_state(bp, "float32")
    lam = jnp.asarray(1e-4, jnp.float32)

    solve_jit = jax.jit(lin.solve_pure)
    lins, pose_scale, _ = jax.jit(lin.stage1_pure)(
        lin.consts, state.cams, state.lm_ps)
    sync(solve_jit(lin.consts, lins, lam))  # warm

    logdir = f"/tmp/prof_{name}_{mode}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(5):
            sync(solve_jit(lin.consts, lins, lam * (1.0 + 1e-6 * i)))
    print("=== top ops (5 solves) ===", flush=True)
    top_ops(logdir)


if __name__ == "__main__":
    main()
