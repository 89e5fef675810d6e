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


def top_ops(logdir, k=30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane files under", logdir)
        return
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
    for name, ps in sorted(totals.items(), key=lambda x: -x[1])[:k]:
        print(f"{ps / 1e9:10.3f} ms  {name[:110]}")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "trafalgar"
    mode = sys.argv[2] if len(sys.argv) > 2 else "auto"

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
