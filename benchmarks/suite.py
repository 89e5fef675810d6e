"""Multi-problem benchmark suite: time-to-cost-threshold + kernel
throughput, written to benchmarks/RESULTS.json.

Implements the reference's named evaluation metric (performance-profile
threshold `best + tau*(initial-best)`, latex/performance_profiles.py:
19-90) over the synthetic BAL family, plus measured TFLOP/s for the
stage1 linearization and the stage2 sqrt marginalization against the
eval/num_ops analytic model (BASELINE "QR kernel TFLOP/s/chip" north
star).

    python -u benchmarks/suite.py ladybug49 trafalgar257 [...]
    python -u benchmarks/suite.py --kernels   # kernel throughput only

Each problem row: total solve time (20 LM iterations, fused loop where
it compiles, host loop above the threshold), steady s/LM-iter, final
cost, time to the tau=0.01 threshold. Results merge into RESULTS.json
(one entry per (problem, solver)), with an ISO timestamp.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "RESULTS.json")
TAU = 0.01


def make_problem(name, seed=17, with_stats=False):
    """Synthetic problem of the named dataset's size with the
    per-dataset clustered-covisibility calibration (scale_bench.
    STRUCTURE), preprocessed per the CVPR'21 protocol; cached as npz
    (final-13682 generation alone is minutes of host time). The
    realized structure stats (track tail, camera-pair density) are
    cached alongside and returned with with_stats=True."""
    from benchmarks.scale_bench import SIZES, STRUCTURE
    from rootba_tpu.bal.problem import BalProblem
    from rootba_tpu.bal.synthetic import (
        generate_synthetic_bal,
        measure_structure,
    )

    skw = STRUCTURE.get(name, {})
    import hashlib

    tag = skw.get("structure", "ring")
    if skw:
        params = hashlib.sha1(
            json.dumps(skw, sort_keys=True).encode()).hexdigest()[:8]
        tag = f"{tag}-{params}"
    cache = f"/tmp/rootba_problems/{name}-{tag}-s{seed}.npz"
    stats_cache = cache.replace(".npz", ".stats.json")
    if os.path.exists(cache):
        p = BalProblem.load_npz(cache)
        if not with_stats:
            return p
        if os.path.exists(stats_cache):
            return p, json.load(open(stats_cache))
        stats = dict(measure_structure(p), **skw)
        json.dump(stats, open(stats_cache, "w"))
        return p, stats
    nc, nl, nobs = SIZES[name]
    p = generate_synthetic_bal(num_cams=nc, num_lms=nl,
                               mean_obs_per_lm=nobs / nl,
                               pixel_noise=1.0, seed=seed, **skw)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    p.save_npz(cache)
    stats = dict(measure_structure(p), **skw)
    json.dump(stats, open(stats_cache, "w"))
    return (p, stats) if with_stats else p


def cost_trajectory(summary):
    # only successful iterations carry a filled cost: invalid steps
    # (NaN increment rejected by the LM driver) leave the default
    # zero-cost record, which must not poison min() (r3 venice SC row
    # recorded threshold = tau*initial because of one such step)
    return [(it.cost.all.error, it.cumulative_time_in_seconds)
            for it in summary.iterations
            if it.step_is_successful and it.cost.all.num_obs > 0]


def time_to_threshold_row(summary, tau=TAU):
    """Per-run threshold (best = this run's own minimum). Kept for
    single-run reporting; the recorded rows additionally get the
    reference's CROSS-solver threshold via
    recompute_cross_solver_thresholds (performance_profiles.py:19-25
    thresholds against the best over all experiments)."""
    pairs = cost_trajectory(summary)
    if not pairs:
        # immediate divergence / every step rejected: record as
        # unsolved instead of crashing the suite row
        return float("inf"), float("inf")
    costs = [c for c, _ in pairs]
    initial, best = costs[0], min(costs)
    thresh = best + tau * (initial - best)
    for c, t in pairs:
        if c <= thresh:
            return t, thresh
    return float("inf"), thresh


def recompute_cross_solver_thresholds(results, tau=TAU):
    """The reference metric: for each problem, threshold = best cost
    across ALL recorded solver runs + tau*(initial - best)
    (/root/reference/python/rootba/latex/performance_profiles.py:19-25).
    Recomputed over every stored row that carries a trajectory, each
    time the suite writes RESULTS.json."""
    by_problem = {}
    for key, row in results.get("problems", {}).items():
        traj = row.get("trajectory")
        if traj:
            by_problem.setdefault(row["problem"], []).append(row)
    for name, rows in by_problem.items():
        best = min(min(c for c, _ in r["trajectory"]) for r in rows)
        initial = min(r["trajectory"][0][0] for r in rows)
        thresh = best + tau * (initial - best)
        for r in rows:
            t_cross = next((t for c, t in r["trajectory"]
                            if c <= thresh), None)
            r["cost_threshold_cross_solver"] = round(thresh, 1)
            r["time_to_threshold_cross_solver_s"] = (
                round(t_cross, 4) if t_cross is not None else None)


def protocol_overrides(solver):
    """The CVPR'21/PoBA-paper benchmark protocol knobs beyond dataset
    preprocessing (which make_problem already applies): Huber 1 px,
    eta = 0.01, and power_order = 20 for the PoBA rows
    (/root/reference/examples/batch/poba_batch_config.toml:52,398-412,
    combination `maxorderpower20`; docs/Configuration.md:275-341)."""
    from rootba_tpu.config.options import BalResidualOptions, RobustNorm

    ov = {"residual": BalResidualOptions(robust_norm=RobustNorm.HUBER,
                                         huber_parameter=1.0),
          "eta": 0.01}
    if solver == "POWER_SCHUR_COMPLEMENT":
        ov["power_order"] = 20
    return ov


def run_problem(name, solver="SQUARE_ROOT", iters=20, overrides=None):
    import jax
    import jax.numpy as jnp

    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.config.options import SolverOptions, SolverType
    from rootba_tpu.log.summary import SolverSummary
    from rootba_tpu.solver.lm import create_linearizer, optimize_lm

    p, pstats = make_problem(name, with_stats=True)
    opts = SolverOptions(
        use_double=False, max_num_iterations=iters,
        function_tolerance=0.0, verbosity_level=0,
        solver_type=SolverType[solver],
        **(overrides if overrides is not None
           else protocol_overrides(solver)))

    # setup once: bucketize + build the linearizer (host-side index
    # construction). The timed run below reuses the SAME linearizer
    # instance, so its jitted programs stay warm and the measurement is
    # solve time, not host re-tracing (VERDICT r2 weak item 2a).
    t0 = time.monotonic()
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lm_loop = opts.lm_loop
    if lm_loop == "auto":
        lm_loop = ("fused" if p.num_observations
                   <= opts.fused_obs_threshold else "host")
    lin = create_linearizer(bp, opts, jnp.float32)
    solve_fn = None
    if lm_loop == "fused":
        from rootba_tpu.solver.fused_lm import (
            build_fused_lm,
            optimize_lm_fused,
        )

        solve_fn = build_fused_lm(lin, opts)
    setup = time.monotonic() - t0

    def solve(summary):
        if lm_loop == "fused":
            return optimize_lm_fused(bp, opts, summary,
                                     linearizer=lin, solve_fn=solve_fn)
        return optimize_lm(bp, opts, summary, linearizer=lin)

    t0 = time.monotonic()
    s1 = SolverSummary()
    solve(s1)  # warm (compile + trace)
    t_first = time.monotonic() - t0

    s2 = SolverSummary()
    t0 = time.monotonic()
    solve(s2)
    total = time.monotonic() - t0

    its = s2.iterations
    n_it = len(its) - 1
    # steady-state: median per-iteration wall time after iteration 1
    # (endpoint differences get skewed by mid-run compiles of
    # backtracking/calibration program variants)
    per_it = sorted(it.iteration_time_in_seconds for it in its[2:])
    steady = (per_it[len(per_it) // 2] if per_it else total)
    t_thresh, thresh = time_to_threshold_row(s2)

    # measured-timing pass (VERDICT r3 item 4): every stage as its own
    # synced dispatch -> all per-stage fields are real spans, not
    # calibration-fraction attributions. The headline steady/total
    # stay from the fast fused run above; the stage split and the
    # timing_attributed=False flag come from this run.
    opts.timing_mode = "measured"
    s3 = SolverSummary()
    t0 = time.monotonic()
    solve_host = lambda s: optimize_lm(bp, opts, s, linearizer=lin)
    solve_host(s3)
    total_measured = time.monotonic() - t0
    opts.timing_mode = "fast"

    def med(vals):
        vals = sorted(vals)
        return round(vals[len(vals) // 2], 4) if vals else 0.0

    mits = s3.iterations[2:]
    stage_times = {
        # stage1 runs once per linearization point -- backtracking
        # iterations carry 0; median over the real spans only
        "stage1": med([i.stage1_time_in_seconds for i in mits
                       if i.stage1_time_in_seconds > 0]),
        "prepare": med([max(i.prepare_time_in_seconds,
                            i.stage2_time_in_seconds) for i in mits]),
        "lsolve": med([i.solve_reduced_system_time_in_seconds
                       for i in mits]),
        "bsub": med([i.back_substitution_time_in_seconds for i in mits]),
        "err": med([i.residual_evaluation_time_in_seconds for i in mits]),
    }
    attributed = any(it.timing_attributed for it in s3.iterations)
    return {
        "problem": name,
        "solver": solver,
        "lm_iters": n_it,
        "total_time_s": round(total, 4),
        "setup_time_s": round(setup, 2),
        "steady_s_per_it": round(steady, 4),
        "first_run_with_compile_s": round(t_first, 1),
        "initial_cost": round(its[0].cost.all.error, 1),
        "final_cost": round(s2.final_cost.all.error, 1),
        "time_to_threshold_tau0.01_s": (round(t_thresh, 4)
                                        if t_thresh != float("inf")
                                        else None),
        "cost_threshold": round(thresh, 1),
        "trajectory": [[round(c, 1), round(t, 4)]
                       for c, t in cost_trajectory(s2)],
        "problem_structure": pstats,
        "timing_attributed": attributed,
        "stage_times_measured_s": stage_times,
        "total_time_measured_mode_s": round(total_measured, 4),
        # the structure tag makes rows from different synthetic
        # generations incomparable to the regression gate (r5 moved
        # every row to the clustered heavy-tail twins)
        "protocol": ((f"cvpr21:huber1px,eta0.01"
                      + (",power_order20"
                         if solver == "POWER_SCHUR_COMPLEMENT" else "")
                      + "+" + pstats.get("structure", "ring"))
                     if overrides is None else "custom"),
        "device": str(jax.devices()[0]),
        "recorded": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }


def kernel_throughput(name="trafalgar"):
    """Measured stage1 / stage2(QR) TFLOP/s vs the num_ops model, and
    the dense CG GEMV bandwidth."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.eval.num_ops import qr_counts
    from rootba_tpu.solver.lm import create_linearizer, initial_state
    from rootba_tpu.utils.jax_setup import sync

    p = make_problem(name)
    opts = SolverOptions(use_double=False, verbosity_level=0)
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lin = create_linearizer(bp, opts, jnp.float32)
    state = initial_state(bp, jnp.float32)
    lam = jnp.asarray(1e-4, jnp.float32)

    # model flops over the real obs-count distribution
    counts = p.obs_per_landmark()
    f_lin = sum(qr_counts(int(n)).linearize for n in counts)
    f_marg = sum(qr_counts(int(n)).marginalize + qr_counts(int(n)).rhs
                 for n in counts)

    def timeit(fn, *args, reps=10):
        """Amortize `reps` executions inside ONE device dispatch
        (lax.fori_loop with a tiny data dependence between reps so XLA
        cannot hoist the loop-invariant computation), then divide.
        Host-side timing through the axon tunnel pays ~1.3 ms per
        dispatch submission and ~25 ms per blocking sync; both divide
        by `reps` here, so sub-ms kernels read their true device time
        (VERDICT r2 weak item 2b: per-rep syncing made the 21 MB GEMV
        read 0.8 GB/s instead of its real bandwidth)."""
        out = sync(fn(*args))  # compile + warm the single-shot program
        eps = jnp.float32(1e-30)

        def first_float_leaf(tree):
            for x in jax.tree_util.tree_leaves(tree):
                if (hasattr(x, "dtype")
                        and jnp.issubdtype(x.dtype, jnp.floating)):
                    return x
            raise ValueError("no floating leaf to thread timing "
                             "dependence through")

        def body(i, a):
            o = fn(*a)
            feed = eps * jnp.tanh(
                first_float_leaf(o).ravel()[0].astype(jnp.float32))
            # thread the dependence through the first float leaf of the
            # args so rep i+1 consumes rep i's output
            la, treedef = jax.tree_util.tree_flatten(a)
            for k, x in enumerate(la):
                if (hasattr(x, "dtype")
                        and jnp.issubdtype(x.dtype, jnp.floating)):
                    la[k] = x + feed.astype(x.dtype)
                    break
            return jax.tree_util.tree_unflatten(treedef, la)

        looped = jax.jit(
            lambda *a: fn(*jax.lax.fori_loop(0, reps, body, a)))
        sync(looped(*args))  # compile + warm the looped program
        t0 = time.monotonic()
        out = sync(looped(*args))
        # the loop runs `reps` + 1 trailing executions
        return (time.monotonic() - t0) / (reps + 1), out

    t_s1, (lins, ps, _) = timeit(lin._stage1_fn, lin.consts, state.cams,
                                 state.lm_ps, reps=30)
    t_s2, aux = timeit(lin._stage2_fn, lin.consts, lins, lam, reps=30)

    # ---- roofline denominators (VERDICT r3 item 9) -----------------
    # Both stages are bandwidth-bound on their op mix (the FLOP
    # intensities below are ~0.5-2 flop/byte, far under the v5e MXU
    # ridge), so the achievable time is HBM traffic / achievable
    # serial-stream bandwidth. The denominator uses the MEASURED
    # achievable chain rate on this chip (a bare dependent-chain HBM
    # sum-reduce reads ~320 GB/s with ~90 us fixed per-dispatch-step
    # latency, benchmarks/micro_prims2.py, docs/Performance.md), not
    # the 819 GB/s spec sheet -- the residual spec gap is the serial-
    # dependence regime every CG/LM chain lives in. Traffic counts
    # in/out array bytes only (gather duplication and transients are
    # uncounted), so pct_roofline is conservative (true achievable
    # time is higher than modeled).
    STREAM_GBPS = 320.0
    FIXED_S = 90e-6

    def tree_bytes(t):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(t)
                   if hasattr(x, "dtype"))

    def roofline_pct(measured_s, nbytes):
        achievable = nbytes / (STREAM_GBPS * 1e9) + FIXED_S
        return round(100.0 * achievable / measured_s, 1), achievable

    s1_bytes = (tree_bytes(lin.consts[0]) + tree_bytes(state.cams)
                + tree_bytes(state.lm_ps) + tree_bytes(lins))
    s2_bytes = tree_bytes(lins) + tree_bytes(aux)
    s1_pct, s1_ach = roofline_pct(t_s1, s1_bytes)
    s2_pct, s2_ach = roofline_pct(t_s2, s2_bytes)

    row = {
        "problem": name,
        "stage1_time_ms": round(t_s1 * 1e3, 3),
        "stage1_model_gflop": round(f_lin / 1e9, 3),
        "stage1_tflops": round(f_lin / t_s1 / 1e12, 4),
        "stage1_traffic_mb": round(s1_bytes / 1e6, 1),
        "stage1_pct_roofline": s1_pct,
        "stage2_time_ms": round(t_s2 * 1e3, 3),
        "stage2_model_gflop": round(f_marg / 1e9, 3),
        "stage2_tflops": round(f_marg / t_s2 / 1e12, 4),
        "stage2_traffic_mb": round(s2_bytes / 1e6, 1),
        "stage2_pct_roofline": s2_pct,
        "roofline_model": (f"min-traffic bytes / measured serial-chain "
                           f"{STREAM_GBPS:.0f} GB/s + {FIXED_S*1e6:.0f} us"),
        "device": str(jax.devices()[0]),
        "recorded": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }

    # dense CG GEMV bandwidth (explicit-RCS mode only)
    if getattr(lin, "explicit_rcs", False):
        from rootba_tpu.solver.explicit_sc import sc_matvec_dense

        stage2, Hd = aux
        x = jnp.ones((bp.num_cameras, 9), jnp.float32)
        # vector first so the rep-to-rep dependence threads through the
        # tiny [N,9] vector, leaving the big H loop-invariant (it is
        # still fully read by every GEMV)
        mv = jax.jit(lambda v, H: sc_matvec_dense(H, v))
        t_mv, _ = timeit(mv, x, Hd, reps=200)
        nbytes = Hd.size * 4
        mv_pct, _ = roofline_pct(t_mv, nbytes)
        row.update({
            "gemv_time_us": round(t_mv * 1e6, 1),
            "gemv_gbps": round(nbytes / t_mv / 1e9, 1),
            "gemv_pct_roofline": mv_pct,
        })
    return row


def main():
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    args = [a for a in sys.argv[1:]]
    results = {}
    if os.path.exists(RESULTS_PATH):
        results = json.load(open(RESULTS_PATH))
    if "--kernels" in args:
        args.remove("--kernels")
        row = kernel_throughput(args[0] if args else "trafalgar")
        results.setdefault("kernels", {})[row["problem"]] = row
        print(json.dumps(row, indent=1))
    else:
        solver = "SQUARE_ROOT"
        if args and args[0].isupper():
            solver = args.pop(0)
        for name in args or ["ladybug", "trafalgar"]:
            row = run_problem(name, solver)
            results.setdefault("problems", {})[
                f"{name}:{solver}"] = row
            print(json.dumps(row, indent=1), flush=True)
    recompute_cross_solver_thresholds(results)
    with open(RESULTS_PATH, "w") as fp:
        json.dump(results, fp, indent=1, sort_keys=True)
    print(f"saved {RESULTS_PATH}")


if __name__ == "__main__":
    main()
