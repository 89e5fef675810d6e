"""ba_log.json writer with the reference's exact schema.

Produces the column-major per-iteration layout of the reference
(bal/ba_log.cpp:62-150): the top-level JSON object maps each
BaIteration field name to an array over iterations, plus "_type":
"rootba" and a "_static" blob (problem_info / timing / solver,
bal/ba_log.hpp:50-256). Field names and semantics match
bal/ba_log_utils.cpp:40-180 (unsuccessful iterations repeat the
previous iteration's cost fields with zero change) so the reference's
Python evaluation tooling concepts port unchanged. Optional UBJSON
output mirrors SaveLogFlag::UBJSON.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field
from typing import List, Optional

from rootba_tpu.bal.problem import DatasetSummary, PipelineTimingSummary
from rootba_tpu.config.options import BaLogOptions
from rootba_tpu.log.summary import IterationSummary, SolverSummary

# per-iteration field order mirrors BaLog::BaIteration (ba_log.hpp:139-256)
_ITER_FIELDS = [
    "iteration", "linear_solver_type", "step_is_valid",
    "step_is_nonmonotonic", "step_is_successful", "num_obs",
    "num_obs_valid", "num_obs_valid_change", "cost", "cost_change",
    "cost_valid", "cost_valid_change", "cost_avg_valid",
    "cost_avg_valid_change", "grad_projected_norm",
    "grad_projected_max_norm", "grad_norm", "grad_max_norm",
    "residual_block_mean", "residual_block_valid_mean", "step_norm",
    "relative_decrease", "trust_region_radius",
    "linear_solver_iterations", "iteration_time", "cumulative_time",
    "logging_time", "step_solver_time", "residual_evaluation_time",
    "jacobian_evaluation_time", "scale_landmark_jacobian_time",
    "perform_qr_time", "stage1_time", "scale_pose_jacobian_time",
    "landmark_damping_time", "compute_preconditioner_time",
    "compute_gradient_time", "stage2_time", "prepare_time",
    "solve_reduced_system_time", "back_substitution_time",
    "update_cameras_time", "resident_memory", "resident_memory_peak",
    # TPU addition (not in ba_log.hpp): marks iterations whose stage
    # timings are attributed from a fused dispatch's measured total
    # (via the latest calibration pass) instead of per-stage timers
    "timing_attributed",
]


def _iteration_record(it: IterationSummary, prev: Optional[dict]) -> dict:
    rec = {
        "iteration": it.iteration,
        "linear_solver_type": it.linear_solver_type,
        "step_is_valid": it.step_is_valid,
        "step_is_nonmonotonic": False,
        "step_is_successful": it.step_is_successful,
        "trust_region_radius": it.trust_region_radius,
        "linear_solver_iterations": it.linear_solver_iterations,
        "iteration_time": it.iteration_time_in_seconds,
        "cumulative_time": it.cumulative_time_in_seconds,
        "logging_time": 0.0,
        "step_solver_time": it.step_solver_time_in_seconds,
        "residual_evaluation_time":
            it.residual_evaluation_time_in_seconds,
        "jacobian_evaluation_time":
            it.jacobian_evaluation_time_in_seconds,
        "scale_landmark_jacobian_time":
            it.scale_landmark_jacobian_time_in_seconds,
        "perform_qr_time": it.perform_qr_time_in_seconds,
        "stage1_time": it.stage1_time_in_seconds,
        "scale_pose_jacobian_time":
            it.scale_pose_jacobian_time_in_seconds,
        "landmark_damping_time": it.landmark_damping_time_in_seconds,
        "compute_preconditioner_time":
            it.compute_preconditioner_time_in_seconds,
        "compute_gradient_time": it.compute_gradient_time_in_seconds,
        "stage2_time": it.stage2_time_in_seconds,
        "prepare_time": it.prepare_time_in_seconds,
        "solve_reduced_system_time":
            it.solve_reduced_system_time_in_seconds,
        "back_substitution_time": it.back_substitution_time_in_seconds,
        "update_cameras_time": it.update_cameras_time_in_seconds,
        "resident_memory": it.resident_memory,
        "resident_memory_peak": it.resident_memory_peak,
        "timing_attributed": it.timing_attributed,
        "grad_projected_norm": 0.0,
        "grad_projected_max_norm": 0.0,
    }
    if it.step_is_successful or prev is None:
        rec.update({
            "num_obs": it.cost.all.num_obs,
            "num_obs_valid": it.cost.valid.num_obs,
            "num_obs_valid_change": it.cost_change.valid.num_obs,
            "cost": it.cost.all.error,
            "cost_change": it.cost_change.all.error,
            "cost_valid": it.cost.valid.error,
            "cost_valid_change": it.cost_change.valid.error,
            "cost_avg_valid": it.cost.valid.error_avg,
            "cost_avg_valid_change":
                (it.cost_change.valid.error / it.cost.valid.num_obs
                 if it.cost.valid.num_obs else 0.0),
            "residual_block_mean": it.cost.all.residual_mean,
            "residual_block_valid_mean": it.cost.valid.residual_mean,
            "grad_norm": 0.0,
            "grad_max_norm": it.gradient_max_norm,
            "step_norm": it.step_norm,
            "relative_decrease": it.relative_decrease,
        })
    else:
        rec.update({
            "num_obs": prev["num_obs"],
            "num_obs_valid": prev["num_obs_valid"],
            "num_obs_valid_change": 0,
            "cost": prev["cost"],
            "cost_change": 0.0,
            "cost_valid": prev["cost_valid"],
            "cost_valid_change": 0.0,
            "cost_avg_valid": prev["cost_avg_valid"],
            "cost_avg_valid_change": 0.0,
            "residual_block_mean": prev["residual_block_mean"],
            "residual_block_valid_mean":
                prev["residual_block_valid_mean"],
            "grad_norm": prev["grad_norm"],
            "grad_max_norm": prev["grad_max_norm"],
            "step_norm": 0.0,
            "relative_decrease": 0.0,
        })
    return rec


def build_log_dict(
    solver_summary: SolverSummary,
    dataset_summary: Optional[DatasetSummary] = None,
    timing_summary: Optional[PipelineTimingSummary] = None,
) -> dict:
    result: dict = {name: [] for name in _ITER_FIELDS}
    prev = None
    for it in solver_summary.iterations:
        rec = _iteration_record(it, prev)
        for name in _ITER_FIELDS:
            result[name].append(rec[name])
        prev = rec

    ds = dataset_summary or DatasetSummary()
    tm = timing_summary or PipelineTimingSummary()
    static = {
        "problem_info": {
            "type": ds.type,
            "input_path": ds.input_path,
            "num_cameras": ds.num_cameras,
            "num_landmarks": ds.num_landmarks,
            "num_observations": ds.num_observations,
            "rcs_sparsity": 0.0,
            "per_lm_obs": {
                "mean": ds.per_lm_obs_mean,
                "min": float(ds.per_lm_obs_min),
                "max": float(ds.per_lm_obs_max),
                "stddev": ds.per_lm_obs_stddev,
            },
            "per_host_lms": {
                "mean": 0.0, "min": 0.0, "max": 0.0, "stddev": 0.0,
            },
        },
        "timing": {
            "total": (tm.load_time + tm.preprocess_time
                      + tm.optimize_time),
            "load": tm.load_time,
            "preprocess": tm.preprocess_time,
            "optimize": tm.optimize_time,
            "postprocess": tm.postprocess_time,
        },
        "solver": {
            "solver_type": solver_summary.solver_type,
            "termination_type": solver_summary.termination_type,
            "message": solver_summary.message,
            "num_successful_steps": solver_summary.num_successful_steps,
            "num_unsuccessful_steps":
                solver_summary.num_unsuccessful_steps,
            "logging_time_in_seconds":
                solver_summary.logging_time_in_seconds,
            "preprocessor_time_in_seconds":
                solver_summary.preprocessor_time_in_seconds,
            "minimizer_time_in_seconds":
                solver_summary.minimizer_time_in_seconds,
            "postprocessor_time_in_seconds":
                solver_summary.postprocessor_time_in_seconds,
            "total_time_in_seconds":
                solver_summary.total_time_in_seconds,
            "linear_solver_time_in_seconds":
                solver_summary.linear_solver_time_in_seconds,
            "num_linear_solves": solver_summary.num_linear_solves,
            "residual_evaluation_time_in_seconds":
                solver_summary.residual_evaluation_time_in_seconds,
            "num_residual_evaluations":
                solver_summary.num_residual_evaluations,
            "jacobian_evaluation_time_in_seconds":
                solver_summary.jacobian_evaluation_time_in_seconds,
            "num_jacobian_evaluations":
                solver_summary.num_jacobian_evaluations,
            "num_threads_given": solver_summary.num_threads_given,
            "num_threads_used": solver_summary.num_threads_used,
            "num_threads_available":
                solver_summary.num_threads_available,
            "resident_memory_peak": solver_summary.resident_memory_peak,
            "timing_attributed": any(
                it.timing_attributed for it in solver_summary.iterations),
        },
    }
    result["_type"] = "rootba"
    result["_static"] = static
    return result


def _to_ubjson(obj) -> bytes:
    """Minimal UBJSON encoder (the subset nlohmann produces for these
    logs: objects, arrays, strings, bools, ints, doubles)."""
    out = bytearray()

    def enc_int(v: int):
        if -128 <= v <= 127:
            out.extend(b"i")
            out.extend(struct.pack(">b", v))
        elif 0 <= v <= 255:
            out.extend(b"U")
            out.extend(struct.pack(">B", v))
        elif -32768 <= v <= 32767:
            out.extend(b"I")
            out.extend(struct.pack(">h", v))
        elif -2147483648 <= v <= 2147483647:
            out.extend(b"l")
            out.extend(struct.pack(">i", v))
        else:
            out.extend(b"L")
            out.extend(struct.pack(">q", v))

    def enc_str_payload(s: str):
        data = s.encode()
        enc_int(len(data))
        out.extend(data)

    def enc(v):
        if v is None:
            out.extend(b"Z")
        elif isinstance(v, bool):
            out.extend(b"T" if v else b"F")
        elif isinstance(v, int):
            enc_int(v)
        elif isinstance(v, float):
            out.extend(b"D")
            out.extend(struct.pack(">d", v))
        elif isinstance(v, str):
            out.extend(b"S")
            enc_str_payload(v)
        elif isinstance(v, (list, tuple)):
            out.extend(b"[")
            for x in v:
                enc(x)
            out.extend(b"]")
        elif isinstance(v, dict):
            out.extend(b"{")
            for k, x in v.items():
                enc_str_payload(str(k))
                enc(x)
            out.extend(b"}")
        else:
            raise TypeError(f"cannot ubjson-encode {type(v)}")

    enc(obj)
    return bytes(out)


def save_log(
    options: BaLogOptions,
    solver_summary: SolverSummary,
    dataset_summary: Optional[DatasetSummary] = None,
    timing_summary: Optional[PipelineTimingSummary] = None,
    quiet: bool = False,
) -> bool:
    if options.disable_all or not options.save_log_flags:
        return True
    result = build_log_dict(solver_summary, dataset_summary, timing_summary)
    flags = [f.lower() for f in options.save_log_flags]
    n = len(solver_summary.iterations)
    if "json" in flags:
        with open(options.log_path, "w") as fp:
            json.dump(result, fp, indent=4)
        if not quiet:
            print(f"Saved log for {n} iterations to {options.log_path}.")
    if "ubjson" in flags:
        dot = options.log_path.rfind(".")
        ubjson_path = (options.log_path[:dot] if dot >= 0
                       else options.log_path) + ".ubjson"
        with open(ubjson_path, "wb") as fp:
            fp.write(_to_ubjson(result))
        if not quiet:
            print(f"Saved log for {n} iterations to {ubjson_path}.")
    return True
