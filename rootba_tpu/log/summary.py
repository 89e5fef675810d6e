"""Solver bookkeeping structs (reference solver/solver_summary.hpp and
bal/residual_info.hpp host-side mirrors)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ResidualItemHost:
    num_obs: int = 0
    error: float = 0.0
    residual_sum: float = 0.0

    @property
    def error_avg(self) -> float:
        return self.error / self.num_obs if self.num_obs > 0 else 0.0

    @property
    def residual_mean(self) -> float:
        return self.residual_sum / self.num_obs if self.num_obs > 0 else 0.0

    def compared_to(self, prev: "ResidualItemHost") -> "ResidualItemHost":
        return ResidualItemHost(
            num_obs=prev.num_obs - self.num_obs,
            error=prev.error - self.error,
            residual_sum=prev.residual_sum - self.residual_sum,
        )


@dataclass
class ResidualInfoHost:
    all: ResidualItemHost = field(default_factory=ResidualItemHost)
    valid: ResidualItemHost = field(default_factory=ResidualItemHost)
    is_numerically_valid: bool = True

    @staticmethod
    def from_device(info) -> "ResidualInfoHost":
        return ResidualInfoHost(
            all=ResidualItemHost(
                num_obs=int(info.all.num_obs),
                error=float(info.all.error),
                residual_sum=float(info.all.residual_sum),
            ),
            valid=ResidualItemHost(
                num_obs=int(info.valid.num_obs),
                error=float(info.valid.error),
                residual_sum=float(info.valid.residual_sum),
            ),
            is_numerically_valid=bool(info.is_numerically_valid),
        )

    def compared_to(self, prev: "ResidualInfoHost") -> "ResidualInfoHost":
        return ResidualInfoHost(
            all=self.all.compared_to(prev.all),
            valid=self.valid.compared_to(prev.valid),
            is_numerically_valid=self.is_numerically_valid,
        )


def error_summary_oneline(ri: ResidualInfoHost, valid_first: bool) -> str:
    def one(item: ResidualItemHost, name: str) -> str:
        return (f"{name}: {item.error:.8e} (mean res: "
                f"{item.residual_mean:.2f}, num: {item.num_obs})")

    warning = "" if ri.is_numerically_valid else "[num-failure] "
    if valid_first:
        return (warning + one(ri.valid, "error valid") + ", "
                + one(ri.all, "error"))
    return warning + one(ri.all, "error") + ", " + one(ri.valid,
                                                       "error valid")


# termination types (mirror solver_summary.hpp TerminationType)
CONVERGENCE = "CONVERGENCE"
NO_CONVERGENCE = "NO_CONVERGENCE"
FAILURE = "FAILURE"
USER_SUCCESS = "USER_SUCCESS"
USER_FAILURE = "USER_FAILURE"


@dataclass
class IterationSummary:
    """Per-iteration record (reference solver_summary.hpp IterationSummary
    and ba_log.hpp BaIteration timing fields)."""

    iteration: int = 0
    step_is_valid: bool = True
    step_is_successful: bool = True
    cost: ResidualInfoHost = field(default_factory=ResidualInfoHost)
    cost_change: ResidualInfoHost = field(default_factory=ResidualInfoHost)
    gradient_max_norm: float = 0.0
    step_norm: float = 0.0
    relative_decrease: float = 0.0
    trust_region_radius: float = 0.0
    linear_solver_iterations: int = 0
    linear_solver_message: str = ""
    linear_solver_type: str = ""
    iteration_time_in_seconds: float = 0.0
    cumulative_time_in_seconds: float = 0.0

    # stage timings (reference ba_log.hpp:205-231)
    step_solver_time_in_seconds: float = 0.0
    residual_evaluation_time_in_seconds: float = 0.0
    jacobian_evaluation_time_in_seconds: float = 0.0
    scale_landmark_jacobian_time_in_seconds: float = 0.0
    scale_pose_jacobian_time_in_seconds: float = 0.0
    landmark_damping_time_in_seconds: float = 0.0
    compute_preconditioner_time_in_seconds: float = 0.0
    compute_gradient_time_in_seconds: float = 0.0
    prepare_time_in_seconds: float = 0.0
    solve_reduced_system_time_in_seconds: float = 0.0
    perform_qr_time_in_seconds: float = 0.0
    stage1_time_in_seconds: float = 0.0
    stage2_time_in_seconds: float = 0.0
    back_substitution_time_in_seconds: float = 0.0
    update_cameras_time_in_seconds: float = 0.0

    resident_memory: int = 0
    resident_memory_peak: int = 0

    # True when the stage timings above were ATTRIBUTED from a fused
    # dispatch's total using the most recent measured calibration pass,
    # rather than each measured on its own dispatch (TPU addition: the
    # reference measures every stage on the host,
    # bal_bundle_adjustment.cpp:56-154; a fused device program has no
    # per-stage host timer boundaries)
    timing_attributed: bool = False


@dataclass
class SolverSummary:
    """Reference solver_summary.hpp SolverSummary."""

    termination_type: str = NO_CONVERGENCE
    message: str = ""
    solver_type: str = ""
    initial_cost: ResidualInfoHost = field(default_factory=ResidualInfoHost)
    final_cost: ResidualInfoHost = field(default_factory=ResidualInfoHost)
    iterations: List[IterationSummary] = field(default_factory=list)

    num_successful_steps: int = 0
    num_unsuccessful_steps: int = 0
    num_linear_solves: int = 0
    num_residual_evaluations: int = 0
    num_jacobian_evaluations: int = 0

    preprocessor_time_in_seconds: float = 0.0
    minimizer_time_in_seconds: float = 0.0
    postprocessor_time_in_seconds: float = 0.0
    total_time_in_seconds: float = 0.0
    linear_solver_time_in_seconds: float = 0.0
    residual_evaluation_time_in_seconds: float = 0.0
    jacobian_evaluation_time_in_seconds: float = 0.0
    logging_time_in_seconds: float = 0.0

    num_threads_given: int = 0
    num_threads_used: int = 0
    num_threads_available: int = 0
    resident_memory_peak: int = 0


def finish_iteration(summary: SolverSummary, it: IterationSummary):
    """Reference bal_bundle_adjustment.cpp:56-88 finish_iteration."""
    it.step_solver_time_in_seconds = (
        it.scale_landmark_jacobian_time_in_seconds
        + it.perform_qr_time_in_seconds
        + it.stage2_time_in_seconds
        + it.solve_reduced_system_time_in_seconds
        + it.back_substitution_time_in_seconds
    )
    if it.iteration > 0 and summary.iterations:
        it.cost_change = it.cost.compared_to(summary.iterations[-1].cost)
    try:
        import resource

        usage = resource.getrusage(resource.RUSAGE_SELF)
        it.resident_memory_peak = usage.ru_maxrss * 1024
        it.resident_memory = usage.ru_maxrss * 1024
    except Exception:
        pass
    summary.iterations.append(it)


def finish_solve(summary: SolverSummary, solver_type_name: str):
    """Reference bal_bundle_adjustment.cpp:92-154 finish_solve."""
    summary.solver_type = solver_type_name
    if summary.iterations:
        summary.initial_cost = summary.iterations[0].cost
        for it in reversed(summary.iterations):
            if it.step_is_successful:
                summary.final_cost = it.cost
                break
    summary.num_successful_steps = -1  # iteration 0 doesn't count
    summary.num_unsuccessful_steps = 0
    for it in summary.iterations:
        if it.step_is_successful:
            summary.num_successful_steps += 1
        else:
            summary.num_unsuccessful_steps += 1
    summary.linear_solver_time_in_seconds = sum(
        it.step_solver_time_in_seconds for it in summary.iterations)
    summary.residual_evaluation_time_in_seconds = sum(
        it.residual_evaluation_time_in_seconds for it in summary.iterations)
    summary.jacobian_evaluation_time_in_seconds = sum(
        it.jacobian_evaluation_time_in_seconds for it in summary.iterations)
    try:
        import resource

        summary.resident_memory_peak = (
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024)
    except Exception:
        pass
    import os

    summary.num_threads_available = os.cpu_count() or 1
