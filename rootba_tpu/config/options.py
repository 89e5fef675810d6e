"""Reflection-based options framework (TPU-native analog of rootba's
VisitableOptions, reference src/rootba/options/visitable_options.hpp).

Python dataclasses with field metadata play the role of the
VISITABLE_META macro: every leaf field carries default / help / range /
enum information that the TOML loader, the --dump-config printer and the
auto-generated CLI (rootba_tpu/cli) all visit generically.
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Tuple, Type


def opt(default, help="", range=None, logscale=False, choices=None):
    """Declare an option leaf (analog of VISITABLE_META)."""
    meta = {"help": help, "range": range, "logscale": logscale,
            "choices": choices}
    if callable(default) and not isinstance(default, type):
        return field(default_factory=default, metadata=meta)
    if isinstance(default, (list, dict)):
        return field(default_factory=lambda: default.copy(), metadata=meta)
    return field(default=default, metadata=meta)


def suboptions(cls):
    """Declare a nested options struct."""
    return field(default_factory=cls, metadata={"nested": True})


# ---------------------------------------------------------------------------
# enums (string round-trip like wise_enum)
# ---------------------------------------------------------------------------

class StrEnum(str, enum.Enum):
    """String enum with reference-compatible (wise_enum) names."""

    def __str__(self) -> str:  # noqa: DunderStr
        return self.value

    @classmethod
    def parse(cls, s: str):
        try:
            return cls(str(s).upper())
        except ValueError:
            valid = ", ".join(m.value for m in cls)
            raise ValueError(
                f"invalid value {s!r} for {cls.__name__}; valid: {valid}"
            ) from None


class DatasetType(StrEnum):
    AUTO = "AUTO"
    ROOTBA = "ROOTBA"
    BAL = "BAL"
    BUNDLER = "BUNDLER"


class RobustNorm(StrEnum):
    NONE = "NONE"
    HUBER = "HUBER"


class SolverType(StrEnum):
    SQUARE_ROOT = "SQUARE_ROOT"
    SCHUR_COMPLEMENT = "SCHUR_COMPLEMENT"
    POWER_SCHUR_COMPLEMENT = "POWER_SCHUR_COMPLEMENT"
    # external-baseline path (scipy stands in for the reference's Ceres)
    CERES = "CERES"


class PreconditionerType(StrEnum):
    IDENTITY = "IDENTITY"
    DIAGONAL = "DIAGONAL"
    JACOBI = "JACOBI"
    SCHUR_JACOBI = "SCHUR_JACOBI"
    POWER_SCHUR_COMPLEMENT = "POWER_SCHUR_COMPLEMENT"


class OptimizedCost(StrEnum):
    ERROR = "ERROR"
    ERROR_VALID = "ERROR_VALID"
    ERROR_VALID_AVG = "ERROR_VALID_AVG"


# ---------------------------------------------------------------------------
# options structs (defaults mirror the reference's)
# ---------------------------------------------------------------------------

@dataclass
class BalResidualOptions:
    """Reference: src/rootba/bal/bal_residual_options.hpp:44-65."""

    robust_norm: RobustNorm = opt(
        RobustNorm.NONE, help="robust norm: None (squared) or Huber")
    huber_parameter: float = opt(
        1.0, help="huber parameter in pixels", range=(0, 10))


@dataclass
class BaLogOptions:
    """Reference: src/rootba/bal/ba_log_options.hpp:43-60."""

    log_path: str = opt("ba_log.json", help="path of BA log file")
    save_log_flags: List[str] = opt(
        lambda: ["JSON"], help="log file types to save: JSON and/or UBJSON")
    disable_all: bool = opt(False, help="don't log anything")


@dataclass
class BalDatasetOptions:
    """Reference: src/rootba/bal/bal_dataset_options.hpp:44-95."""

    input: str = opt("", help="input dataset file to load")
    input_type: DatasetType = opt(
        DatasetType.AUTO, help="type of dataset to load")
    save_output: bool = opt(False, help="save optimization result")
    output_optimized_path: str = opt(
        "optimized.npz", help="output file for optimized problem")
    normalize: bool = opt(
        True, help="normalize scale and global position of the BA map")
    normalization_scale: float = opt(100.0)
    rotation_sigma: float = opt(
        0.0, help="stddev of camera rotation perturbation")
    translation_sigma: float = opt(
        0.0, help="stddev of camera translation perturbation")
    point_sigma: float = opt(0.0, help="stddev of point perturbation")
    random_seed: int = opt(
        38401, help="seed for the perturbation RNG; negative = random device")
    init_depth_threshold: float = opt(
        0.0, help="filter observations closer than this after load (0 = off)")
    quiet: bool = opt(False, help="skip INFO output when loading data")


@dataclass
class SolverOptions:
    """Reference: src/rootba/bal/solver_options.hpp:46-283."""

    solver_type: SolverType = opt(
        SolverType.SQUARE_ROOT,
        help="SquareRoot | SchurComplement | PowerSchurComplement")
    verbosity_level: int = opt(2, help="0 silent, 1 brief, 2 full",
                               range=(0, 2))
    debug: bool = opt(False, help="print extra debug info")
    num_threads: int = opt(
        0, help="host thread hint (0 = auto); XLA manages device parallelism")

    residual: BalResidualOptions = suboptions(BalResidualOptions)
    log: BaLogOptions = suboptions(BaLogOptions)

    optimized_cost: OptimizedCost = opt(
        OptimizedCost.ERROR,
        help="cost used for the LM decrease check: Error | ErrorValid | "
             "ErrorValidAvg")

    max_num_iterations: int = opt(20, help="max LM iterations",
                                  range=(0, 10000))
    min_relative_decrease: float = opt(0.0)
    initial_trust_region_radius: float = opt(1e4, logscale=True)
    min_trust_region_radius: float = opt(1e-32, logscale=True)
    max_trust_region_radius: float = opt(1e16, logscale=True)
    min_lm_diagonal: float = opt(
        1e-6, logscale=True,
        help="CERES baseline only (like the reference: manual solvers "
             "ignore it, ceres/option_utils.cpp:97-98)")
    max_lm_diagonal: float = opt(
        1e32, logscale=True,
        help="CERES baseline only (like the reference)")
    min_linear_solver_iterations: int = opt(0)
    max_linear_solver_iterations: int = opt(500)
    eta: float = opt(1e-1, help="CG forcing-sequence / q-tolerance")
    jacobi_scaling: bool = opt(True)
    jacobi_scaling_epsilon: float = opt(
        0.0, help="0 means sqrt(machine eps) for the active dtype")
    preconditioner_type: PreconditionerType = opt(
        PreconditionerType.SCHUR_JACOBI)
    function_tolerance: float = opt(1e-6)
    gradient_tolerance: float = opt(
        0.0, help="CERES baseline termination (gtol); the manual "
                  "solvers use function_tolerance only, like the "
                  "reference optimize_lm_ours")
    parameter_tolerance: float = opt(
        0.0, help="CERES baseline termination (xtol); manual solvers "
                  "ignore it, like the reference")
    baseline_method: str = opt(
        "trf", help="CERES-baseline backend: 'trf' (scipy "
                    "least_squares trust-region-reflective; final-cost "
                    "cross-checks) or 'lm' (plain-numpy LM running the "
                    "reference's exact lambda/nu/rho protocol with "
                    "dense Schur-complement normal equations; "
                    "step-comparable per-iteration trajectories)")

    use_double: bool = opt(
        True, help="use float64 (CPU / emulated on TPU) instead of float32")
    use_householder_marginalization: bool = opt(
        True, help="accepted but inert on TPU: the sqrt solver always "
                   "uses batched Householder-QR projection")
    staged_execution: bool = opt(
        True, help="accepted but inert on TPU: stages are always fused")
    reduction_alg: int = opt(
        1, help="accepted but inert on TPU: always segment-sum")
    power_order: int = opt(
        10, help="max inner iterations of Power SC preconditioner/solver")
    initial_vee: float = opt(2.0)
    vee_factor: float = opt(2.0)

    # --- TPU-native additions ------------------------------------------------
    kernel_layout: str = opt(
        "flat", help="'flat' (default) uses one [O,2,9]-style per-obs "
                     "array per quantity concatenated across buckets; "
                     "'einsum' uses per-bucket [L,n,2,9] batched tensors "
                     "(used automatically for multi-device meshes)")
    lm_loop: str = opt(
        "auto", help="'fused' runs the whole LM minimization as one "
                     "device program (fast; per-iteration timings are "
                     "attributed from the total); 'host' drives each "
                     "stage from the host like the reference C++ "
                     "(accurate stage timings, slower on high-latency "
                     "device links); 'auto' picks fused below "
                     "fused_obs_threshold observations and host above "
                     "(one mega-program at multi-million-obs scale "
                     "overwhelms the XLA compile step)")
    fused_obs_threshold: int = opt(
        2_000_000, help="problem size (total observations) above which "
                        "lm_loop='auto' switches from the fused device "
                        "loop to host-driven stages")
    host_fused_attempt: bool = opt(
        True, help="host LM loop: run solve+apply+error as ONE device "
                   "dispatch per backtracking attempt (3x fewer "
                   "host<->device round trips per LM iteration; "
                   "per-stage times are then attributed from the "
                   "attempt total using measured calibration "
                   "fractions and flagged timing_attributed in the "
                   "log). Disable for exact per-stage timing on every "
                   "iteration")
    timing_calibration_interval: int = opt(
        8, help="host LM loop with host_fused_attempt: every this many "
                "attempts, run the stages as separate measured "
                "dispatches to calibrate the per-stage time fractions "
                "used to attribute the fused attempts' totals "
                "(0 disables calibration)")
    defer_stage_sync: bool = opt(
        True, help="host LM loop with host_fused_attempt: pipeline the "
                   "stage1/stage2/attempt dispatches without "
                   "intermediate host syncs (each saves one tunnel "
                   "round trip per LM iteration; ~25-50 ms each on a "
                   "tunneled TPU). Per-stage times then come only from "
                   "the periodic calibration attempts; numerical-"
                   "failure checks move to the attempt sync. Set false "
                   "to sync and time every stage dispatch separately")
    timing_mode: str = opt(
        "fast", help="'fast' (default): fused attempt dispatches with "
                     "attributed per-stage times (timing_attributed in "
                     "the log); 'measured': every stage runs as its "
                     "own synced dispatch so all ~14 per-iteration "
                     "timing fields are real measured spans like the "
                     "reference's (ba_log.hpp:205-231) at the cost of "
                     "~4 extra host round trips per LM iteration "
                     "(shorthand for host lm_loop + "
                     "timing_calibration_interval=1 + "
                     "defer_stage_sync=false)")
    num_devices: int = opt(
        0, help="number of devices to shard landmark blocks over (0 = all)")
    checkpoint_path: str = opt(
        "", help="mid-solve checkpoint file (npz); if it exists, the "
                 "host-loop LM driver resumes from it (same solver "
                 "config required). Empty disables checkpointing. The "
                 "fused device loop does not checkpoint (it is for "
                 "small/fast problems); use lm_loop=host for "
                 "checkpointed runs")
    checkpoint_interval: int = opt(
        0, help="write the checkpoint every this many LM iterations "
                "(0 = only resume, never write)")
    dense_rcs_max_cameras: int = opt(
        2048, help="explicit-RCS dense/block-sparse crossover: "
                   "materialize the RCS as one dense [9N, 9N] matrix "
                   "when num_cameras <= this (the PCG matvec is a "
                   "single MXU GEMV); above it, assemble block-sparsely "
                   "(unique camera pairs, CSR gather-reduce matvec). "
                   "r5: raised 1024 -> 2048 -- at the clustered "
                   "venice twin's 55% pair density the BSR matvec's "
                   "per-slot x-row gathers (2.1M/iteration) cost ~4x "
                   "the 1.02 GB dense GEMV stream; dense wins "
                   "whenever the [9N,9N] table fits HBM comfortably. "
                   "0 disables both explicit modes")
    pair_gather: str = opt(
        "stream", help="explicit-RCS pair-product gather formulation: "
                       "'stream' (default, r5) tiles every pair slot "
                       "into per-bucket sub-streams of camera-sorted "
                       "landmarks, gathers from bounded sub-tables in "
                       "the fast small-source regime and folds runs "
                       "via one segment-sum -- cost O(slots) "
                       "regardless of covisibility regularity; "
                       "'strips' (r4) groups slots by within-landmark "
                       "pattern, which degrades on irregular/clustered "
                       "structure (a wide bucket has n(n-1)/2 "
                       "patterns) and is kept for comparison; 'obs' "
                       "gathers the two per-observation rows from the "
                       "flat [O,27] strip (simpler, slower at "
                       ">1M-observation scale)")
    pallas_cg: str = opt(
        "auto", help="run the whole dense-RCS PCG loop as one Pallas "
                     "kernel with the system resident in VMEM "
                     "('auto': when the padded dense system fits "
                     "on-chip, float32, explicit RCS mode; 'off' "
                     "disables; 'on' forces where applicable)")
    sqrt_rcs_mode: str = opt(
        "auto", help="SQUARE_ROOT solver CG operator: 'implicit' "
                     "applies (Q2'Jp)'(Q2'Jp) matrix-free per CG "
                     "iteration (the reference's only mode, two O-sized "
                     "row gathers per iteration); 'dense' assembles the "
                     "reduced camera system explicitly once per stage2 "
                     "and runs CG as dense GEMVs (~47x faster per CG "
                     "iteration at trafalgar scale); 'bsr' assembles "
                     "the same system block-sparsely (unique camera "
                     "pairs only) and applies it by CSR gather-reduce "
                     "-- for camera counts whose dense [9N,9N] matrix "
                     "exceeds HBM (final-13682: 60 GB dense vs ~170 MB "
                     "of blocks); 'auto' picks dense on a single device "
                     "when num_cameras <= dense_rcs_max_cameras, bsr "
                     "above, implicit under a mesh or forced-JACOBI")
    strip_min_group: int = opt(
        -1, help="strips pair/camera gather: within-landmark patterns "
                 "with fewer slots than this route through a "
                 "per-observation leftover stream instead of their own "
                 "strip group. 0 = no leftover stream; every pattern "
                 "is a strip group and all strip tables are built per "
                 "bucket, which bounds the flat [O, F<128] row-major "
                 "intermediates whose lane padding OOMs HBM at "
                 "final-13682 scale (17.2 GB for [29M, 9]) -- but "
                 "drowns small/mid problems in thousands of tiny "
                 "gathers (11x steady-state at trafalgar). -1 "
                 "(default) = auto: leftover stream (16384) below "
                 "strip_auto_obs_threshold observations, per-bucket "
                 "strips (0) above")
    strip_auto_obs_threshold: int = opt(
        4_000_000, help="observation count above which "
                        "strip_min_group=-1 (auto) switches from the "
                        "leftover-stream routing to all-per-bucket "
                        "strip tables. Below: thousands of tiny "
                        "per-pattern gathers cost more than the flat "
                        "tables (trafalgar 2.5x). Above: building + "
                        "gathering the flat [O, 27] W strip dominates "
                        "(venice: ~180 ms/attempt) and its lane "
                        "padding OOMs HBM at final-13682 (17.2 GB)")
    compensated_accumulation: bool = opt(
        True, help="f32 mode: accumulate the CG dot products and the "
                   "model-cost decrease l_diff with error-free "
                   "transforms (double-float carry, ops/compensated.py)"
                   " -- the sums that cancel catastrophically at "
                   "multi-million-observation scale and distort the "
                   "rho step-acceptance test. No effect under "
                   "use_double; the VMEM Pallas CG kernel keeps plain "
                   "f32 dots (small on-chip systems)")
    bsr_pack_max_gb: float = opt(
        4.0, help="BSR CG: pack the run-major block table (a full "
                  "second copy of the [2P, 81] RCS blocks) only while "
                  "it stays under this many GB -- 3.5x faster CG "
                  "iterations at venice scale, an HBM OOM at "
                  "final-13682's clustered pair density. Above the "
                  "budget the matvec gathers blocks per iteration")
    bucket_pow2_from: int = opt(
        9, help="bucket obs-counts exactly up to this, then pad to pow2 "
               "(mirrors the reference's static-size landmark blocks 2..8, "
               "landmark_block.cpp:48-83)")

    def __post_init__(self):
        # free-form string options: a typo must error, not silently
        # fall back to default behavior
        allowed = {"baseline_method": ("trf", "lm"),
                   "timing_mode": ("fast", "measured"),
                   "lm_loop": ("auto", "fused", "host")}
        for name, values in allowed.items():
            v = getattr(self, name, None)
            if v is not None and v not in values:
                raise ValueError(
                    f"solver option '{name}={v!r}' is not one of "
                    f"{values}")

    def use_projection_validity_check(self) -> bool:
        return self.optimized_cost != OptimizedCost.ERROR

    def warn_inert_knobs(self) -> None:
        """One-line warning per parity knob set to a non-default value
        that the TPU manual solvers do not act on (matches the options
        framework's unused-key discipline; the reference maps
        min/max_lm_diagonal to Ceres only, option_utils.cpp:96-97)."""
        import warnings

        inert = [
            ("use_householder_marginalization",
             self.use_householder_marginalization, True),
            ("staged_execution", self.staged_execution, True),
            ("reduction_alg", self.reduction_alg, 1),
            ("min_lm_diagonal", self.min_lm_diagonal, 1e-6),
            ("max_lm_diagonal", self.max_lm_diagonal, 1e32),
        ]
        for name, value, default in inert:
            if value != default:
                warnings.warn(
                    f"solver option '{name}={value}' is accepted but "
                    f"inert on TPU (CERES baseline only for "
                    f"min/max_lm_diagonal)", stacklevel=3)

    def effective_timing(self):
        """(calibration_interval, defer_stage_sync) after resolving
        timing_mode: 'measured' forces per-iteration calibration with
        synced stage dispatches so every timing field is a real span."""
        if self.timing_mode == "measured":
            return 1, False
        return self.timing_calibration_interval, self.defer_stage_sync

    def effective_strip_min_group(self, num_observations: int) -> int:
        """Resolve strip_min_group=-1 (auto) by problem size: the
        leftover-stream routing (16384) is 2.5-11x faster below
        final-13682 scale, the all-strips routing (0) is what keeps
        the per-obs flat intermediates out of HBM above it."""
        if self.strip_min_group >= 0:
            return self.strip_min_group
        return (16384 if num_observations <= self.strip_auto_obs_threshold
                else 0)


@dataclass
class BalAppOptions:
    """Aggregate app options (reference bal_app_options.hpp:44-53)."""

    dataset: BalDatasetOptions = suboptions(BalDatasetOptions)
    solver: SolverOptions = suboptions(SolverOptions)


# ---------------------------------------------------------------------------
# generic visitation: dict <-> dataclass, TOML, flat CLI leaves
# ---------------------------------------------------------------------------

def to_dict(obj) -> Dict[str, Any]:
    out = {}
    for f in fields(obj):
        v = getattr(obj, f.name)
        if is_dataclass(v):
            out[f.name] = to_dict(v)
        elif isinstance(v, StrEnum):
            out[f.name] = str(v)
        else:
            out[f.name] = v
    return out


def _convert(value, typ, path):
    if isinstance(typ, type) and issubclass(typ, StrEnum):
        if isinstance(value, typ):
            return value
        return typ.parse(str(value))
    if typ is float and isinstance(value, (int, float)):
        return float(value)
    if typ is int:
        if isinstance(value, bool) or not isinstance(value, int):
            raise ValueError(f"option {path}: expected int, got {value!r}")
        return value
    if typ is bool and not isinstance(value, bool):
        raise ValueError(f"option {path}: expected bool, got {value!r}")
    return value


def update_from_dict(obj, d: Dict[str, Any], path="", unknown=None):
    """In-place update from a (possibly partial) nested dict.

    Collects unknown keys like the reference's unused-key detection
    (options_interface.cpp:86-170).
    """
    hints = {f.name: f for f in fields(obj)}
    for k, v in d.items():
        p = f"{path}.{k}" if path else k
        if k not in hints:
            if unknown is not None:
                unknown.append(p)
            continue
        f = hints[k]
        cur = getattr(obj, k)
        if is_dataclass(cur):
            if not isinstance(v, dict):
                raise ValueError(f"option {p}: expected table/dict")
            update_from_dict(cur, v, p, unknown)
        else:
            setattr(obj, k, _convert(v, type(cur) if not isinstance(cur, StrEnum) else type(cur), p))
    return obj


def iter_leaves(obj, prefix=""):
    """Yield (dotted_path, field, owner) for every leaf option."""
    for f in fields(obj):
        v = getattr(obj, f.name)
        p = f"{prefix}.{f.name}" if prefix else f.name
        if is_dataclass(v):
            yield from iter_leaves(v, p)
        else:
            yield p, f, obj


def load_toml(path: str):
    import tomllib

    with open(path, "rb") as fp:
        return tomllib.load(fp)


def dump_toml(obj, fp=None):
    """Dump options as TOML text (simple writer, no external deps)."""
    lines: List[str] = []

    def fmt(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int,)):
            return str(v)
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, StrEnum):
            return f'"{v}"'
        if isinstance(v, str):
            return f'"{v}"'
        if isinstance(v, list):
            return "[" + ", ".join(fmt(x) for x in v) + "]"
        raise TypeError(f"cannot dump {type(v)}")

    def walk(o, prefix):
        scalars = []
        nested = []
        for f in fields(o):
            v = getattr(o, f.name)
            if is_dataclass(v):
                nested.append((f.name, v))
            else:
                scalars.append((f.name, v))
        if prefix:
            lines.append(f"[{prefix}]")
        for name, v in scalars:
            lines.append(f"{name} = {fmt(v)}")
        lines.append("")
        for name, v in nested:
            walk(v, f"{prefix}.{name}" if prefix else name)

    walk(obj, "")
    text = "\n".join(lines)
    if fp is not None:
        fp.write(text)
    return text
