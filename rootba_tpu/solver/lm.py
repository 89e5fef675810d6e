"""Levenberg-Marquardt driver and the Linearizer facade.

Control flow is a faithful re-implementation of the reference minimizer
optimize_lm_ours (solver/bal_bundle_adjustment.cpp:249-544): outer loop
per linearization point, inner backtracking loop reusing the
linearization with increasing lambda, trust-region update
lambda *= max(1/3, 1-(2 rho-1)^3) on success and lambda *= vee on
reject, NaN-increment / invalid-cost handling, and termination on
function tolerance, lambda > lambda_max, or iteration cap.

The linearizers compile their stages with jit; the driver is host-side
orchestration holding the functional device state (CamState + per-bucket
landmark positions). backup()/restore() becomes keeping the previous
pytree (reference bal_problem.cpp:590-608 copies state instead).
"""

from __future__ import annotations

import math
import os
import time
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
from rootba_tpu.utils.jax_setup import sync
import jax.numpy as jnp
import numpy as np

from rootba_tpu.bal.bucketing import BucketedProblem, bucketize, scatter_landmarks
from rootba_tpu.bal.problem import BalProblem, PipelineTimingSummary
from rootba_tpu.config.options import (
    OptimizedCost,
    PreconditionerType,
    RobustNorm,
    SolverOptions,
    SolverType,
)
from rootba_tpu.core import lie
from rootba_tpu.log.summary import (
    CONVERGENCE,
    NO_CONVERGENCE,
    IterationSummary,
    ResidualInfoHost,
    SolverSummary,
    error_summary_oneline,
    finish_iteration,
    finish_solve,
)
from rootba_tpu.solver import sqrt_qr
from rootba_tpu.solver.cg import pcg
from rootba_tpu.solver.linearization import (
    POSE_SIZE,
    BucketIndex,
    CamState,
    compute_error_buckets,
    jp_diag2,
    linearize_bucket,
    scale_jl_cols,
    scale_jp_cols,
)


class BAState(NamedTuple):
    cams: CamState
    lm_ps: Tuple[jnp.ndarray, ...]


def _sophus_eps_sqrt(dtype) -> float:
    """Sophus::Constants<Scalar>::epsilonSqrt() as used by
    get_effective_jacobi_scaling_epsilon (linearizor_base.cpp:73-79)."""
    return 1e-5 if jnp.dtype(dtype).itemsize >= 8 else math.sqrt(1e-5)


def make_bucket_indices(bp: BucketedProblem, dtype) -> Tuple[BucketIndex, ...]:
    out = []
    for b in bp.buckets:
        out.append(BucketIndex(
            obs_uv=jnp.asarray(b.obs_uv, dtype),
            cam_idx=jnp.asarray(b.cam_idx, jnp.int32),
            mask=jnp.asarray(b.mask),
            lm_mask=jnp.asarray(b.lm_mask),
        ))
    return tuple(out)


def initial_state(bp: BucketedProblem, dtype) -> BAState:
    cams = CamState(
        q=jnp.asarray(bp.cam_q0, dtype),
        t=jnp.asarray(bp.cam_t0, dtype),
        intr=jnp.asarray(bp.cam_intr0, dtype),
    )
    lm_ps = tuple(jnp.asarray(p, dtype) for p in bp.lm_p0)
    return BAState(cams=cams, lm_ps=lm_ps)


class LinearizerBase:
    """Facade shared by the three manual solvers (reference
    solver/linearizor.hpp:47-83).

    Subclass contract (_build must set these):
      error_pure(consts, cams, lm_ps) -> ResidualInfo
      stage1_pure(consts, cams, lm_ps) -> (lins, pose_scale, failures)
      stage2_pure(consts, lins, lam) -> aux   [per-lambda preparation:
          damping/RHS/preconditioner/assembly]
      lsolve_pure(consts, lins, aux) -> (inc, stage2, iters, term)
          [the reduced-system linear solve]
      apply_pure(consts, cams, lm_ps, lins, stage2, pose_scale, inc)
          -> (cams, lm_ps, l_diff)
    solve_pure is composed from stage2_pure + lsolve_pure by
    _finalize_build. The split exists so the host driver can time the
    preparation and the linear solve on separate dispatches (honest
    per-stage timings, reference ba_log.hpp:205-231 semantics) while
    the fused attempt / whole-solve drivers compose the pure stages
    into one program.
    """

    linear_solver_type = "?"
    # which ba_log field the stage2/prepare dispatch is timed into:
    # the QR solver logs it as stage2_time (linearizor_qr.cpp), the
    # SC/PoBA solvers as prepare_time (linearizor_sc.cpp)
    prepare_field = "stage2_time_in_seconds"

    def __init__(self, bp: BucketedProblem, options: SolverOptions, dtype,
                 mesh=None):
        self.options = options
        self.dtype = jnp.dtype(dtype)
        self.num_cameras = bp.num_cameras
        self.mesh = mesh
        self.buckets = make_bucket_indices(bp, self.dtype)
        # camera-CSR gather-reduce index (replaces segment_sum scatters;
        # see bucketing.CamCsr). Only on an unsharded single device: the
        # CSR gather crosses landmark shards, so mesh mode keeps
        # segment_sum, which GSPMD turns into local scatters + psum.
        # lazy: built on first access (the strips+BSR configurations
        # assign self.cam_csr = None before touching it, skipping the
        # ~21 s host-side CamCsr build at final-13682 scale)
        self._cam_csr_cache = None
        self._cam_csr_enabled = (mesh is None
                                 and options.reduction_alg != 0)
        self._bp_for_csr = bp
        if mesh is not None:
            from rootba_tpu.parallel.mesh import shard_bucket_index

            self.buckets = tuple(
                shard_bucket_index(b, mesh) for b in self.buckets)
        # Static per-problem tensors (bucket indices, sparsity structures)
        # are passed to every jitted stage as a runtime argument: closing
        # over them would embed them as HLO constants, which at
        # venice/final scale means 100s of MB of literals in the program
        # (OOM-killing the compile server). Subclasses may extend this in
        # _build().
        self.consts = self.buckets
        self.bp = bp  # host-side structure (sparsity builders need it)
        self.robust_norm = (1 if options.residual.robust_norm
                            == RobustNorm.HUBER else 0)
        self.huber = float(options.residual.huber_parameter)
        eps = options.jacobi_scaling_epsilon
        self.jacobi_eps = float(eps) if eps > 0 else _sophus_eps_sqrt(dtype)
        # compensated f32 accumulation for the cancellation-prone sums
        # (CG dots, l_diff; SURVEY §7.6); f64 needs no compensation
        self.compensated = (bool(options.compensated_accumulation)
                            and self.dtype == jnp.dtype(jnp.float32))
        self.it_summary: Optional[IterationSummary] = None
        self.summary: Optional[SolverSummary] = None
        self._attempt_idx = -1
        # deferred stage1 failure count (device scalar) when the
        # linearize dispatch was not synced (defer_stage_sync); checked
        # at the next attempt/solve sync
        self._pending_failures = None
        # True when a deferred (un-synced) linearize dispatch's device
        # time will land in the next fused attempt's measured wall
        # time -- that attempt then includes 'stage1' in its
        # attributed-split keys instead of silently folding jacobian
        # time into prepare/lsolve/bsub/err (ADVICE r3)
        self._stage1_rides_attempt = False
        # fused-attempt starting mode: the one-dispatch attempt program
        # is the same scale as the fused-loop body, so the same obs
        # threshold applies -- above it the compile service gets
        # SIGKILLed after minutes (measured at venice, 5M obs). Start
        # in the two-dispatch 'half' split there; runtime degradation
        # (attempt()) still handles the remaining failure modes.
        self._attempt_mode = (
            "full" if bp.num_observations <= options.fused_obs_threshold
            else "half")
        # measured stage fractions of a fused attempt dispatch, updated
        # by each calibration pass (keys: prepare, lsolve, bsub, err)
        self._timing_fracs: Optional[dict] = None
        self._build()
        self._finalize_build()

    def _scalar(self, v):
        """Device scalar for jit inputs. Multi-process meshes require
        globally-consistent replicated arrays (not per-process
        single-device ones)."""
        if self.mesh is not None and jax.process_count() > 1:
            from rootba_tpu.parallel.mesh import put_sharded, replicated

            return put_sharded(np.asarray(v, self.dtype),
                               replicated(self.mesh))
        return jnp.asarray(v, self.dtype)

    def _finalize_build(self):
        """Compose solve_pure and jit all stage functions."""
        stage2_pure = self.stage2_pure
        lsolve_pure = self.lsolve_pure

        def solve_pure(consts, lins, lam):
            return lsolve_pure(consts, lins, stage2_pure(consts, lins, lam))

        self.solve_pure = solve_pure
        self._error_fn = jax.jit(self.error_pure)
        self._stage1_fn = jax.jit(self.stage1_pure)
        self._stage2_fn = jax.jit(stage2_pure)
        self._lsolve_fn = jax.jit(lsolve_pure)
        self._apply_fn = jax.jit(self.apply_pure)

    # -- helpers -------------------------------------------------------
    def start_iteration(self, it_summary: IterationSummary):
        self.it_summary = it_summary

    def finish_iteration(self):
        pass

    def compute_error(self) -> ResidualInfoHost:
        t0 = time.monotonic()
        info = self._error_fn(self.consts, self.state.cams, self.state.lm_ps)
        info = sync(info)
        if self.it_summary is not None:
            self.it_summary.residual_evaluation_time_in_seconds += (
                time.monotonic() - t0)
        if self.summary is not None:
            self.summary.num_residual_evaluations += 1
        return ResidualInfoHost.from_device(info)

    def _stage1_common(self, buckets, cams, lm_ps, csr=None):
        """Linearize all buckets, jl scaling, pose jacobi scaling."""
        from rootba_tpu.solver.linearization import csr_cam_reduce

        lins = []
        diag2 = jnp.zeros((self.num_cameras, POSE_SIZE), self.dtype)
        diag2_rows = []
        failures = jnp.zeros((), jnp.int32)
        for lm_p, bucket in zip(lm_ps, buckets):
            lin, nfail = linearize_bucket(
                cams, lm_p, bucket, self.robust_norm, self.huber,
                self.options.use_projection_validity_check(),
                self.jacobi_eps)
            lin = scale_jl_cols(lin, self.jacobi_eps)
            if csr is not None:
                diag2_rows.append(
                    jnp.sum(lin.Jp * lin.Jp, axis=-2).reshape(-1, POSE_SIZE))
            else:
                diag2 = diag2 + jp_diag2(lin, bucket.cam_idx,
                                         self.num_cameras)
            failures = failures + nfail
            lins.append(lin)
        if csr is not None:
            diag2 = csr_cam_reduce(diag2_rows, csr, self.num_cameras)
        if self.options.jacobi_scaling:
            pose_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(diag2))
        else:
            pose_scale = jnp.ones_like(diag2)
        lins = tuple(
            scale_jp_cols(lin, bucket.cam_idx, pose_scale)
            for lin, bucket in zip(lins, buckets))
        return lins, pose_scale, failures

    # -- interface -----------------------------------------------------
    @property
    def cam_csr(self):
        if not self._cam_csr_enabled:
            return None
        if self._cam_csr_cache is None:
            from rootba_tpu.solver.linearization import CamCsrIndex

            host = self._bp_for_csr.cam_csr
            self._cam_csr_cache = CamCsrIndex(
                idx=jnp.asarray(host.idx),
                idx2=jnp.asarray(host.idx2))
        return self._cam_csr_cache

    @cam_csr.setter
    def cam_csr(self, v):
        if v is None:
            self._cam_csr_enabled = False
        else:
            self._cam_csr_cache = v
            self._cam_csr_enabled = True

    def set_state(self, state: BAState):
        self.state = state

    def attempt(self, lam: float):
        """One LM backtracking attempt -- solve(lam) + apply + error --
        as a single device dispatch (the host loop otherwise pays three
        sync'd round trips per attempt; on tunneled TPUs each costs
        ~0.1 s). Host keeps accept/reject control: returns
        (new_state, l_diff, ri2, inc_finite) and the caller decides
        whether to set_state(new_state).

        Composes the same pure stages the fused whole-solve driver uses
        (solver/fused_lm.py); semantics identical to separate
        solve/apply/compute_error calls.

        Timing: every timing_calibration_interval-th attempt runs the
        stages as separate measured dispatches (exact per-stage times);
        fused attempts split their measured total by the latest
        calibration's fractions and are flagged timing_attributed."""
        self._attempt_idx += 1
        interval = max(self.options.effective_timing()[0], 0)
        if interval and self._attempt_idx % interval == 0:
            return self._try_attempt(self._attempt_calibrated, lam)

        mode = getattr(self, "_attempt_mode", "full")
        if mode == "full":
            try:
                return self._try_attempt(self._attempt_full, lam)
            except jax.errors.JaxRuntimeError as e:
                # the one-dispatch program can exceed the compile
                # service's memory at very large problem sizes where
                # the separate stages still compile; degrade to a
                # two-dispatch split (stage2 | lsolve+apply+error).
                # Only capacity signals degrade -- a genuine numerical
                # runtime failure re-raises with its original cause
                # instead of silently rerouting through slower modes
                if not self._is_capacity_error(e):
                    raise
                self._attempt_mode = mode = "half"
                self._note_fallback("half", e)
        if mode == "half":
            try:
                return self._try_attempt(self._attempt_half, lam)
            except jax.errors.JaxRuntimeError as e:
                if not self._is_capacity_error(e):
                    raise
                self._attempt_mode = "separate"
                self._note_fallback("separate", e)
        return self._try_attempt(self._attempt_calibrated, lam)

    _TRANSIENT_ERRORS = ("response body closed", "read body",
                         "DEADLINE_EXCEEDED", "UNAVAILABLE",
                         "Connection reset", "Connection refused",
                         "Socket closed")

    # compile-size / device-capacity signals that justify degrading to
    # a smaller program split; anything else is a real failure
    _CAPACITY_ERRORS = ("RESOURCE_EXHAUSTED", "Out of memory",
                        "out of memory", "OOM", "oom",
                        "Attempting to allocate",
                        "exceeds the limit", "too large",
                        "Compilation failure", "INTERNAL: Compile",
                        "protobuf", "message size")

    @classmethod
    def _is_capacity_error(cls, e) -> bool:
        msg = str(e)
        return any(t in msg for t in cls._CAPACITY_ERRORS)

    def _try_attempt(self, fn, *args):
        """Run an attempt/stage dispatch, retrying ONCE on transient
        compile-service/transport errors -- a dropped remote-compile
        connection is not a program-too-big signal and must not
        permanently degrade the attempt mode (observed at final-13682:
        one 'response body closed' rerouted the whole run through the
        slow separate path)."""
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:
            msg = str(e)
            if not any(t in msg for t in self._TRANSIENT_ERRORS):
                raise
            print(f"[rootba_tpu] transient compile/transport error, "
                  f"retrying attempt once: "
                  f"{msg.splitlines()[0][:160]}", flush=True)
            return fn(*args)

    def _note_fallback(self, mode, e):
        # always surface the original cause: the catch treats any
        # JaxRuntimeError as "program too big", so a genuine runtime
        # numerical failure re-routes here first -- silently hiding
        # its message would mask the real diagnosis (VERDICT r3). The
        # degraded retry re-raises if the error was not compile-size.
        head = "; ".join(str(e).splitlines()[:2])[:300]
        print(f"[rootba_tpu] attempt fusion degraded to '{mode}' after "
              f"JaxRuntimeError: {head}", flush=True)

    def _attempt_timing(self, dt, cg_iters, cg_term, keys,
                        measured=None):
        """Split a fused dispatch's measured dt over stage fields by
        the latest calibration fractions (flagged attributed)."""
        if self.it_summary is None:
            return
        if self._timing_fracs is None:
            # no calibration has run (timing_calibration_interval=0 --
            # the default interval calibrates on the very FIRST
            # attempt, so this only happens when explicitly disabled):
            # leave the per-stage fields at 0 rather than fabricating a
            # split; the iteration still carries its measured total and
            # the attributed flag
            self.it_summary.timing_attributed = True
            self.it_summary.linear_solver_iterations = int(cg_iters)
            self.it_summary.linear_solver_message = (
                f"cg_term={int(cg_term)} iters={int(cg_iters)}")
            self.it_summary.linear_solver_type = self.linear_solver_type
            return
        f = self._timing_fracs
        sub = {k: f.get(k, 0.0) for k in keys}
        norm = sum(sub.values()) or 1.0
        fields = {
            "prepare": self.prepare_field,
            "lsolve": "solve_reduced_system_time_in_seconds",
            "bsub": "back_substitution_time_in_seconds",
            "stage1": "stage1_time_in_seconds",
        }
        for k in keys:
            v = dt * sub[k] / norm
            if k == "err":
                self.it_summary.residual_evaluation_time_in_seconds += v
            else:
                setattr(self.it_summary, fields[k], v)
            if k == "stage1":
                # the reference reports jacobian evaluation as the
                # stage1 body (linearizor_qr.cpp IF_SET spans)
                self.it_summary.jacobian_evaluation_time_in_seconds = v
        for k, v in (measured or {}).items():
            setattr(self.it_summary, fields[k], v)
        self.it_summary.timing_attributed = True
        self.it_summary.linear_solver_iterations = int(cg_iters)
        self.it_summary.linear_solver_message = (
            f"cg_term={int(cg_term)} iters={int(cg_iters)}")
        self.it_summary.linear_solver_type = self.linear_solver_type

    def _attempt_full(self, lam: float):
        if getattr(self, "_attempt_fn", None) is None:
            solve_pure = self.solve_pure
            apply_pure = self.apply_pure
            error_pure = self.error_pure

            def attempt_fn(consts, cams, lm_ps, lins, pose_scale, lam_):
                inc, stage2, cg_iters, cg_term = solve_pure(
                    consts, lins, lam_)
                inc_finite = jnp.all(jnp.isfinite(inc))
                safe_inc = jnp.where(inc_finite, inc,
                                     jnp.zeros_like(inc))
                cams2, lm_ps2, l_diff = apply_pure(
                    consts, cams, lm_ps, lins, stage2, pose_scale,
                    safe_inc)
                ri2 = error_pure(consts, cams2, lm_ps2)
                return (cams2, lm_ps2, l_diff, ri2, cg_iters, cg_term,
                        inc_finite)

            self._attempt_fn = jax.jit(attempt_fn)

        t0 = time.monotonic()
        lam_arr = self._scalar(lam)
        cams2, lm_ps2, l_diff, ri2, cg_iters, cg_term, inc_finite = sync(
            self._attempt_fn(self.consts, self.state.cams,
                             self.state.lm_ps, self._lins,
                             self._pose_scale, lam_arr))
        self._consume_failures()
        dt = time.monotonic() - t0
        keys = ("prepare", "lsolve", "bsub", "err")
        if self._stage1_rides_attempt:
            keys = ("stage1",) + keys
            self._stage1_rides_attempt = False
        self._attempt_timing(dt, cg_iters, cg_term, keys)
        if self.summary is not None:
            self.summary.num_linear_solves += 1
            self.summary.num_residual_evaluations += 1
        return (BAState(cams=cams2, lm_ps=lm_ps2), float(l_diff),
                ResidualInfoHost.from_device(ri2), bool(inc_finite))

    def _attempt_half(self, lam: float):
        """Two-dispatch attempt: stage2/prepare alone (often the
        compile-heaviest program section at scale), then
        lsolve+apply+error fused."""
        if getattr(self, "_attempt2_fn", None) is None:
            lsolve_pure = self.lsolve_pure
            apply_pure = self.apply_pure
            error_pure = self.error_pure

            def attempt2_fn(consts, cams, lm_ps, lins, pose_scale, aux):
                inc, stage2, cg_iters, cg_term = lsolve_pure(
                    consts, lins, aux)
                inc_finite = jnp.all(jnp.isfinite(inc))
                safe_inc = jnp.where(inc_finite, inc,
                                     jnp.zeros_like(inc))
                cams2, lm_ps2, l_diff = apply_pure(
                    consts, cams, lm_ps, lins, stage2, pose_scale,
                    safe_inc)
                ri2 = error_pure(consts, cams2, lm_ps2)
                return (cams2, lm_ps2, l_diff, ri2, cg_iters, cg_term,
                        inc_finite)

            self._attempt2_fn = jax.jit(attempt2_fn)

        t0 = time.monotonic()
        lam_arr = self._scalar(lam)
        defer = self._defer_sync(self._attempt_idx)
        aux = self._stage2_fn(self.consts, self._lins, lam_arr)
        if not defer:
            aux = sync(aux)
        t1 = time.monotonic()
        cams2, lm_ps2, l_diff, ri2, cg_iters, cg_term, inc_finite = sync(
            self._attempt2_fn(self.consts, self.state.cams,
                              self.state.lm_ps, self._lins,
                              self._pose_scale, aux))
        self._consume_failures()
        if defer:
            # stage2 + attempt pipelined as two un-synced dispatches:
            # attribute the combined wall time like the full mode
            keys = ("prepare", "lsolve", "bsub", "err")
            if self._stage1_rides_attempt:
                keys = ("stage1",) + keys
                self._stage1_rides_attempt = False
            self._attempt_timing(time.monotonic() - t0, cg_iters,
                                 cg_term, keys)
        else:
            self._attempt_timing(time.monotonic() - t1, cg_iters,
                                 cg_term, ("lsolve", "bsub", "err"),
                                 measured={"prepare": t1 - t0})
        if self.summary is not None:
            self.summary.num_linear_solves += 1
            self.summary.num_residual_evaluations += 1
        return (BAState(cams=cams2, lm_ps=lm_ps2), float(l_diff),
                ResidualInfoHost.from_device(ri2), bool(inc_finite))

    def _attempt_calibrated(self, lam: float):
        """attempt() semantics via separate measured dispatches; records
        the stage-time fractions used to attribute fused attempts.

        Exception-safe: the pre-attempt state is restored before any
        error propagates, so attempt()'s transient-retry wrapper can
        re-run this from the same linearization point (a dropped
        remote-compile connection during the stage2 compile killed a
        whole venice record otherwise)."""
        backup = self.state
        try:
            return self._attempt_calibrated_body(lam, backup)
        except Exception:
            self.set_state(backup)
            raise

    def _attempt_calibrated_body(self, lam: float, backup):
        inc = self.solve(lam)  # exact prepare + linear-solve timings
        inc_finite = bool(jnp.all(jnp.isfinite(inc)))
        if not inc_finite:
            inc = jnp.zeros_like(inc)
        new_state, l_diff = self.apply(inc)  # exact back-sub timing
        self.set_state(new_state)
        t_err0 = time.monotonic()
        ri2 = self.compute_error()
        t_err = time.monotonic() - t_err0
        self.set_state(backup)
        # a deferred linearize's device time (if any) rode into the
        # solve() sync above; don't let a later attempt claim it
        self._stage1_rides_attempt = False
        its = self.it_summary
        if its is not None:
            parts = {
                "prepare": getattr(its, self.prepare_field),
                "lsolve": its.solve_reduced_system_time_in_seconds,
                "bsub": its.back_substitution_time_in_seconds,
                "err": t_err,
            }
            total = sum(parts.values())
            if total > 0:
                fracs = {k: v / total for k, v in parts.items()}
                # stage1 fraction relative to the attempt body, from
                # this iteration's measured linearize span (calibration
                # iterations never defer it) -- used by fused attempts
                # that absorb a deferred linearize dispatch
                s1 = its.stage1_time_in_seconds
                if s1 > 0:
                    fracs["stage1"] = s1 / total
                self._timing_fracs = fracs
        return new_state, float(l_diff), ri2, inc_finite

    # -- host-driven stage dispatches (shared by all linearizers) ------
    def _defer_sync(self, upcoming_idx: int | None = None) -> bool:
        """True when stage dispatches should pipeline without
        intermediate host syncs (defer_stage_sync): per-stage timing
        then comes from the periodic calibration attempts, so don't
        defer right before one (the next attempt calibrates exactly
        when the attempt counter hits the interval).

        `upcoming_idx` is the index the attempt consuming this
        dispatch will have; callers that already incremented the
        counter (e.g. _attempt_half) pass the current index --
        defaulting to +1 would de-defer the attempt *preceding* a
        calibration instead (ADVICE r3)."""
        interval, defer = self.options.effective_timing()
        if not (defer and self.options.host_fused_attempt):
            return False
        if upcoming_idx is None:
            upcoming_idx = self._attempt_idx + 1
        interval = max(interval, 0)
        return not (interval and upcoming_idx % interval == 0)

    def _consume_failures(self):
        """Deferred stage1 numerical-failure check (the sync that would
        have read it was skipped; by the time any attempt result is
        synced the count is computed, so this read is free)."""
        if self._pending_failures is None:
            return
        failures = int(self._pending_failures)
        self._pending_failures = None
        if failures > 0:
            raise FloatingPointError(
                f"numerical failure during linearization "
                f"({failures} observations)")

    def linearize(self):
        # stage1's (large) compile also rides this dispatch; a dropped
        # remote-compile connection is retryable (linearize reads but
        # never mutates solver state)
        return self._try_attempt(self._linearize_impl)

    def _linearize_impl(self):
        t0 = time.monotonic()
        lins, pose_scale, failures = self._stage1_fn(
            self.consts, self.state.cams, self.state.lm_ps)
        if self._defer_sync():
            # no sync: the dispatch overlaps the following stage2 /
            # attempt submission and the failure check happens at
            # their sync (one tunnel round trip saved per iteration)
            self._pending_failures = failures
            self._stage1_rides_attempt = True
        else:
            sync(failures)
            if int(failures) > 0:
                raise FloatingPointError(
                    f"numerical failure during linearization "
                    f"({int(failures)} observations)")
            sync(lins)
            if self.it_summary is not None:
                self.it_summary.stage1_time_in_seconds = (
                    time.monotonic() - t0)
                self.it_summary.jacobian_evaluation_time_in_seconds = (
                    self.it_summary.stage1_time_in_seconds)
        self._lins = lins
        self._pose_scale = pose_scale
        if self.summary is not None:
            self.summary.num_jacobian_evaluations += 1

    def solve(self, lam: float) -> jnp.ndarray:
        """Two measured dispatches: stage2/prepare, then the linear
        solve (reference linearizor_qr.cpp:141-265 records them as
        separate timer spans)."""
        t0 = time.monotonic()
        lam_arr = self._scalar(lam)
        aux = sync(self._stage2_fn(self.consts, self._lins, lam_arr))
        self._consume_failures()
        t1 = time.monotonic()
        inc, stage2, cg_iters, cg_term = sync(
            self._lsolve_fn(self.consts, self._lins, aux))
        t2 = time.monotonic()
        self._stage2 = stage2
        if self.it_summary is not None:
            setattr(self.it_summary, self.prepare_field, t1 - t0)
            self.it_summary.solve_reduced_system_time_in_seconds = t2 - t1
            self.it_summary.linear_solver_iterations = int(cg_iters)
            self.it_summary.linear_solver_message = (
                f"cg_term={int(cg_term)} iters={int(cg_iters)}")
            self.it_summary.linear_solver_type = self.linear_solver_type
        if self.summary is not None:
            self.summary.num_linear_solves += 1
        return inc

    def apply(self, inc: jnp.ndarray) -> Tuple[BAState, float]:
        t0 = time.monotonic()
        cams, lm_ps, l_diff = sync(self._apply_fn(
            self.consts, self.state.cams, self.state.lm_ps, self._lins,
            self._stage2, self._pose_scale, inc))
        if self.it_summary is not None:
            self.it_summary.back_substitution_time_in_seconds = (
                time.monotonic() - t0)
        return BAState(cams=cams, lm_ps=lm_ps), float(l_diff)


class SqrtLinearizer(LinearizerBase):
    """SQUARE_ROOT solver (reference solver/linearizor_qr.cpp)."""

    linear_solver_type = "bal_qr"

    def _build(self):
        opts = self.options
        precond_jacobi = (opts.preconditioner_type
                          == PreconditionerType.JACOBI)
        precond_diag = (opts.preconditioner_type
                        == PreconditionerType.DIAGONAL)
        if opts.preconditioner_type not in (
                PreconditionerType.JACOBI, PreconditionerType.SCHUR_JACOBI,
                PreconditionerType.DIAGONAL):
            raise ValueError(
                f"preconditioner {opts.preconditioner_type} not implemented "
                f"for the SQUARE_ROOT solver")

        # consts = (buckets, cam_csr-or-None); passed as jit args, see
        # LinearizerBase.consts comment
        self.consts = (self.buckets, self.cam_csr)

        def error_fn(consts, cams, lm_ps):
            return compute_error_buckets(
                cams, lm_ps, consts[0], self.robust_norm, self.huber)

        def stage1_fn(consts, cams, lm_ps):
            return self._stage1_common(consts[0], cams, lm_ps,
                                       csr=consts[1])

        def stage2_fn(consts, lins, lam):
            buckets, csr = consts
            # stage2 keeps segment_sum accumulation: its 81-wide
            # contribution rows make the CSR gather slower than the
            # scatter, and it runs once per solve (vs ~100 matvecs)
            return sqrt_qr.sqrt_stage2(
                lins, buckets, lam, self.num_cameras,
                precond_jacobi=precond_jacobi,
                precond_diagonal=precond_diag, csr=None)

        def lsolve_fn(consts, lins, stage2):
            buckets, csr = consts

            def matvec(x):
                return sqrt_qr.sqrt_matvec(
                    lins, buckets, stage2, self.num_cameras, x, csr=csr)

            # explicit inverse once per solve (ops/block9.chol9_inv)
            from rootba_tpu.ops.block9 import chol9_inv, inv9_apply

            pinv = chol9_inv(stage2.precond_chol)

            def precond(r):
                return inv9_apply(pinv, r)

            res = pcg(
                matvec, precond, stage2.b,
                min_num_iterations=opts.min_linear_solver_iterations,
                max_num_iterations=opts.max_linear_solver_iterations,
                q_tolerance=opts.eta,
                r_tolerance=-1.0,
                compensated=self.compensated,
            )
            # we solve H(-x) = b -> negate (linearizor_base.cpp:99-101)
            return (-res.x, stage2, res.num_iterations,
                    res.termination_type)

        def apply_fn(consts, cams, lm_ps, lins, stage2, pose_scale, inc):
            new_lm_ps, l_diff = sqrt_qr.sqrt_back_substitute(
                lins, consts[0], stage2, lm_ps, inc,
                compensated=self.compensated)
            inc_scaled = inc * pose_scale
            q, t = lie.apply_inc_pose(cams.q, cams.t, inc_scaled[:, :6])
            intr = cams.intr + inc_scaled[:, 6:9]
            return CamState(q=q, t=t, intr=intr), new_lm_ps, l_diff

        # pure (untraced) stages, composable by the fused LM driver;
        # _finalize_build composes solve_pure and jits everything
        self.error_pure = error_fn
        self.stage1_pure = stage1_fn
        self.stage2_pure = stage2_fn
        self.lsolve_pure = lsolve_fn
        self.apply_pure = apply_fn


def create_linearizer(bp: BucketedProblem, options: SolverOptions, dtype,
                      mesh=None):
    from rootba_tpu.solver.explicit_sc import PowerSCLinearizer, SCLinearizer

    if options.solver_type == SolverType.SQUARE_ROOT:
        if options.kernel_layout not in ("flat", "einsum"):
            raise ValueError(
                f"unknown kernel_layout {options.kernel_layout!r} "
                f"(choose 'flat' or 'einsum'; the round-1 experimental "
                f"'cm'/'planar' layouts were retired)")
        if options.kernel_layout == "flat" and mesh is None:
            from rootba_tpu.solver.sqrt_flat import FlatSqrtLinearizer

            return FlatSqrtLinearizer(bp, options, dtype, mesh)
        return SqrtLinearizer(bp, options, dtype, mesh)
    if options.solver_type == SolverType.SCHUR_COMPLEMENT:
        return SCLinearizer(bp, options, dtype, mesh)
    if options.solver_type == SolverType.POWER_SCHUR_COMPLEMENT:
        return PowerSCLinearizer(bp, options, dtype, mesh)
    raise ValueError(f"unknown solver type {options.solver_type}")


def _compute_cost_decrease(ri: ResidualInfoHost, ri2: ResidualInfoHost,
                           optimized_cost: OptimizedCost) -> float:
    """Reference bal_bundle_adjustment.cpp:158-172."""
    if optimized_cost == OptimizedCost.ERROR:
        return ri.all.error - ri2.all.error
    if optimized_cost == OptimizedCost.ERROR_VALID:
        return ri.valid.error - ri2.valid.error
    return ri.valid.error_avg - ri2.valid.error_avg


def _function_tolerance_reached(it: IterationSummary,
                                options: SolverOptions):
    """Reference bal_bundle_adjustment.cpp:174-201."""
    if options.optimized_cost == OptimizedCost.ERROR:
        cost = it.cost.all.error
        change = abs(it.cost_change.all.error)
    else:
        cost = it.cost.valid.error
        change = abs(it.cost_change.valid.error)
    if change <= options.function_tolerance * cost:
        return True, (f"Function tolerance reached. |cost_change|/cost: "
                      f"{change / cost if cost else 0.0} <= "
                      f"{options.function_tolerance}")
    return False, ""


def optimize_lm(
    bp: BucketedProblem,
    options: SolverOptions,
    summary: Optional[SolverSummary] = None,
    *,
    linearizer: Optional["LinearizerBase"] = None,
    iteration_callback=None,
) -> Tuple[BAState, SolverSummary]:
    """The LM minimizer (reference optimize_lm_ours,
    bal_bundle_adjustment.cpp:249-544).

    Pass `linearizer` to reuse an already-built (and warm) linearizer:
    its jitted stage programs are per-instance, so a second solve with
    the same instance skips re-trace/re-compile entirely (used by
    benchmarks/suite.py to time solve, not tracing).

    `iteration_callback(it, state, summary)` fires after every LM
    iteration (the role of Ceres's IterationCallback / the reference
    GUI's per-iteration redraw, app/bal_gui.cpp:88-116); exceptions in
    the callback abort the solve."""
    if summary is None:
        summary = SolverSummary()
    verbose = options.verbosity_level >= 2

    timer_total = time.monotonic()

    dtype = jnp.float64 if options.use_double else jnp.float32
    if options.use_double and not jax.config.jax_enable_x64:
        raise RuntimeError(
            "use_double=True requires jax_enable_x64 "
            "(set JAX_ENABLE_X64=1 or solver.use_double=false)")

    min_lambda = 1.0 / options.max_trust_region_radius
    max_lambda = 1.0 / options.min_trust_region_radius
    vee_factor = options.vee_factor
    initial_vee = options.initial_vee
    max_lm_iter = options.max_num_iterations

    lam = 1.0 / options.initial_trust_region_radius
    lambda_vee = initial_vee

    summary.num_linear_solves = 0
    summary.num_residual_evaluations = 0
    summary.num_jacobian_evaluations = 0

    mesh = None
    if options.num_devices != 1 and len(jax.devices()) > 1:
        from rootba_tpu.parallel.mesh import make_mesh, shard_state

        mesh = make_mesh(options.num_devices)
        if verbose:
            print(f"Sharding landmark blocks over {mesh.size} devices")

    if linearizer is None:
        linearizer = create_linearizer(bp, options, dtype, mesh)
    linearizer.summary = summary
    state = initial_state(bp, dtype)
    if hasattr(linearizer, "prepare_state"):
        state = linearizer.prepare_state(state)
    if mesh is not None:
        from rootba_tpu.parallel.mesh import shard_state

        state = shard_state(state, mesh)
    linearizer.set_state(state)

    # ---- checkpoint/resume (TPU-native addition; the reference has no
    # mid-solve checkpointing -- SURVEY §5) ----------------------------
    resume_it = None
    ckpt_path = options.checkpoint_path
    ckpt_interval = options.checkpoint_interval
    if ckpt_path and jax.process_count() > 1:
        # multi-process: save allgathers shards to host (collective on
        # every process; process 0 writes), resume loads the full file
        # on every process and re-shards. Verify the processes agree on
        # whether a checkpoint exists -- a file visible on only some
        # hosts would diverge the collectives below and hang.
        from jax.experimental import multihost_utils

        exists_here = float(os.path.exists(ckpt_path))
        exists_root = float(multihost_utils.broadcast_one_to_all(
            jnp.asarray([exists_here]))[0])
        if bool(exists_here) != bool(exists_root):
            raise FileNotFoundError(
                f"checkpoint '{ckpt_path}' is visible on process 0: "
                f"{bool(exists_root)} but on process "
                f"{jax.process_index()}: {bool(exists_here)}; the "
                f"checkpoint path must resolve identically on every "
                f"host (shared filesystem or per-host copy)")
    if ckpt_path:
        from rootba_tpu.utils.checkpoint import (
            iteration_from_dict,
            load_checkpoint,
        )

        loaded = load_checkpoint(ckpt_path)
        if loaded is not None:
            cq, ct, ci, lm_ps_np, lam, lambda_vee, resume_it, its = loaded
            state = BAState(
                cams=CamState(q=jnp.asarray(cq, dtype),
                              t=jnp.asarray(ct, dtype),
                              intr=jnp.asarray(ci, dtype)),
                lm_ps=tuple(jnp.asarray(p, dtype) for p in lm_ps_np))
            if mesh is not None:
                state = shard_state(state, mesh)
            linearizer.set_state(state)
            summary.iterations = [iteration_from_dict(d) for d in its]
            if verbose:
                print(f"Resumed from checkpoint '{ckpt_path}' at "
                      f"iteration {resume_it} (lambda {lam:.2e})")

    def maybe_checkpoint():
        if iteration_callback is not None:
            iteration_callback(it, linearizer.state, summary)
        if ckpt_path and ckpt_interval > 0 and it % ckpt_interval == 0:
            from rootba_tpu.utils.checkpoint import (
                iteration_to_dict,
                save_checkpoint,
            )

            save_checkpoint(
                ckpt_path, linearizer.state, lam, lambda_vee, it,
                [iteration_to_dict(s) for s in summary.iterations])

    summary.preprocessor_time_in_seconds = time.monotonic() - timer_total
    timer_minimizer = time.monotonic()

    validity_check = options.use_projection_validity_check()
    # fused attempt: solve+apply+error in one dispatch (see
    # LinearizerBase.attempt); the top-of-loop error is then reused from
    # the previous attempt's evaluation (the state is unchanged between
    # them, so the value is identical)
    use_attempt = bool(options.host_fused_attempt)
    ri_cache: Optional[ResidualInfoHost] = None
    terminated = False
    it = resume_it if resume_it is not None else 0
    while it <= max_lm_iter and not terminated:
        it_summary = IterationSummary(iteration=it)
        linearizer.start_iteration(it_summary)
        timer_iteration = time.monotonic()

        if ri_cache is not None:
            ri = ri_cache
        else:
            ri = linearizer.compute_error()
            ri_cache = ri
        if verbose:
            print(f"Iteration {it}, "
                  f"{error_summary_oneline(ri, validity_check)}")
        if not ri.is_numerically_valid:
            raise FloatingPointError(
                "did not expect numerical failure during linearization")

        if it == 0:
            linearizer.finish_iteration()
            it_summary.cost = ri
            it_summary.trust_region_radius = 1.0 / lam
            it_summary.iteration_time_in_seconds = (
                time.monotonic() - timer_iteration)
            it_summary.cumulative_time_in_seconds = (
                time.monotonic() - timer_total)
            it_summary.step_is_successful = True
            it_summary.step_is_valid = True
            finish_iteration(summary, it_summary)
            it += 1
            maybe_checkpoint()
            continue

        linearizer.linearize()

        j = 0
        while it <= max_lm_iter and not terminated:
            if j > 0:
                if verbose:
                    print(f"Iteration {it}, backtracking")
                it_summary = IterationSummary(iteration=it)
                linearizer.start_iteration(it_summary)
                timer_iteration = time.monotonic()
            j += 1

            if use_attempt:
                # attempt() internally degrades full -> half -> separate
                # dispatches if the fused programs exceed the compile
                # service's limits at scale
                backup_state = linearizer.state
                new_state, l_diff, ri2, inc_finite = (
                    linearizer.attempt(lam))
            if not use_attempt:
                inc = linearizer.solve(lam)
                inc_finite = bool(jnp.all(jnp.isfinite(inc)))

            if not inc_finite:
                it_summary.step_is_valid = False
                it_summary.step_is_successful = False
                if verbose:
                    print(f"\t[Invalid] Numeric issues when computing "
                          f"increment (contains NaNs), lambda: {lam:.1e}")
                lam = lambda_vee * lam
                lambda_vee *= vee_factor

                linearizer.finish_iteration()
                it_summary.trust_region_radius = 1.0 / lam
                it_summary.iteration_time_in_seconds = (
                    time.monotonic() - timer_iteration)
                it_summary.cumulative_time_in_seconds = (
                    time.monotonic() - timer_total)
                finish_iteration(summary, it_summary)
                it += 1
                maybe_checkpoint()
                if lam > max_lambda:
                    terminated = True
                    summary.termination_type = NO_CONVERGENCE
                    summary.message = (
                        f"Solver did not converge and reached maximum "
                        f"damping lambda of {max_lambda}")
                continue

            if use_attempt:
                linearizer.set_state(new_state)
            else:
                backup_state = linearizer.state
                new_state, l_diff = linearizer.apply(inc)
                linearizer.set_state(new_state)
                ri2 = linearizer.compute_error()
            it_summary.cost = ri2

            if not math.isfinite(l_diff):
                it_summary.step_is_valid = False
                it_summary.step_is_successful = False
                if verbose:
                    print(f"\t[EVAL] failed to apply update: "
                          f"l_diff {l_diff}")
            elif not ri2.is_numerically_valid:
                it_summary.step_is_valid = False
                it_summary.step_is_successful = False
                if verbose:
                    print(f"\t[EVAL] failed to evaluate cost: "
                          f"{error_summary_oneline(ri2, validity_check)}")
            else:
                f_diff = _compute_cost_decrease(ri, ri2,
                                                options.optimized_cost)
                if options.optimized_cost == OptimizedCost.ERROR_VALID_AVG:
                    l_diff = l_diff / ri.valid.num_obs
                step_quality = f_diff / l_diff if l_diff != 0 else math.inf
                if verbose:
                    print(f"\t[EVAL] f_diff {f_diff:.4e} l_diff "
                          f"{l_diff:.4e} step_quality {step_quality:.4e} "
                          f"ri1 {ri.valid.error:.4e} ri2 "
                          f"{ri2.valid.error:.4e}")
                it_summary.relative_decrease = step_quality
                it_summary.step_is_valid = l_diff > 0
                it_summary.step_is_successful = (
                    it_summary.step_is_valid
                    and step_quality > options.min_relative_decrease)

            if it_summary.step_is_successful:
                ri_cache = ri2
                cum = time.monotonic() - timer_total
                if verbose:
                    print(f"\t[Success] lambda: {lam:.1e}, cg_iter: "
                          f"{it_summary.linear_solver_iterations}, "
                          f"total_time: {cum:.3f}s")
                lam *= max(1.0 / 3,
                           1.0 - (2.0 * it_summary.relative_decrease - 1.0) ** 3)
                lam = max(min_lambda, lam)
                lambda_vee = initial_vee

                linearizer.finish_iteration()
                it_summary.trust_region_radius = 1.0 / lam
                it_summary.iteration_time_in_seconds = (
                    time.monotonic() - timer_iteration)
                it_summary.cumulative_time_in_seconds = cum
                finish_iteration(summary, it_summary)
                it += 1
                maybe_checkpoint()

                reached, msg = _function_tolerance_reached(
                    summary.iterations[-1], options)
                if reached:
                    terminated = True
                    summary.termination_type = CONVERGENCE
                    summary.message = msg
                break
            else:
                cum = time.monotonic() - timer_total
                reason = "Reject" if it_summary.step_is_valid else "Invalid"
                if verbose:
                    print(f"\t[{reason}] lambda: {lam:.1e}, cg_iter: "
                          f"{it_summary.linear_solver_iterations}, "
                          f"total_time: {cum:.3f}s")
                lam = lambda_vee * lam
                lambda_vee *= vee_factor

                linearizer.finish_iteration()
                it_summary.trust_region_radius = 1.0 / lam
                it_summary.iteration_time_in_seconds = (
                    time.monotonic() - timer_iteration)
                it_summary.cumulative_time_in_seconds = cum
                it_summary.step_is_successful = False
                finish_iteration(summary, it_summary)

                linearizer.set_state(backup_state)
                ri_cache = ri
                it += 1
                maybe_checkpoint()
                if lam > max_lambda:
                    terminated = True
                    summary.termination_type = NO_CONVERGENCE
                    summary.message = (
                        f"Solver did not converge and reached maximum "
                        f"damping lambda of {max_lambda}")

    if not terminated:
        summary.termination_type = NO_CONVERGENCE
        summary.message = (f"Solver did not converge after maximum number "
                           f"of {max_lm_iter} iterations")

    summary.minimizer_time_in_seconds = time.monotonic() - timer_minimizer
    summary.postprocessor_time_in_seconds = 0.0
    summary.total_time_in_seconds = time.monotonic() - timer_total
    summary.num_threads_given = options.num_threads
    summary.num_threads_used = 1

    solver_names = {
        SolverType.SQUARE_ROOT: "bal_qr",
        SolverType.SCHUR_COMPLEMENT: "bal_sc",
        SolverType.POWER_SCHUR_COMPLEMENT: "bal_power_sc",
    }
    finish_solve(summary, solver_names[options.solver_type])
    if verbose:
        print(f"Final Cost: "
              f"{error_summary_oneline(summary.final_cost, validity_check)}")
        print(f"{summary.termination_type}: {summary.message}")
    final_state = linearizer.state
    if hasattr(linearizer, "export_lm_ps"):
        final_state = BAState(cams=final_state.cams,
                              lm_ps=linearizer.export_lm_ps(
                                  final_state.lm_ps))
    return final_state, summary


def bundle_adjust(
    problem: BalProblem,
    options: Optional[SolverOptions] = None,
    summary: Optional[SolverSummary] = None,
    timing: Optional[PipelineTimingSummary] = None,
) -> SolverSummary:
    """Solve a BalProblem in place (reference bundle_adjust_manual,
    bal_bundle_adjustment.cpp:549-...)."""
    if options is None:
        options = SolverOptions()
    if summary is None:
        summary = SolverSummary()
    if options.solver_type == SolverType.CERES:
        # external-baseline path (the role of the reference's Ceres
        # module, src/rootba/ceres/): 'trf' = scipy least_squares,
        # 'lm' = plain-numpy LM with the reference's exact
        # trust-region protocol (step-comparable trajectories)
        if options.baseline_method == "lm":
            from rootba_tpu.solver.numpy_lm import bundle_adjust_numpy_lm

            summary = bundle_adjust_numpy_lm(problem, options, summary)
        else:
            from rootba_tpu.solver.scipy_baseline import (
                bundle_adjust_scipy,
            )

            summary = bundle_adjust_scipy(problem, options, summary)
        if timing is not None:
            timing.optimize_time = summary.total_time_in_seconds
        return summary
    options.warn_inert_knobs()
    from rootba_tpu.parallel.mesh import pad_rows_for_mesh

    ndev = (options.num_devices if options.num_devices > 0
            else (len(jax.devices()) if options.num_devices != 1 else 1))
    bp = bucketize(problem, pow2_from=options.bucket_pow2_from,
                   row_align=pad_rows_for_mesh(ndev))
    lm_loop = options.lm_loop
    if lm_loop == "auto":
        lm_loop = ("fused" if problem.num_observations
                   <= options.fused_obs_threshold else "host")
    if options.timing_mode == "measured":
        # the whole-solve fused program cannot produce per-stage spans
        # (one dispatch); measured timing implies the host loop
        lm_loop = "host"
    if lm_loop == "fused":
        from rootba_tpu.solver.fused_lm import optimize_lm_fused

        state, summary = optimize_lm_fused(bp, options, summary)
    else:
        state, summary = optimize_lm(bp, options, summary)
    # write back optimized state (multi-process: all-gather the
    # landmark shards so every host has the full solution)
    from rootba_tpu.parallel.mesh import gather_to_host

    problem.lm_p[:] = scatter_landmarks(
        bp, [gather_to_host(p).astype(np.float64) for p in state.lm_ps])
    problem.cam_q[:] = gather_to_host(state.cams.q).astype(np.float64)
    problem.cam_t[:] = gather_to_host(state.cams.t).astype(np.float64)
    problem.cam_intr[:] = gather_to_host(state.cams.intr).astype(np.float64)
    if timing is not None:
        timing.optimize_time = summary.total_time_in_seconds
    return summary
