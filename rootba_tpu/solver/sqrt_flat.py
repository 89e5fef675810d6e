"""Flat-layout SQUARE_ROOT solver: the TPU hot path.

Same projection-form sqrt marginalization as solver.sqrt_qr (see that
module's docstring for the math and reference citations), but every
per-observation tensor lives in ONE flat [O, ...] array concatenated
across obs-count buckets:

    Jp [O,2,9]   Jl [O,2,3]   r [O,2]   Q1h [O,2,3]

Why: the per-bucket formulation pays three materialized copies of the
matvec's 9-wide contribution rows per CG iteration (einsum output ->
reshape -> concat for the camera reduction), ~1.1 ms of pure data
movement per matvec at trafalgar-257 scale (measured via the TPU
profiler; benchmarks/micro_matvec3.py). Flat arrays make the einsum
output itself the gather source. Per-landmark structure (the Q1h
projection, QR, back-substitution) is recovered through reshape/
broadcast of narrow [*,2]/[*,3] intermediates over static bucket
offsets -- these fuse into their consumers and never materialize
padded [L,n,2,9]-style buffers.

Camera reductions use the static camera-CSR gather-reduce
(bucketing.CamCsr), camera-parameter reads one packed-table row gather
(linearization.packed_cam_table): TPU scatters and per-element gathers
cost 10-20x their traffic; wide-row static gathers are the fast path.

Reference mapping unchanged: stage1 = linearize+scale (linearizor_qr.cpp
:78-138), stage2 = damp+RHS+precond (:141-265), matvec = right_multiply
(linearization_qr.hpp:823-825), apply = back_substitute (:267-291).
"""

from __future__ import annotations

import time
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rootba_tpu.ops.block9 import chol9, chol9_solve
from rootba_tpu.config.options import PreconditionerType, SolverOptions
from rootba_tpu.core import lie
from rootba_tpu.ops.batched_qr import householder_qr3, solve_upper
from rootba_tpu.solver.cg import pcg
from rootba_tpu.solver.linearization import (
    POSE_SIZE,
    CamState,
    csr_cam_reduce,
    gather_cam_planes,
    packed_cam_table,
)
from rootba_tpu.solver.sqrt_qr import precond_apply
from rootba_tpu.utils.jax_setup import sync

P9 = POSE_SIZE


class FlatLin(NamedTuple):
    """Stage-1 output, flat across buckets."""

    Jp: jnp.ndarray  # [O,2,9] sqrt-weighted, masked, scaled
    Jl: jnp.ndarray  # [O,2,3]
    r: jnp.ndarray  # [O,2]
    Jl_scale: Tuple[jnp.ndarray, ...]  # per bucket [L,3]


class FlatStage2(NamedTuple):
    """Per-lambda marginalization data."""

    Q1h: jnp.ndarray  # [O,2,3]
    R: Tuple[jnp.ndarray, ...]  # per bucket [L,3,3]
    b: jnp.ndarray  # [N,9]
    precond_chol: jnp.ndarray  # [N,9,9]
    lam: jnp.ndarray


def _bucket_offsets(buckets):
    offs = [0]
    for b in buckets:
        L, n = b.cam_idx.shape
        offs.append(offs[-1] + L * n)
    return offs


def _per_landmark_sum(p, buckets, offs):
    """[O,F] obs rows -> per-bucket [L,F] sums over each landmark's
    slots (reshape-fused reduce; obs o = l*n + i within a bucket)."""
    outs = []
    for bucket, a, b in zip(buckets, offs[:-1], offs[1:]):
        L, n = bucket.cam_idx.shape
        outs.append(jnp.sum(p[a:b].reshape(L, n, -1), axis=1))
    return outs


def _per_landmark_broadcast(ts, buckets):
    """Inverse of _per_landmark_sum: per-bucket [L,F] -> flat [O,F]."""
    outs = []
    for bucket, t in zip(buckets, ts):
        L, n = bucket.cam_idx.shape
        outs.append(jnp.broadcast_to(
            t[:, None, :], (L, n, t.shape[-1])).reshape(L * n, -1))
    return jnp.concatenate(outs, axis=0)


def flat_linearize(cams, lm_ps, buckets, cam_flat, robust_norm,
                   huber_parameter, use_valid_only, jacobi_eps,
                   jacobi_scaling, csr, num_cameras, cam_strips=None):
    """Stage 1: linearize + scale_Jl_cols + jacobi pose scaling, all
    buckets in one pass (reference get_stage1 fusion,
    linearization_qr.hpp:634-712)."""
    from rootba_tpu.ops.planar import robust_sqrt_weight, snavely_planes

    offs = _bucket_offsets(buckets)
    table = packed_cam_table(cams)
    planes18 = [[] for _ in range(18)]
    planes6 = [[] for _ in range(6)]
    rr = []
    failures = jnp.zeros((), jnp.int32)
    for lm_p, bucket in zip(lm_ps, buckets):
        L, n = bucket.cam_idx.shape
        idx = bucket.cam_idx.reshape(-1)
        X = jnp.broadcast_to(lm_p[:, 0:1], (L, n)).reshape(-1)
        Y = jnp.broadcast_to(lm_p[:, 1:2], (L, n)).reshape(-1)
        Z = jnp.broadcast_to(lm_p[:, 2:3], (L, n)).reshape(-1)
        res_u, res_v, valid, Jp_pl, Jl_pl = snavely_planes(
            *gather_cam_planes(table, idx), X, Y, Z,
            bucket.obs_uv[..., 0].reshape(-1),
            bucket.obs_uv[..., 1].reshape(-1))
        sw, use_mask = robust_sqrt_weight(
            res_u, res_v, valid, bucket.mask.reshape(-1), robust_norm,
            huber_parameter, use_valid_only)
        finite = jnp.isfinite(res_u) & jnp.isfinite(res_v)
        for v in Jp_pl + Jl_pl:
            finite = finite & jnp.isfinite(v)
        failures = failures + jnp.sum(jnp.where(use_mask & ~finite, 1, 0))
        for k in range(18):
            planes18[k].append(sw * Jp_pl[k])
        for k in range(6):
            planes6[k].append(sw * Jl_pl[k])
        rr.append(jnp.stack([sw * res_u, sw * res_v], axis=-1))

    O = offs[-1]
    Jp = jnp.stack([jnp.concatenate(p) for p in planes18],
                   axis=-1).reshape(O, 2, P9)
    Jl = jnp.stack([jnp.concatenate(p) for p in planes6],
                   axis=-1).reshape(O, 2, 3)
    r = jnp.concatenate(rr, axis=0)  # [O,2]

    # landmark-Jacobian column scaling (landmark_block_base.ipp:572-587)
    col2 = jnp.sum(Jl * Jl, axis=1)  # [O,3]
    norms = [jnp.sqrt(s) for s in _per_landmark_sum(col2, buckets, offs)]
    scales = tuple(1.0 / (jacobi_eps + nrm) for nrm in norms)
    Jl = Jl * _per_landmark_broadcast(scales, buckets)[:, None, :]

    # pose jacobi scaling (add_Jp_diag2 -> linearizor_qr.cpp:104-110)
    if cam_strips is not None:
        from rootba_tpu.solver.linearization import cam_reduce_strips

        if cam_strips.wi_idx.shape[0] == 0:
            # per-bucket [L, n*9] tables -- a flat [O, 9] row-major
            # intermediate lane-pads 9 -> 128 (17.2 GB at final-13682;
            # see csr_pair_outer_strips)
            d2p = []
            for bucket, a, b_ in zip(buckets, offs[:-1], offs[1:]):
                L, n = bucket.cam_idx.shape
                s = jax.lax.slice_in_dim(Jp, a, b_, axis=0)
                d2p.append(jnp.sum(s * s, axis=1).reshape(L, n * P9))
            diag2 = cam_reduce_strips(tuple(d2p), buckets, cam_strips)
        else:
            diag2 = cam_reduce_strips(jnp.sum(Jp * Jp, axis=1),
                                      buckets, cam_strips)
    elif csr is not None:
        diag2 = csr_cam_reduce([jnp.sum(Jp * Jp, axis=1)], csr,
                               num_cameras)
    else:
        diag2 = jax.ops.segment_sum(jnp.sum(Jp * Jp, axis=1), cam_flat,
                                    num_segments=num_cameras)
    if jacobi_scaling:
        pose_scale = 1.0 / (jacobi_eps + jnp.sqrt(diag2))
    else:
        pose_scale = jnp.ones_like(diag2)
    # apply the scale per bucket: one global pose_scale[cam_flat]
    # gather materializes a [O, 9] row-major fusion output whose lane
    # padding (9 -> 128) is 17.2 GB at final-13682 (the per-bucket
    # gathers are bounded by max_bucket_obs)
    jp_parts = []
    for bucket, a, b_ in zip(buckets, offs[:-1], offs[1:]):
        jp_b = jax.lax.slice_in_dim(Jp, a, b_, axis=0)
        sb = jnp.take(pose_scale, bucket.cam_idx.reshape(-1), axis=0)
        jp_parts.append(jp_b * sb[:, None, :])
    Jp = jnp.concatenate(jp_parts, axis=0)

    return FlatLin(Jp=Jp, Jl=Jl, r=r, Jl_scale=scales), pose_scale, failures


def flat_stage2(lin: FlatLin, buckets, cam_flat, lam, num_cameras,
                *, precond_jacobi: bool = False,
                csr=None, with_precond: bool = True,
                cam_strips=None) -> FlatStage2:
    """Stage 2 (reference get_stage2, linearization_qr.hpp:716-815):
    landmark damping via augmented thin-QR, RHS, preconditioner.

    with_precond=False skips the per-obs Gram preconditioner pass; used
    by the explicit-RCS mode, whose diagonal blocks come for free from
    the assembled H (see flat_assemble_rcs)."""
    dtype = lin.Jp.dtype
    offs = _bucket_offsets(buckets)

    Q1h_parts = []
    Rs = []
    for bucket, a, b_ in zip(buckets, offs[:-1], offs[1:]):
        L, n = bucket.cam_idx.shape
        Jl2 = lin.Jl[a:b_].reshape(L, 2 * n, 3)
        damp = jnp.sqrt(lam).astype(dtype) * jnp.broadcast_to(
            jnp.eye(3, dtype=dtype), (L, 3, 3))
        aug = jnp.concatenate([Jl2, damp], axis=1)
        R, Q1 = householder_qr3(aug)
        Rs.append(R)
        Q1h_parts.append(Q1[:, :2 * n, :].reshape(L * n, 2, 3))
    Q1h = jnp.concatenate(Q1h_parts, axis=0)  # [O,2,3]
    # materialize Q1h once: it feeds several consumers (RHS projection,
    # preconditioner Gram / RCS assembly, CG matvec) and XLA otherwise
    # duplicates the whole QR into each fusion (~3x stage2 cost,
    # benchmarks/rcs_assemble_bench.py)
    Q1h = jax.lax.optimization_barrier(Q1h)

    # RHS: Jp^T (r - Q1h Q1h^T r)
    if cam_strips is not None and cam_strips.wi_idx.shape[0] == 0:
        from rootba_tpu.solver.linearization import cam_reduce_strips

        # the whole chain per bucket as [L, n*9] tables: any flat
        # [O, F<128] row-major intermediate (p, t3, wp, yb) lane-pads
        # to 128 -- 17.2 GB at final-13682 (see flat_linearize diag2)
        ybp = []
        for bucket, a, b_ in zip(buckets, offs[:-1], offs[1:]):
            L, n = bucket.cam_idx.shape
            q_b = jax.lax.slice_in_dim(Q1h, a, b_, axis=0)
            r_b = jax.lax.slice_in_dim(lin.r, a, b_, axis=0)
            jp_b = jax.lax.slice_in_dim(lin.Jp, a, b_, axis=0)
            p_b = jnp.sum(q_b * r_b[:, :, None], axis=1)  # [L*n,3]
            t3_b = jnp.sum(p_b.reshape(L, n, 3), axis=1)  # [L,3]
            t3e = jnp.broadcast_to(
                t3_b[:, None, :], (L, n, 3)).reshape(L * n, 3)
            wp_b = r_b - jnp.sum(q_b * t3e[:, None, :], axis=2)
            ybp.append(jnp.sum(jp_b * wp_b[:, :, None],
                               axis=1).reshape(L, n * P9))
        b = cam_reduce_strips(tuple(ybp), buckets, cam_strips)
    else:
        p = jnp.sum(Q1h * lin.r[:, :, None], axis=1)
        t3 = _per_landmark_broadcast(
            _per_landmark_sum(p, buckets, offs), buckets)
        wp = lin.r - jnp.sum(Q1h * t3[:, None, :], axis=2)
        yb = jnp.sum(lin.Jp * wp[:, :, None], axis=1)
        if cam_strips is not None:
            from rootba_tpu.solver.linearization import (
                cam_reduce_strips,
            )

            b = cam_reduce_strips(yb, buckets, cam_strips)
        elif csr is not None:
            b = csr_cam_reduce([yb], csr, num_cameras)
        else:
            b = jax.ops.segment_sum(yb, cam_flat,
                                    num_segments=num_cameras)

    if not with_precond:
        return FlatStage2(Q1h=Q1h, R=tuple(Rs), b=b,
                          precond_chol=jnp.zeros((0, P9, P9), dtype),
                          lam=jnp.asarray(lam, dtype))

    # preconditioner blocks: JACOBI = sum Jp_o' Jp_o; SCHUR_JACOBI
    # subtracts W' W with W = Q1h_o' Jp_o (per obs; Jp's block structure
    # makes cross-obs terms vanish on the diagonal blocks). Flattened to
    # [O, 81] before the camera reduction (9x9 minor dims would be
    # tile-padded ~25x if materialized).
    O = offs[-1]

    def gram81(M):  # [O, rows, 9] -> [O, 81]
        A = jnp.repeat(M, P9, axis=2)
        B = jnp.tile(M, (1, 1, P9))
        return jnp.sum(A * B, axis=1)

    blk = gram81(lin.Jp)
    if not precond_jacobi:
        A = jnp.repeat(Q1h, P9, axis=2)  # [O,2,27]
        B = jnp.tile(lin.Jp, (1, 1, 3))  # [O,2,27]
        W27 = jnp.sum(A * B, axis=1)  # [O,27]
        blk = blk - gram81(W27.reshape(O, 3, P9))
    blocks = jax.ops.segment_sum(
        blk, cam_flat, num_segments=num_cameras
    ).reshape(num_cameras, P9, P9)
    blocks = blocks + lam.astype(dtype) * jnp.eye(P9, dtype=dtype)
    chol = chol9(blocks)

    return FlatStage2(Q1h=Q1h, R=tuple(Rs), b=b, precond_chol=chol,
                      lam=jnp.asarray(lam, dtype))


def flat_assemble_rcs(lin: FlatLin, stage2: FlatStage2, cam_flat, pairs,
                      num_cameras, csr=None, buckets=None,
                      cam_strips=None):
    """Assemble the explicit reduced camera system of the sqrt solver,

        H = Jp'Jp - (Q1'Jp)'(Q1'Jp) + lam I = (Q2'Jp)'(Q2'Jp) + lam I,

    as a dense [9N, 9N] matrix, plus its per-camera diagonal blocks
    (the SCHUR_JACOBI preconditioner) for free.

    This is the same reduced system the implicit flat_matvec applies
    (right_multiply, linearization_qr.hpp:823-825): expanding y =
    lam x + Jp'(w - Q1h sum_l Q1h' w) over observation pairs gives
    block (c_i, c_j) = delta_ij Jp_i'Jp_i - W_i'W_j with
    W_o = Q1h_o'Jp_o. The reference never materializes H for the QR
    solver (matrix-free CG); on TPU the per-CG-iteration cost of the
    implicit product is two O-sized row gathers (~5 ns/row,
    benchmarks/micro_perm.py) while a dense GEMV on the assembled H
    runs at HBM bandwidth -- 47x faster per iteration at trafalgar
    scale (benchmarks/stage2_break.py), paying one strict-upper
    pair-CSR gather-reduce per stage2 (csr_pair_outer; diagonal
    blocks reduce per camera).

    All products are explicit VPU mult-sums: einsum dots over these
    tiny contraction axes would hit the MXU at bf16 default precision
    and pay double layout-copy passes (benchmarks/profile_solve.py).
    """
    from rootba_tpu.solver.linearization import assemble_rcs_dense

    Wa, Wb, terms = _rcs_factors(lin, stage2, buckets, pairs,
                                 cam_strips)
    return assemble_rcs_dense(
        Wa, Wb, terms, cam_flat, csr, pairs, stage2.lam, num_cameras,
        buckets=buckets, cam_strips=cam_strips)


def flat_assemble_rcs_bsr(lin: FlatLin, stage2: FlatStage2, cam_flat,
                          pairs, num_cameras, csr=None, buckets=None,
                          cam_strips=None):
    """Block-sparse form of flat_assemble_rcs (same H, no densify):
    for camera counts whose dense [9G, 9G] system exceeds HBM but whose
    unique-pair structure is sparse (final-13682: 60 GB dense vs 116 MB
    of blocks). Returns (blocks2 [2P,81], diag [N,9,9])."""
    from rootba_tpu.solver.linearization import assemble_rcs_bsr

    Wa, Wb, terms = _rcs_factors(lin, stage2, buckets, pairs,
                                 cam_strips)
    return assemble_rcs_bsr(
        Wa, Wb, terms, cam_flat, csr, pairs, stage2.lam, num_cameras,
        buckets=buckets, cam_strips=cam_strips)


def _rcs_factors(lin: FlatLin, stage2: FlatStage2, buckets, pairs,
                 cam_strips):
    """(strip_a, strip_b, diag_terms) for the sqrt RCS assembly:
    W = Q1h'Jp pair factors plus the Jp'Jp - W'W diagonal terms.

    With a leftover-free strips index, W and the Jp tables are built
    per bucket as [L, n*27]/[L, n*18] landmark-strip tables straight
    from per-bucket slices -- a flat [O, 27] row-major W lane-pads
    27 -> 128 (17.2 GB at final-13682; see csr_pair_outer_strips)."""
    from rootba_tpu.solver.linearization import PairStripsIndex

    parts = (cam_strips is not None
             and cam_strips.wi_idx.shape[0] == 0
             and isinstance(pairs, PairStripsIndex)
             and pairs.wi_idx.shape[0] == 0)
    if parts:
        offs = _bucket_offsets(buckets)
        Wp, Jpp = [], []
        for bucket, a, b_ in zip(buckets, offs[:-1], offs[1:]):
            L, n = bucket.cam_idx.shape
            q_b = jax.lax.slice_in_dim(stage2.Q1h, a, b_, axis=0)
            jp_b = jax.lax.slice_in_dim(lin.Jp, a, b_, axis=0)
            # W in flat [*, 27] form (col c*9+a), as a strictly 2-D
            # elementwise chain: any rank-3 [*, 3, 9] value (even a
            # reduce output XLA re-ranks to) gets (4,128)-tile-padded
            # 19x when materialized (7.6 GB at a 4M-obs bucket)
            W27 = (jnp.repeat(q_b[:, 0, :], P9, axis=1)
                   * jnp.tile(jp_b[:, 0, :], (1, 3))
                   + jnp.repeat(q_b[:, 1, :], P9, axis=1)
                   * jnp.tile(jp_b[:, 1, :], (1, 3)))
            Wp.append(W27.reshape(L, n * 3 * P9))
            Jpp.append(jp_b.reshape(L, n * 2 * P9))
        Wt, Jpt = tuple(Wp), tuple(Jpp)
        return Wt, Wt, [(Jpt, Jpt, 1.0), (Wt, Wt, -1.0)]
    # W[o,c,a] = sum_r Q1h[o,r,c] Jp[o,r,a]  -- [O,3,9]
    W = jnp.sum(stage2.Q1h[:, :, :, None] * lin.Jp[:, :, None, :],
                axis=1)
    # per-camera diagonal contribution: Jp_i'Jp_i - W_i'W_i (computed
    # inside the gather-reduce -- no [O,81] materialization)
    return W, W, [(lin.Jp, lin.Jp, 1.0), (W, W, -1.0)]


def flat_matvec(lin: FlatLin, stage2: FlatStage2, buckets, cam_flat,
                num_cameras, x, csr=None):
    """y = [(Q2'Jp)'(Q2'Jp) + lam I] x (right_multiply,
    linearization_qr.hpp:823-825)."""
    offs = _bucket_offsets(buckets)
    xg = x[cam_flat]  # [O,9]
    w = jnp.sum(lin.Jp * xg[:, None, :], axis=2)
    p = jnp.sum(stage2.Q1h * w[:, :, None], axis=1)
    t3 = _per_landmark_broadcast(
        _per_landmark_sum(p, buckets, offs), buckets)
    wp = w - jnp.sum(stage2.Q1h * t3[:, None, :], axis=2)
    yb = jnp.sum(lin.Jp * wp[:, :, None], axis=1)
    if csr is not None:
        red = csr_cam_reduce([yb], csr, num_cameras)
    else:
        red = jax.ops.segment_sum(yb, cam_flat, num_segments=num_cameras)
    return stage2.lam.astype(x.dtype) * x + red


def flat_back_substitute(lin: FlatLin, stage2: FlatStage2, buckets,
                         cam_flat, lm_ps, pose_inc,
                         compensated: bool = False):
    """Landmark back-substitution + model cost decrease
    (landmark_block_base.ipp:213-284).

    compensated=True accumulates l_diff with error-free transforms
    (see ops.compensated; the sum cancels under f32 near convergence).

    Every per-obs intermediate is per-bucket: one global
    pose_inc[cam_flat] gather materializes a [O, 9] row-major fusion
    output (lane-padded to 17.2 GB at final-13682); the per-bucket
    chain is bounded by max_bucket_obs."""
    offs = _bucket_offsets(buckets)
    acc_dtype = jnp.result_type(pose_inc.dtype, jnp.float32)

    new_lm_ps = []
    bucket_sums = []
    for bucket, a, b_, R, scale, lm_p in zip(
            buckets, offs[:-1], offs[1:], stage2.R, lin.Jl_scale,
            lm_ps):
        L, n = bucket.cam_idx.shape
        jp_b = jax.lax.slice_in_dim(lin.Jp, a, b_, axis=0)
        jl_b = jax.lax.slice_in_dim(lin.Jl, a, b_, axis=0)
        r_b = jax.lax.slice_in_dim(lin.r, a, b_, axis=0)
        q_b = jax.lax.slice_in_dim(stage2.Q1h, a, b_, axis=0)
        xg = jnp.take(pose_inc, bucket.cam_idx.reshape(-1), axis=0)
        w = jnp.sum(jp_b * xg[:, None, :], axis=2)  # [L*n,2]
        u = r_b + w
        p = jnp.sum(q_b * u[:, :, None], axis=1)  # [L*n,3]
        rhs = jnp.sum(p.reshape(L, n, 3), axis=1)  # [L,3]
        dl_s = -solve_upper(R, rhs)
        dl_s = jnp.where(bucket.lm_mask[:, None], dl_s, 0.0)
        new_lm_ps.append(lm_p + (dl_s * scale).astype(lm_p.dtype))
        dl_e = jnp.broadcast_to(
            dl_s[:, None, :], (L, n, 3)).reshape(L * n, 3)
        v = w + jnp.sum(jl_b * dl_e[:, None, :], axis=2)
        parts = (v * (0.5 * v + r_b)).astype(acc_dtype)
        if compensated:
            from rootba_tpu.ops.compensated import comp_sum

            bucket_sums.append(comp_sum(parts))
        else:
            bucket_sums.append(jnp.sum(parts))
    l_diff = -jnp.sum(jnp.stack(bucket_sums))
    return tuple(new_lm_ps), l_diff


# ---------------------------------------------------------------------------

from rootba_tpu.solver.lm import BAState, LinearizerBase  # noqa: E402


class FlatSqrtLinearizer(LinearizerBase):
    """SQUARE_ROOT solver on flat per-obs tensors (default layout)."""

    linear_solver_type = "bal_qr"

    def _build(self):
        opts = self.options
        precond_jacobi = (opts.preconditioner_type
                          == PreconditionerType.JACOBI)
        if opts.preconditioner_type not in (
                PreconditionerType.JACOBI, PreconditionerType.SCHUR_JACOBI):
            raise ValueError(
                f"preconditioner {opts.preconditioner_type} not implemented "
                f"for the SQUARE_ROOT solver")
        cam_flat = jnp.concatenate(
            [b.cam_idx.reshape(-1) for b in self.buckets])
        # explicit-RCS CG: assemble H once per stage2 and run CG
        # gather-free -- dense [9G,9G] GEMV when the matrix fits HBM
        # (flat_assemble_rcs), block-sparse gather-reduce above that
        # camera count (flat_assemble_rcs_bsr; final-13682's dense
        # system would be 60 GB)
        mode = opts.sqrt_rcs_mode
        if mode == "auto":
            if self.mesh is not None or precond_jacobi:
                mode = "implicit"
            elif 0 < self.num_cameras <= opts.dense_rcs_max_cameras:
                mode = "dense"
            else:
                mode = "bsr"
        explicit = mode == "dense"
        bsr_mode = mode == "bsr"
        if bsr_mode and self.mesh is not None:
            raise ValueError("sqrt_rcs_mode='bsr' is single-device "
                             "(the BSR gather crosses landmark shards);"
                             " use 'implicit' under a mesh")
        self.explicit_rcs = explicit
        self.bsr_rcs = bsr_mode
        N = self.num_cameras
        # whole-loop VMEM CG kernel: dense system [9Nc, 9Nc] must fit
        # on-chip next to its vectors/planes (~12 MB of 16 MB VMEM)
        Nc = -(-N // 128) * 128
        vmem_ok = (9 * Nc) * (9 * Nc) * 4 <= (12 << 20)
        use_pallas = (explicit and opts.pallas_cg != "off"
                      and self.dtype == jnp.float32
                      and (vmem_ok or opts.pallas_cg == "on"))
        self.pallas_cg = use_pallas
        pairs = None
        bsr = None
        if explicit or bsr_mode:
            grid = Nc if use_pallas else None
            if opts.pair_gather == "strips":
                from rootba_tpu.bal.bucketing import build_pair_strips
                from rootba_tpu.solver.linearization import (
                    PairStripsIndex,
                )

                pairs_host = build_pair_strips(
                    self.bp.buckets, N, grid_n=grid,
                    dense_grid=explicit,
                    min_group=opts.strip_min_group)
                pairs = PairStripsIndex.from_host(pairs_host)
            else:
                from rootba_tpu.bal.bucketing import build_pair_csr
                from rootba_tpu.solver.linearization import (
                    PairCsrIndex,
                )

                pairs_host = build_pair_csr(
                    self.bp.buckets, N, grid_n=grid,
                    dense_grid=explicit)
                pairs = PairCsrIndex.from_host(pairs_host)
            if bsr_mode:
                from rootba_tpu.bal.bucketing import build_bsr_matvec
                from rootba_tpu.solver.linearization import (
                    BsrMatvecIndex,
                )

                bsr = BsrMatvecIndex.from_host(build_bsr_matvec(
                    pairs_host.pair_row, pairs_host.pair_col, N))
        # camera-strip reduce index (same small-table gather economics
        # as the pair strips; see bucketing.CamStrips) for the RHS /
        # diagonal-block / diag2 per-camera reductions
        cstrips = None
        if (explicit or bsr_mode) and opts.pair_gather == "strips":
            from rootba_tpu.bal.bucketing import build_cam_strips
            from rootba_tpu.solver.linearization import CamStripsIndex

            cstrips = CamStripsIndex.from_host(build_cam_strips(
                self.bp.buckets, N,
                min_group=opts.strip_min_group))
        self.consts = (self.buckets, self.cam_csr, cam_flat, pairs,
                       cstrips, bsr)
        use_valid = opts.use_projection_validity_check()

        def error_fn(consts, cams, lm_ps):
            from rootba_tpu.solver.linearization import (
                compute_error_buckets,
            )

            return compute_error_buckets(
                cams, lm_ps, consts[0], self.robust_norm, self.huber)

        def stage1_fn(consts, cams, lm_ps):
            buckets, csr, cam_flat = consts[:3]
            cstrips_ = consts[4] if len(consts) > 4 else None
            return flat_linearize(
                cams, lm_ps, buckets, cam_flat, self.robust_norm,
                self.huber, use_valid, self.jacobi_eps,
                opts.jacobi_scaling, csr, N, cam_strips=cstrips_)

        def stage2_fn(consts, lins, lam):
            buckets, csr, cam_flat, pairs, cstrips_, bsr_ = consts
            if explicit or bsr_mode:
                # explicit RCS: assemble H = (Q2'Jp)'(Q2'Jp)+lam I once,
                # then CG is gather-free GEMVs (dense) or block-sparse
                # gather-reduces (bsr) -- no per-iteration O-sized
                # gathers either way. SCHUR_JACOBI blocks are the
                # diagonal of the assembled H (free); forced-JACOBI
                # keeps stage2's own Jp'Jp block pass.
                stage2 = flat_stage2(
                    lins, buckets, cam_flat, lam, N,
                    precond_jacobi=precond_jacobi, csr=csr,
                    with_precond=precond_jacobi, cam_strips=cstrips_)
                if bsr_mode:
                    blocks2, diag = flat_assemble_rcs_bsr(
                        lins, stage2, cam_flat, pairs, N, csr=csr,
                        buckets=buckets, cam_strips=cstrips_)
                    Hd = (blocks2, diag)
                else:
                    Hd, diag = flat_assemble_rcs(lins, stage2, cam_flat,
                                                 pairs, N, csr=csr,
                                                 buckets=buckets,
                                                 cam_strips=cstrips_)
                if not precond_jacobi:
                    chol = chol9(diag)
                    stage2 = stage2._replace(precond_chol=chol)
                return stage2, Hd
            # stage2 keeps segment_sum for its 81-wide
            # preconditioner rows (CSR gathers are slower above ~16
            # floats per row); the RHS reduce stays with it for one
            # fused sweep.
            stage2 = flat_stage2(
                lins, buckets, cam_flat, lam, N,
                precond_jacobi=precond_jacobi, csr=None)
            return stage2, None

        def lsolve_fn(consts, lins, aux):
            buckets, csr, cam_flat, pairs, cstrips_, bsr_ = consts
            stage2, Hd = aux
            if bsr_mode:
                from rootba_tpu.solver.linearization import bsr_matvec

                blocks2, diag = Hd

                def matvec(x):
                    return bsr_matvec(blocks2, diag, bsr_, x)
            elif explicit:
                def matvec(x):
                    from rootba_tpu.solver.explicit_sc import (
                        sc_matvec_dense,
                    )

                    return sc_matvec_dense(Hd, x)

                if use_pallas:
                    from rootba_tpu.ops.pallas_cg import pcg_dense_vmem

                    res = pcg_dense_vmem(
                        Hd, stage2.precond_chol, stage2.b,
                        min_num_iterations=(
                            opts.min_linear_solver_iterations),
                        max_num_iterations=(
                            opts.max_linear_solver_iterations),
                        q_tolerance=float(opts.eta),
                        r_tolerance=-1.0,
                        interpret=jax.default_backend() == "cpu",
                    )
                    return (-res.x, stage2, res.num_iterations,
                            res.termination_type)
            else:
                def matvec(x):
                    return flat_matvec(lins, stage2, buckets, cam_flat,
                                       N, x, csr=csr)

            res = pcg(
                matvec,
                lambda r: precond_apply(stage2.precond_chol, r),
                stage2.b,
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
            buckets, csr, cam_flat = consts[:3]
            new_lm_ps, l_diff = flat_back_substitute(
                lins, stage2, buckets, cam_flat, lm_ps, inc,
                compensated=self.compensated)
            inc_scaled = inc * pose_scale
            q, t = lie.apply_inc_pose(cams.q, cams.t, inc_scaled[:, :6])
            intr = cams.intr + inc_scaled[:, 6:9]
            return CamState(q=q, t=t, intr=intr), new_lm_ps, l_diff

        # pure stages; LinearizerBase._finalize_build composes
        # solve_pure and jits, the base class drives the host loop
        self.error_pure = error_fn
        self.stage1_pure = stage1_fn
        self.stage2_pure = stage2_fn
        self.lsolve_pure = lsolve_fn
        self.apply_pure = apply_fn
