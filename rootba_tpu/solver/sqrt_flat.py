"""Flat-layout SQUARE_ROOT solver: the TPU hot path.

Same projection-form sqrt marginalization as solver.sqrt_qr (see that
module's docstring for the math and reference citations), but every
per-observation tensor is a per-bucket 2-D landmark-row table

    Jp [L, n*18]   Jl [L, n*6]   r [L, n*2]   Q1h [L, n*6]

(one landmark per row, slot-major columns; see FlatLin). Two TPU facts
shape this layout:

1. The (8,128) tiling lane-pads the MINOR dim of any materialized
   row-major array to 128. A monolithic flat [O, 9]-ish array is
   unusable at scale (17-34 GB at final-13682's 33.6M obs slots, both
   as a jit-boundary relayout copy and as a fusion output XLA re-ranks
   a [*, 27] reduce into). Per-bucket [L, n*K] tables bound the
   padding to 128/(n*K), and all per-obs math is written as strictly
   2-D elementwise chains over static column slices.
2. Scatters and per-element gathers cost 10-20x their traffic, so
   camera/pair reductions are presorted static gather-reduces over
   exactly these landmark-row tables (bucketing.CamStrips/PairStrips),
   and camera-parameter reads are one packed-table row gather
   (linearization.packed_cam_table).

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
from rootba_tpu.ops.batched_qr import (
    householder_qr3_planar,
    solve_upper,
)
from rootba_tpu.solver.cg import pcg
from rootba_tpu.solver.linearization import (
    POSE_SIZE,
    CamState,
    _map_rows,
    csr_cam_reduce,
    gather_cam_planes,
    packed_cam_table,
)
from rootba_tpu.solver.sqrt_qr import precond_apply
from rootba_tpu.utils.jax_setup import sync

P9 = POSE_SIZE


class FlatLin(NamedTuple):
    """Stage-1 output: per-bucket 2-D landmark-row tables.

    Every tensor is [L_b, n_b*K] with one landmark per row and slot-
    major columns (slot i occupies cols i*K..(i+1)*K). Why not one
    flat [O, 2, 9] array: a jit-boundary (or relayout-copied) array
    with narrow minor dims gets its minor dim lane-padded to 128 by
    the (8,128) TPU tiling -- 17-34 GB at final-13682's 33.6M obs
    slots. Per-bucket [L, n*18] tables bound the padding to
    128/(n*18) and are exactly the row shape every strip gather-reduce
    consumes (see linearization.csr_pair_outer_strips).

    Jp is stored UNSCALED; the jacobi pose scale S (pose_scale, [N,9])
    is deferred to the per-camera/per-pair consumers: b = S b_u,
    H_ij = S_i H_u,ij S_j, matvec y = lam x + S reduce(Jp_u' ...
    Jp_u (S x)). Applying S per observation costs a [O, 9] gather +
    multiply whose lane-padded materializations are GBs at final-13682
    scale; deferred, it is a handful of [N, 9]/[P, 81] elementwise
    passes."""

    Jp: Tuple[jnp.ndarray, ...]  # per bucket [L, n*18], col i*18+r*9+a
    # Q0R0 packs the UNDAMPED thin-QR factors of the scaled Jl
    # (Jl = Q0 R0, computed once per linearization): cols 0..n*6 are
    # Q0 (col i*6+r*3+c, the layout stage2's Q1h had), cols
    # n*6..n*6+9 are R0 row-major. Why packed: a separate [L, 9] R0
    # table lane-pads 9 -> 128 (2.3 GB at final-13682) while the
    # [L, n*6] table's tail pad is already there (6n+9 never crosses
    # a 128 boundary for the bucket widths 2..8/pow2). Why QR here:
    # the per-lambda damped factors follow from the 6x3 re-QR
    # identity [Q0 R0; sqrt(lam) I] = (Q0 Qt) Rt with [R0; sqrt(lam)
    # I] = Qt Rt -- so stage2 re-QRs 6 rows per landmark instead of
    # 2n+3 (reference landmark_block_base.ipp:166-210 keeps Givens
    # add/undo for the same reason; the TPU form is a planar re-QR).
    Q0R0: Tuple[jnp.ndarray, ...]  # per bucket [L, n*6+9]
    r: Tuple[jnp.ndarray, ...]  # per bucket [L, n*2], col i*2+r
    Jl_scale: Tuple[jnp.ndarray, ...]  # per bucket [L,3]
    pose_scale: jnp.ndarray  # [N,9] deferred jacobi pose scale
    # lambda-independent per-camera Jp'Jp gram [N, 81] (unscaled),
    # computed once per linearization on the explicit-RCS strips path
    # so each backtracking attempt's diagonal-block pass only computes
    # the lambda-dependent W'W part (the reference's stage1/stage2
    # split exists for exactly this reason,
    # linearization_qr.hpp:634-712 vs :716-815); None elsewhere
    diag_jp81: jnp.ndarray | None


class FlatStage2(NamedTuple):
    """Per-lambda marginalization data."""

    Q1h: Tuple[jnp.ndarray, ...]  # per bucket [L, n*6], col i*6+r*3+c
    R: Tuple[jnp.ndarray, ...]  # per bucket [L,3,3]
    b: jnp.ndarray  # [N,9]
    precond_chol: jnp.ndarray  # [N,9,9]
    lam: jnp.ndarray


def _cam_parts(cam_strips) -> bool:
    from rootba_tpu.solver.linearization import cam_parts_mode

    return cam_parts_mode(cam_strips)


def _pair_parts(pairs) -> bool:
    from rootba_tpu.solver.linearization import pair_parts_mode

    return pair_parts_mode(pairs)


def _bucket_offsets(buckets):
    offs = [0]
    for b in buckets:
        L, n = b.cam_idx.shape
        offs.append(offs[-1] + L * n)
    return offs


def flat_linearize(cams, lm_ps, buckets, cam_flat, robust_norm,
                   huber_parameter, use_valid_only, jacobi_eps,
                   jacobi_scaling, csr, num_cameras, cam_strips=None,
                   with_gram=False):
    """Stage 1: linearize + scale_Jl_cols + jacobi pose scaling, all
    buckets in one pass (reference get_stage1 fusion,
    linearization_qr.hpp:634-712). Everything stays 2-D per bucket
    (see FlatLin on why)."""
    from rootba_tpu.ops.planar import robust_sqrt_weight, snavely_planes

    table = packed_cam_table(cams)
    jp_us, jl_parts, r_parts, d2_parts, scales = [], [], [], [], []
    failures = jnp.zeros((), jnp.int32)
    for lm_p, bucket in zip(lm_ps, buckets):
        L, n = bucket.cam_idx.shape

        # the whole per-bucket linearize chain is row-chunked under
        # lax.map: unchunked, the ~20 [L*n]-sized plane transients of
        # every bucket coexist in XLA's schedule -- a runtime HBM OOM
        # at final-13682 (33.6M slots; measured)
        def lin_chunk(ts, n=n):
            lmp_c, cam_c, uv_c, mask_c = ts
            Lc = cam_c.shape[0]
            idx = cam_c.reshape(-1)
            X = jnp.broadcast_to(lmp_c[:, 0:1], (Lc, n)).reshape(-1)
            Y = jnp.broadcast_to(lmp_c[:, 1:2], (Lc, n)).reshape(-1)
            Z = jnp.broadcast_to(lmp_c[:, 2:3], (Lc, n)).reshape(-1)
            res_u, res_v, valid, Jp_pl, Jl_pl = snavely_planes(
                *gather_cam_planes(table, idx), X, Y, Z,
                uv_c[..., 0].reshape(-1), uv_c[..., 1].reshape(-1))
            sw, use_mask = robust_sqrt_weight(
                res_u, res_v, valid, mask_c.reshape(-1), robust_norm,
                huber_parameter, use_valid_only)
            finite = jnp.isfinite(res_u) & jnp.isfinite(res_v)
            for v in Jp_pl + Jl_pl:
                finite = finite & jnp.isfinite(v)
            fail = jnp.sum(jnp.where(use_mask & ~finite, 1, 0
                                     ).reshape(Lc, n), axis=1)
            jp_f = jnp.stack([sw * p for p in Jp_pl],
                             axis=-1)  # [Lc*n,18]
            jl_f = jnp.stack([sw * p for p in Jl_pl],
                             axis=-1)  # [Lc*n,6]
            r_c = jnp.stack([sw * res_u, sw * res_v],
                            axis=-1).reshape(Lc, n * 2)

            # landmark-Jacobian column scaling
            # (landmark_block_base.ipp:572-587): col2[c], both rows
            col2 = (jl_f[:, :3] * jl_f[:, :3]
                    + jl_f[:, 3:] * jl_f[:, 3:])  # [Lc*n,3]
            nrm = jnp.sqrt(jnp.sum(col2.reshape(Lc, n, 3), axis=1))
            scale = 1.0 / (jacobi_eps + nrm)  # [Lc,3]
            se = jnp.broadcast_to(scale[:, None, :],
                                  (Lc, n, 3)).reshape(Lc * n, 3)
            jl_c = (jl_f * jnp.tile(se, (1, 2))).reshape(Lc, n * 6)

            # undamped thin-QR of the scaled Jl, fused into this chunk
            # (Jl itself never reaches HBM; see FlatLin.Q0R0)
            Jl2p = jl_c.T.reshape(2 * n, 3, Lc)
            R0p, Q0p = householder_qr3_planar(Jl2p)
            q0_c = jnp.transpose(Q0p, (2, 0, 1)).reshape(Lc, n * 6)
            r0_c = jnp.transpose(R0p, (2, 0, 1)).reshape(Lc, 9)
            q0r0_c = jnp.concatenate([q0_c, r0_c], axis=1)

            # pose diag^2 contribution [Lc, n*9]
            jp2 = jp_f * jp_f
            d2_c = (jp2[:, :P9] + jp2[:, P9:]).reshape(Lc, n * P9)
            return (jp_f.reshape(Lc, n * 18), q0r0_c, r_c, d2_c,
                    scale, fail)

        jp_b, jl_b, r_b, d2_b, scale_b, fail_b = _map_rows(
            lin_chunk,
            [lm_p, bucket.cam_idx, bucket.obs_uv, bucket.mask], L, n)
        failures = failures + jnp.sum(fail_b)
        r_parts.append(r_b)
        scales.append(scale_b)
        jl_parts.append(jl_b)
        d2_parts.append(d2_b)
        jp_us.append(jp_b)  # unscaled; pose scale applied below

    # pose jacobi scaling (add_Jp_diag2 -> linearizor_qr.cpp:104-110)
    diag_jp81 = None
    if (with_gram and cam_strips is not None
            and _cam_parts(cam_strips)):
        # one strip pass yields the full lambda-independent Jp gram;
        # diag2 is its block diagonal (the d2 tables' reduce is
        # subsumed)
        from rootba_tpu.solver.linearization import cam_gram_strips

        jp_t = tuple(jp_us)
        diag_jp81 = cam_gram_strips([(jp_t, jp_t, 1.0)], buckets,
                                    cam_strips)
        diag2 = jnp.diagonal(
            diag_jp81.reshape(num_cameras, P9, P9), axis1=1, axis2=2)
    elif cam_strips is not None and _cam_parts(cam_strips):
        from rootba_tpu.solver.linearization import cam_reduce_strips

        diag2 = cam_reduce_strips(tuple(d2_parts), buckets, cam_strips)
    elif csr is not None:
        diag2 = csr_cam_reduce(
            [d.reshape(-1, P9) for d in d2_parts], csr, num_cameras)
    else:
        diag2 = jax.ops.segment_sum(
            jnp.concatenate([d.reshape(-1, P9) for d in d2_parts]),
            cam_flat, num_segments=num_cameras)
    if jacobi_scaling:
        pose_scale = 1.0 / (jacobi_eps + jnp.sqrt(diag2))
    else:
        pose_scale = jnp.ones_like(diag2)
    # Jp stays unscaled (see FlatLin: the scale is deferred)
    return (FlatLin(Jp=tuple(jp_us), Q0R0=tuple(jl_parts),
                    r=tuple(r_parts), Jl_scale=tuple(scales),
                    pose_scale=pose_scale, diag_jp81=diag_jp81),
            pose_scale, failures)


def flat_stage2(lin: FlatLin, buckets, cam_flat, lam, num_cameras,
                *, precond_jacobi: bool = False,
                precond_diagonal: bool = False,
                csr=None, with_precond: bool = True,
                cam_strips=None) -> FlatStage2:
    """Stage 2 (reference get_stage2, linearization_qr.hpp:716-815):
    landmark damping via augmented thin-QR, RHS, preconditioner.

    with_precond=False skips the per-obs Gram preconditioner pass; used
    by the explicit-RCS mode, whose diagonal blocks come for free from
    the assembled H (see flat_assemble_rcs)."""
    dtype = lin.Jp[0].dtype

    Q1h_parts = []
    Rs = []
    for bucket, q0r0_b in zip(buckets, lin.Q0R0):
        L, n = bucket.cam_idx.shape

        # damped thin-QR via the 6x3 re-QR identity (see FlatLin.Q0R0):
        # with the undamped Jl = Q0 R0 from stage1, [Jl; sqrt(lam) I] =
        # blockdiag(Q0, I) [R0; sqrt(lam) I], so one planar 6-row QR +
        # a per-landmark 3x3 rotation of Q0 replaces the full
        # (2n+3)-row chain per lambda attempt. Planar [*, 3, L] keeps
        # every intermediate lane-dense (the row-major chain pads
        # 3 -> 128; see householder_qr3_planar)
        def qr_chunk(ts, n=n):
            q0r0_c = ts[0]
            Lc = q0r0_c.shape[0]
            R0p = q0r0_c[:, n * 6:].T.reshape(3, 3, Lc)
            dampp = jnp.sqrt(lam).astype(dtype) * jnp.broadcast_to(
                jnp.eye(3, dtype=dtype)[:, :, None], (3, 3, Lc))
            augp = jnp.concatenate([R0p, dampp], axis=0)  # [6,3,Lc]
            Rtp, Qtp = householder_qr3_planar(augp)
            R_c = jnp.transpose(Rtp, (2, 0, 1))
            Q0p = q0r0_c[:, :n * 6].T.reshape(2 * n, 3, Lc)
            Qt3 = Qtp[:3]  # [3(c), 3(c'), Lc]
            Q1p = (Q0p[:, 0:1, :] * Qt3[0][None]
                   + Q0p[:, 1:2, :] * Qt3[1][None]
                   + Q0p[:, 2:3, :] * Qt3[2][None])  # [2n,3,Lc]
            q = jnp.transpose(Q1p, (2, 0, 1)).reshape(Lc, n * 6)
            return R_c, q

        R, Q1h_b = _map_rows(qr_chunk, [q0r0_b], L, n)
        Rs.append(R)
        # materialize each bucket's Q1h once: it feeds several
        # consumers (RHS projection, RCS assembly, CG matvec) and XLA
        # otherwise duplicates the whole QR into each fusion (~3x
        # stage2 cost, benchmarks/rcs_assemble_bench.py)
        Q1h_parts.append(jax.lax.optimization_barrier(Q1h_b))
    Q1h = tuple(Q1h_parts)

    # RHS: Jp^T (r - Q1h Q1h^T r), all 2-D per bucket, row-chunked
    ybp = []
    for bucket, q_b, r_b, jp_b in zip(buckets, Q1h, lin.r, lin.Jp):
        L, n = bucket.cam_idx.shape

        def rhs_chunk(ts, n=n):
            q_c, r_c, jp_c = ts
            Lc = q_c.shape[0]
            qf = q_c.reshape(Lc * n, 6)
            rf = r_c.reshape(Lc * n, 2)
            jpf = jp_c.reshape(Lc * n, 18)
            p3 = (qf[:, :3] * rf[:, 0:1] + qf[:, 3:] * rf[:, 1:2])
            t3 = jnp.sum(p3.reshape(Lc, n, 3), axis=1)  # [Lc,3]
            t3e = jnp.broadcast_to(t3[:, None, :],
                                   (Lc, n, 3)).reshape(Lc * n, 3)
            wp0 = rf[:, 0] - jnp.sum(qf[:, :3] * t3e, axis=1)
            wp1 = rf[:, 1] - jnp.sum(qf[:, 3:] * t3e, axis=1)
            yb = (jpf[:, :P9] * wp0[:, None]
                  + jpf[:, P9:] * wp1[:, None])  # [Lc*n,9]
            return yb.reshape(Lc, n * P9)

        ybp.append(_map_rows(rhs_chunk, [q_b, r_b, jp_b], L, n))
    if cam_strips is not None and _cam_parts(cam_strips):
        from rootba_tpu.solver.linearization import cam_reduce_strips

        b = cam_reduce_strips(tuple(ybp), buckets, cam_strips)
    elif cam_strips is not None:
        from rootba_tpu.solver.linearization import cam_reduce_strips

        b = cam_reduce_strips(
            jnp.concatenate([y.reshape(-1, P9) for y in ybp]),
            buckets, cam_strips)
    elif csr is not None:
        b = csr_cam_reduce([y.reshape(-1, P9) for y in ybp], csr,
                           num_cameras)
    else:
        b = jax.ops.segment_sum(
            jnp.concatenate([y.reshape(-1, P9) for y in ybp]),
            cam_flat, num_segments=num_cameras)
    b = b * lin.pose_scale  # deferred jacobi pose scale (see FlatLin)

    if not with_precond:
        return FlatStage2(Q1h=Q1h, R=tuple(Rs), b=b,
                          precond_chol=jnp.zeros((0, P9, P9), dtype),
                          lam=jnp.asarray(lam, dtype))

    # preconditioner blocks: JACOBI = sum Jp_o' Jp_o; SCHUR_JACOBI
    # subtracts W' W with W = Q1h_o' Jp_o (per obs; Jp's block structure
    # makes cross-obs terms vanish on the diagonal blocks). Flattened to
    # [*, 81] before the camera reduction (9x9 minor dims would be
    # tile-padded ~25x if materialized).
    def gram81_2d(rows):  # list of [*, 9] row strips -> [*, 81]
        out = None
        for m in rows:
            t = jnp.repeat(m, P9, axis=1) * jnp.tile(m, (1, P9))
            out = t if out is None else out + t
        return out

    blocks = jnp.zeros((num_cameras, P9 * P9), dtype)
    for bucket, q_b, jp_b in zip(buckets, Q1h, lin.Jp):
        L, n = bucket.cam_idx.shape
        qf = q_b.reshape(L * n, 6)
        jpf = jp_b.reshape(L * n, 18)
        blk = gram81_2d([jpf[:, :P9], jpf[:, P9:]])
        if not precond_jacobi:
            W27 = (jnp.repeat(qf[:, :3], P9, axis=1)
                   * jnp.tile(jpf[:, :P9], (1, 3))
                   + jnp.repeat(qf[:, 3:], P9, axis=1)
                   * jnp.tile(jpf[:, P9:], (1, 3)))
            blk = blk - gram81_2d(
                [W27[:, c * P9:(c + 1) * P9] for c in range(3)])
        blocks = blocks + jax.ops.segment_sum(
            blk, bucket.cam_idx.reshape(-1), num_segments=num_cameras)
    # deferred pose scale: both gram terms scale as S blk_u S
    ps = lin.pose_scale
    blocks = blocks * (jnp.repeat(ps, P9, axis=1)
                       * jnp.tile(ps, (1, P9)))
    blocks = blocks.reshape(num_cameras, P9, P9)
    blocks = blocks + lam.astype(dtype) * jnp.eye(P9, dtype=dtype)
    if precond_diagonal:
        # scalar DIAGONAL preconditioner (reference
        # preconditioner.hpp:48-69): keep only the matrix diagonal;
        # chol9 of a diagonal block is its elementwise sqrt, so the
        # block machinery (incl. the Pallas CG) applies unchanged
        blocks = blocks * jnp.eye(P9, dtype=dtype)
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

    Hup, diag81 = _sandwich_rows(lin, stage2, buckets, pairs,
                                 cam_strips)
    if Hup is not None:
        return assemble_rcs_dense(
            lin.Jp, lin.Jp, None, cam_flat, csr, pairs, stage2.lam,
            num_cameras, buckets=buckets, cam_strips=cam_strips,
            pose_scale=lin.pose_scale, pair_rows=Hup, diag81=diag81)
    Wa, Wb, terms = _rcs_factors(lin, stage2, buckets, pairs,
                                 cam_strips)
    diag81 = _cached_diag81(lin, Wa, buckets, cam_strips)
    return assemble_rcs_dense(
        Wa, Wb, terms, cam_flat, csr, pairs, stage2.lam, num_cameras,
        buckets=buckets, cam_strips=cam_strips,
        pose_scale=lin.pose_scale, diag81=diag81)


def flat_assemble_rcs_bsr(lin: FlatLin, stage2: FlatStage2, cam_flat,
                          pairs, num_cameras, csr=None, buckets=None,
                          cam_strips=None, symmetric=False):
    """Block-sparse form of flat_assemble_rcs (same H, no densify):
    for camera counts whose dense [9G, 9G] system exceeds HBM but whose
    unique-pair structure is sparse. Returns
    (blocks2 [2P,81], diag [N,9,9]), or ([P,81] strict-pair half table
    with symmetric=True -- the mode for final-13682-scale clustered
    pair graphs, see linearization.bsr_matvec_sym)."""
    from rootba_tpu.solver.linearization import assemble_rcs_bsr

    Hup, diag81 = _sandwich_rows(lin, stage2, buckets, pairs,
                                 cam_strips)
    if Hup is not None:
        return assemble_rcs_bsr(
            lin.Jp, lin.Jp, None, cam_flat, csr, pairs, stage2.lam,
            num_cameras, buckets=buckets, cam_strips=cam_strips,
            pose_scale=lin.pose_scale, pair_rows=Hup, diag81=diag81,
            symmetric=symmetric)
    Wa, Wb, terms = _rcs_factors(lin, stage2, buckets, pairs,
                                 cam_strips)
    diag81 = _cached_diag81(lin, Wa, buckets, cam_strips)
    return assemble_rcs_bsr(
        Wa, Wb, terms, cam_flat, csr, pairs, stage2.lam, num_cameras,
        buckets=buckets, cam_strips=cam_strips,
        pose_scale=lin.pose_scale, diag81=diag81, symmetric=symmetric)


def _cached_diag81(lin: FlatLin, Wa, buckets, cam_strips):
    """Diagonal-block rows using the stage1-cached Jp gram: per attempt
    only the lambda-dependent -W'W part is reduced (one strip pass over
    one table instead of two; see FlatLin.diag_jp81). None -> the
    assembler's own diag_terms path."""
    if lin.diag_jp81 is None or not isinstance(Wa, (tuple, list)):
        return None
    from rootba_tpu.solver.linearization import cam_gram_strips

    return lin.diag_jp81 + cam_gram_strips([(Wa, Wa, -1.0)], buckets,
                                           cam_strips)


# above this many obs slots, the explicit-RCS assembly switches to the
# W-free sandwich form (sqrt_ww_pair_strips): holding the [sum L, n*27]
# W tables costs 108 B/slot of HBM (3.6 GB at final-13682) while the
# sandwich trades them for a second slot gather per pair. r3 set the
# crossover at 16M slots after a measured OOM; with the r4 memory
# layout (Jl replaced by same-size Q0R0, CamCsr dropped, leaner
# stage2) final-13682's 33.6M slots FIT on the W path and run 1.65x
# faster (10.4 vs 17.2 s/LM-iter, measured back-to-back), so the
# sandwich now starts beyond that. Module global so tests can force
# the path at toy size.
_SANDWICH_MIN_SLOTS = 48_000_000

# materialized-W table budget for the stream path (see _rcs_factors):
# above this many bytes the stream reducers gather (Q1h, Jp) factor
# rows and build W post-gather instead. Module global so tests can
# force the fused path at toy size.
_FUSED_W_MIN_BYTES = 1_500_000_000


def _sandwich_rows(lin, stage2, buckets, pairs, cam_strips):
    """W-free pair/diag rows for the sqrt RCS assembly (see
    linearization.sqrt_ww_pair_strips): used when the strip indices
    are leftover-free AND the problem is past _SANDWICH_MIN_SLOTS.
    Returns (Hup [P,81], diag81 [N,81]) or (None, None)."""
    from rootba_tpu.solver.linearization import (
        PairStripsIndex,
        sqrt_ww_diag_strips,
        sqrt_ww_pair_strips,
    )

    # the W-free sandwich is implemented on the leftover-free STRIPS
    # machinery only (sqrt_ww_pair_strips walks pattern groups); the
    # stream index takes the normal W-table path
    parts = (cam_strips is not None and _cam_parts(cam_strips)
             and isinstance(pairs, PairStripsIndex)
             and pairs.wi_idx.shape[0] == 0)
    slots = sum(b.cam_idx.shape[0] * b.cam_idx.shape[1]
                for b in buckets)
    if not parts or slots < _SANDWICH_MIN_SLOTS:
        return None, None
    Hup = sqrt_ww_pair_strips(stage2.Q1h, lin.Jp, buckets, pairs)
    diag81 = sqrt_ww_diag_strips(stage2.Q1h, lin.Jp, buckets,
                                 cam_strips)
    return Hup, diag81


def _rcs_factors(lin: FlatLin, stage2: FlatStage2, buckets, pairs,
                 cam_strips):
    """(strip_a, strip_b, diag_terms) for the sqrt RCS assembly:
    W = Q1h'Jp pair factors plus the Jp'Jp - W'W diagonal terms.

    With a leftover-free strips index, W and the Jp tables are built
    per bucket as [L, n*27]/[L, n*18] landmark-strip tables straight
    from per-bucket slices -- a flat [O, 27] row-major W lane-pads
    27 -> 128 (17.2 GB at final-13682; see csr_pair_outer_strips)."""
    from rootba_tpu.solver.linearization import PairStripsIndex

    from rootba_tpu.ops.pallas_fold import (
        w_build_available,
        w_build_table,
    )

    parts = (cam_strips is not None and _cam_parts(cam_strips)
             and _pair_parts(pairs))
    # fused-W streaming: above the table budget, never materialize the
    # [O, 27] W table -- the stream reducers gather the Q1h (6 f32) and
    # Jp (18 f32) slot rows and build W rows post-gather (24 gathered
    # bytes/slot instead of 27, zero resident table; 3.1 GB at
    # final-13682). Below the budget the materialized (Pallas-built)
    # table wins: it is read once per pair SIDE, and venice-scale
    # tables fit comfortably.
    from rootba_tpu.solver.linearization import (
        CamStreamIndex,
        PairStreamIndex,
        StreamFactors,
    )

    total_slots = sum(b.cam_idx.shape[0] * b.cam_idx.shape[1]
                      for b in buckets)
    itemsize = jnp.dtype(lin.Jp[0].dtype).itemsize
    if (parts and isinstance(pairs, PairStreamIndex)
            and isinstance(cam_strips, CamStreamIndex)
            and total_slots * 27 * itemsize > _FUSED_W_MIN_BYTES):
        Wt = StreamFactors(q=tuple(stage2.Q1h), jp=tuple(lin.Jp))
        return Wt, Wt, [(lin.Jp, lin.Jp, 1.0), (Wt, Wt, -1.0)]
    use_pallas = w_build_available(lin.Jp[0].dtype)
    Wp = []
    for bucket, q_b, jp_b in zip(buckets, stage2.Q1h, lin.Jp):
        L, n = bucket.cam_idx.shape

        if use_pallas and w_build_available(q_b.dtype, n):
            # whole chain in VMEM (no lane-padded repeat/tile
            # intermediates): measured 106 -> 29 ms across the venice
            # buckets (ops/pallas_fold.py). Buckets wider than
            # W_BUILD_MAX_N fall through to the elementwise path
            # (the kernel's expansion matrices scale O(n^2) in VMEM).
            Wp.append(w_build_table(q_b, jp_b, n))
            continue

        # W[o, c*9+a] = sum_r Q1h[o,r*3+c] Jp[o,r*9+a], as a strictly
        # 2-D elementwise chain (rank-3 [*, 3, 9] values get
        # (4,128)-tile-padded 19x when materialized), row-chunked
        # under lax.map (see _map_rows)
        def w_chunk(ts, n=n):
            q_c, jp_c = ts
            Lc = q_c.shape[0]
            qf = q_c.reshape(Lc * n, 6)
            jpf = jp_c.reshape(Lc * n, 18)
            W27 = (jnp.repeat(qf[:, :3], P9, axis=1)
                   * jnp.tile(jpf[:, :P9], (1, 3))
                   + jnp.repeat(qf[:, 3:], P9, axis=1)
                   * jnp.tile(jpf[:, P9:], (1, 3)))
            return W27.reshape(Lc, n * 3 * P9)

        Wp.append(_map_rows(w_chunk, [q_b, jp_b], L, n))
    if parts:
        Wt = tuple(Wp)
        return Wt, Wt, [(lin.Jp, lin.Jp, 1.0), (Wt, Wt, -1.0)]
    # flat [O, K, 9] form for the per-obs (PairCsr) index
    W = jnp.concatenate(
        [w.reshape(-1, 3, P9) for w in Wp], axis=0)
    Jpf = jnp.concatenate(
        [j.reshape(-1, 2, P9) for j in lin.Jp], axis=0)
    return W, W, [(Jpf, Jpf, 1.0), (W, W, -1.0)]


def flat_matvec(lin: FlatLin, stage2: FlatStage2, buckets, cam_flat,
                num_cameras, x, csr=None):
    """y = [(Q2'Jp)'(Q2'Jp) + lam I] x (right_multiply,
    linearization_qr.hpp:823-825); per bucket, 2-D. Jp is unscaled:
    y = lam x + S reduce(Jp_u' ... Jp_u (S x)) (deferred jacobi pose
    scale, see FlatLin)."""
    xs = x * lin.pose_scale
    ybp = []
    for bucket, q_b, jp_b in zip(buckets, stage2.Q1h, lin.Jp):
        L, n = bucket.cam_idx.shape
        qf = q_b.reshape(L * n, 6)
        jpf = jp_b.reshape(L * n, 18)
        xg = jnp.take(xs, bucket.cam_idx.reshape(-1), axis=0)
        w0 = jnp.sum(jpf[:, :P9] * xg, axis=1)
        w1 = jnp.sum(jpf[:, P9:] * xg, axis=1)
        p3 = qf[:, :3] * w0[:, None] + qf[:, 3:] * w1[:, None]
        t3 = jnp.sum(p3.reshape(L, n, 3), axis=1)
        t3e = jnp.broadcast_to(t3[:, None, :],
                               (L, n, 3)).reshape(L * n, 3)
        wp0 = w0 - jnp.sum(qf[:, :3] * t3e, axis=1)
        wp1 = w1 - jnp.sum(qf[:, 3:] * t3e, axis=1)
        ybp.append(jpf[:, :P9] * wp0[:, None]
                   + jpf[:, P9:] * wp1[:, None])
    if csr is not None:
        red = csr_cam_reduce(ybp, csr, num_cameras)
    else:
        red = jax.ops.segment_sum(
            jnp.concatenate(ybp, axis=0), cam_flat,
            num_segments=num_cameras)
    return stage2.lam.astype(x.dtype) * x + lin.pose_scale * red


def flat_back_substitute(lin: FlatLin, stage2: FlatStage2, buckets,
                         cam_flat, lm_ps, pose_inc,
                         compensated: bool = False):
    """Landmark back-substitution + model cost decrease
    (landmark_block_base.ipp:213-284).

    compensated=True accumulates l_diff with error-free transforms
    (see ops.compensated; the sum cancels under f32 near convergence).

    Every per-obs intermediate is per-bucket and 2-D: one global
    pose_inc[cam_flat] gather materializes a [O, 9] row-major fusion
    output (lane-padded to 17.2 GB at final-13682); the per-bucket
    chain is bounded by max_bucket_obs."""
    acc_dtype = jnp.result_type(pose_inc.dtype, jnp.float32)

    # deferred pose scale: w = (Jp_u S) inc = Jp_u (S inc)
    inc_pre = pose_inc * lin.pose_scale
    new_lm_ps = []
    bucket_sums = []
    for bucket, jp_b, q0r0_b, r_b, q_b, R, scale, lm_p in zip(
            buckets, lin.Jp, lin.Q0R0, lin.r, stage2.Q1h, stage2.R,
            lin.Jl_scale, lm_ps):
        L, n = bucket.cam_idx.shape

        def bsub_chunk(ts, n=n):
            jp_c, q0r0_c, r_c, q_c, cam_c, mask_c, R_c, sc_c, lm_c = ts
            Lc = jp_c.shape[0]
            jpf = jp_c.reshape(Lc * n, 18)
            rf = r_c.reshape(Lc * n, 2)
            qf = q_c.reshape(Lc * n, 6)
            xg = jnp.take(inc_pre, cam_c.reshape(-1), axis=0)
            w0 = jnp.sum(jpf[:, :P9] * xg, axis=1)
            w1 = jnp.sum(jpf[:, P9:] * xg, axis=1)
            u0 = rf[:, 0] + w0
            u1 = rf[:, 1] + w1
            p3 = qf[:, :3] * u0[:, None] + qf[:, 3:] * u1[:, None]
            rhs = jnp.sum(p3.reshape(Lc, n, 3), axis=1)  # [Lc,3]
            dl_s = -solve_upper(R_c, rhs)
            dl_s = jnp.where(mask_c[:, None], dl_s, 0.0)
            new_lm = lm_c + (dl_s * sc_c).astype(lm_c.dtype)
            # Jl dl = Q0 (R0 dl) (Jl itself is not stored; FlatLin.Q0R0)
            R0_c = q0r0_c[:, n * 6:].reshape(Lc, 3, 3)
            rdl = jnp.sum(R0_c * dl_s[:, None, :], axis=2)  # [Lc,3]
            rdl_e = jnp.broadcast_to(
                rdl[:, None, :], (Lc, n, 3)).reshape(Lc * n, 3)
            q0f = q0r0_c[:, :n * 6].reshape(Lc, n, 6).reshape(Lc * n, 6)
            v0 = w0 + jnp.sum(q0f[:, :3] * rdl_e, axis=1)
            v1 = w1 + jnp.sum(q0f[:, 3:] * rdl_e, axis=1)
            parts = (v0 * (0.5 * v0 + rf[:, 0])
                     + v1 * (0.5 * v1 + rf[:, 1])).astype(acc_dtype)
            return new_lm, jnp.sum(parts.reshape(Lc, n), axis=1)

        new_lm, lsum = _map_rows(
            bsub_chunk,
            [jp_b, q0r0_b, r_b, q_b, bucket.cam_idx, bucket.lm_mask,
             R, scale, lm_p], L, n)
        new_lm_ps.append(new_lm)
        if compensated:
            from rootba_tpu.ops.compensated import comp_sum

            bucket_sums.append(comp_sum(lsum))
        else:
            bucket_sums.append(jnp.sum(lsum))
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
        # scalar DIAGONAL = diag of the SCHUR_JACOBI blocks
        # (reference preconditioner.hpp:48-69)
        precond_diag = (opts.preconditioner_type
                        == PreconditionerType.DIAGONAL)
        if opts.preconditioner_type not in (
                PreconditionerType.JACOBI, PreconditionerType.SCHUR_JACOBI,
                PreconditionerType.DIAGONAL):
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
            if opts.pair_gather == "stream":
                from rootba_tpu.bal.bucketing import build_pair_stream
                from rootba_tpu.solver.linearization import (
                    PairStreamIndex,
                )

                pairs_host = build_pair_stream(
                    self.bp.buckets, N, grid_n=grid,
                    dense_grid=explicit)
                pairs = PairStreamIndex.from_host(pairs_host)
            elif opts.pair_gather == "strips":
                from rootba_tpu.bal.bucketing import build_pair_strips
                from rootba_tpu.solver.linearization import (
                    PairStripsIndex,
                )

                pairs_host = build_pair_strips(
                    self.bp.buckets, N, grid_n=grid,
                    dense_grid=explicit,
                    min_group=opts.effective_strip_min_group(self.bp.num_observations))
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
        # static decision: symmetric-half BSR storage when the packed
        # run-major table would exceed the HBM budget (see
        # linearization.make_bsr_matvec) -- stage2 then assembles the
        # [P, 81] strict-pair table instead of [2P, 81]
        bsr_sym = False
        if bsr is not None:
            from rootba_tpu.solver.linearization import (
                bsr_symmetric_fits,
            )

            bsr_sym = bsr_symmetric_fits(
                bsr, jnp.dtype(self.dtype).itemsize,
                int(opts.bsr_pack_max_gb * (1 << 30)))
        self.bsr_sym = bsr_sym
        # camera-strip reduce index (same small-table gather economics
        # as the pair strips; see bucketing.CamStrips) for the RHS /
        # diagonal-block / diag2 per-camera reductions
        cstrips = None
        # leftover-free strips + BSR never touch the CamCsr fallback;
        # dropping it saves its [~O]-sized device index tables
        # (~0.3 GB at final-13682, part of the HBM envelope)
        if bsr_mode and (
                opts.pair_gather == "stream"
                or (opts.pair_gather == "strips"
                    and opts.effective_strip_min_group(
                        self.bp.num_observations) == 0)):
            self.cam_csr = None
        if (explicit or bsr_mode) and opts.pair_gather == "stream":
            from rootba_tpu.bal.bucketing import build_cam_stream
            from rootba_tpu.solver.linearization import CamStreamIndex

            cstrips = CamStreamIndex.from_host(
                build_cam_stream(self.bp.buckets, N))
        elif (explicit or bsr_mode) and opts.pair_gather == "strips":
            from rootba_tpu.bal.bucketing import build_cam_strips
            from rootba_tpu.solver.linearization import CamStripsIndex

            cstrips = CamStripsIndex.from_host(build_cam_strips(
                self.bp.buckets, N,
                min_group=opts.effective_strip_min_group(self.bp.num_observations)))
        self.consts = (self.buckets, self.cam_csr, cam_flat, pairs,
                       cstrips, bsr)
        use_valid = opts.use_projection_validity_check()

        def error_fn(consts, cams, lm_ps):
            from rootba_tpu.solver.linearization import (
                compute_error_buckets,
            )

            return compute_error_buckets(
                cams, lm_ps, consts[0], self.robust_norm, self.huber)

        # stage1 caches the Jp gram only when the per-attempt assembly
        # will consume it: not under the W-free sandwich (its diag
        # comes from sqrt_ww_diag_strips; computing the gram at
        # final-13682's 33M slots would waste a full strip pass per
        # iteration)
        slots = sum(b.cam_idx.shape[0] * b.cam_idx.shape[1]
                    for b in self.buckets)
        sandwich = (slots >= _SANDWICH_MIN_SLOTS
                    and opts.pair_gather == "strips"
                    and opts.effective_strip_min_group(
                        self.bp.num_observations) == 0)
        with_gram = (explicit or bsr_mode) and not sandwich

        def stage1_fn(consts, cams, lm_ps):
            buckets, csr, cam_flat = consts[:3]
            cstrips_ = consts[4] if len(consts) > 4 else None
            return flat_linearize(
                cams, lm_ps, buckets, cam_flat, self.robust_norm,
                self.huber, use_valid, self.jacobi_eps,
                opts.jacobi_scaling, csr, N, cam_strips=cstrips_,
                with_gram=with_gram)

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
                    from rootba_tpu.solver.linearization import (
                        bsr_build_table,
                    )

                    # always assemble the strict-pair HALF table (in-
                    # place chunked scale+negate), then expand to the
                    # packed run-major form here when it fits -- the
                    # [2P, 81] both-direction intermediate never exists
                    # (final-4585 r5 OOM)
                    half, diag = flat_assemble_rcs_bsr(
                        lins, stage2, cam_flat, pairs, N, csr=csr,
                        buckets=buckets, cam_strips=cstrips_,
                        symmetric=True)
                    Hd = (bsr_build_table(half, bsr, bsr_sym), diag)
                else:
                    Hd, diag = flat_assemble_rcs(lins, stage2, cam_flat,
                                                 pairs, N, csr=csr,
                                                 buckets=buckets,
                                                 cam_strips=cstrips_)
                if not precond_jacobi:
                    if precond_diag:
                        # scalar DIAGONAL: drop the off-diagonals of
                        # the assembled-H blocks before the factor
                        diag = diag * jnp.eye(P9, dtype=diag.dtype)
                    chol = chol9(diag)
                    stage2 = stage2._replace(precond_chol=chol)
                return stage2, Hd
            # stage2 keeps segment_sum for its 81-wide
            # preconditioner rows (CSR gathers are slower above ~16
            # floats per row); the RHS reduce stays with it for one
            # fused sweep.
            stage2 = flat_stage2(
                lins, buckets, cam_flat, lam, N,
                precond_jacobi=precond_jacobi,
                precond_diagonal=precond_diag, csr=None)
            return stage2, None

        def lsolve_fn(consts, lins, aux):
            buckets, csr, cam_flat, pairs, cstrips_, bsr_ = consts
            stage2, Hd = aux
            if bsr_mode:
                from rootba_tpu.solver.linearization import (
                    bsr_table_matvec,
                )

                table, diag = Hd
                matvec = bsr_table_matvec(table, diag, bsr_, bsr_sym)
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

            # explicit per-block inverse once per solve: the unrolled
            # 18-step substitution chain costs ~0.8 ms per application
            # inside the CG loop at venice scale (ops/block9.chol9_inv)
            from rootba_tpu.ops.block9 import chol9_inv, inv9_apply

            pinv = chol9_inv(stage2.precond_chol)
            res = pcg(
                matvec,
                lambda r: inv9_apply(pinv, r),
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
