"""Square-root (QR) landmark marginalization, TPU-native.

Re-design of the reference qr module (LinearizationQR,
qr/linearization_qr.hpp + qr/impl/landmark_block_base.ipp). The
reference QRs each landmark's storage in place and works with the dense
rows Q2^T [Jp | r]. Here we use the projection identity

    Q2 Q2^T = I - Q1 Q1^T,     [Jl_s; sqrt(lam) I3] = Q1 R   (thin QR)

so the marginalized operator is applied with only the thin factors:

    (Q2^T Jp)^T (Q2^T Jp) x = Jp^T (w - Q1h (Q1h^T w)),  w = Jp x
    (Q2^T Jp)^T  Q2^T r     = Jp^T (r - Q1h (Q1h^T r))

with Q1h the top 2n rows of Q1 (the damping rows of Jp and r are zero).
This is algebraically and numerically equivalent (orthogonal transforms
only -- never forms J^T J or Hll) but stores 24n floats per landmark
instead of the reference's ~2n*(9n+4) storage matrix, and every op is a
batched einsum + segment-sum over the bucket's landmark axis.

Landmark damping is handled by QR-ing the augmented [Jl_s; sqrt(lam) I3]
per solve -- recomputation replaces the reference's Givens damping
add/undo pair (landmark_block_base.ipp:166-210), which is sequential
and pointer-heavy; on TPU the batched re-QR is cheaper than a matvec.

Pose damping adds lam * x to the matvec and lam to the preconditioner
diagonal, like the reference's virtual sqrt(lam) rows
(linearization_qr.hpp:138-152, :329-331, :485-486).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from rootba_tpu.ops.block9 import chol9, chol9_solve
from rootba_tpu.ops.batched_qr import (
    householder_qr3_planar,
    solve_upper,
)
from rootba_tpu.solver.linearization import (
    POSE_SIZE,
    BucketIndex,
    CamCsrIndex,
    CamState,
    LinBucket,
    csr_cam_reduce,
)

Arrays = Tuple[jnp.ndarray, ...]


class SqrtStage2(NamedTuple):
    """Per-lambda marginalization data."""

    Q1h: Arrays  # per bucket [L, n, 2, 3]
    R: Arrays  # per bucket [L, 3, 3] damped upper factor
    b: jnp.ndarray  # [N, 9] RHS = (Q2'Jp)' Q2'r
    precond_chol: jnp.ndarray  # [N, 9, 9] cholesky of precond blocks
    lam: jnp.ndarray  # scalar


def _augmented_qr(lin: LinBucket, lam) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Thin QR of [Jl_s; sqrt(lam) I3] -> (R [L,3,3], Q1h [L,n,2,3])."""
    L, n = lin.Jl.shape[0], lin.Jl.shape[1]
    dtype = lin.Jl.dtype
    # planar [m, 3, L] QR: the row-major [L, m, 3] chain lane-pads
    # every Householder intermediate 3 -> 128 (see
    # householder_qr3_planar)
    Jl2p = jnp.transpose(lin.Jl.reshape(L, 2 * n, 3), (1, 2, 0))
    dampp = jnp.sqrt(lam).astype(dtype) * jnp.broadcast_to(
        jnp.eye(3, dtype=dtype)[:, :, None], (3, 3, L)
    )
    augp = jnp.concatenate([Jl2p, dampp], axis=0)  # [2n+3, 3, L]
    Rp, Q1p = householder_qr3_planar(augp)
    R = jnp.transpose(Rp, (2, 0, 1))
    Q1 = jnp.transpose(Q1p, (2, 0, 1))
    return R, Q1[:, : 2 * n, :].reshape(L, n, 2, 3)


def _project_out(Q1h: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """w <- (I - Q1h Q1h^T) w  per landmark; w [L,n,2], Q1h [L,n,2,3]."""
    t3 = jnp.einsum("lnrc,lnr->lc", Q1h, w)
    return w - jnp.einsum("lnrc,lc->lnr", Q1h, t3)


def sqrt_stage2(
    lin_buckets: Sequence[LinBucket],
    buckets: Sequence[BucketIndex],
    lam,
    num_cameras: int,
    *,
    precond_jacobi: bool = False,
    precond_diagonal: bool = False,
    csr: CamCsrIndex | None = None,
) -> SqrtStage2:
    """Per-lambda stage 2 (reference get_stage2,
    linearization_qr.hpp:716-815): landmark damping, RHS, SCHUR_JACOBI
    preconditioner blocks -- one fused sweep over each bucket.

    precond_jacobi=True computes JACOBI blocks (Jp^T Jp + lam I,
    reference linearizor_qr.cpp:201-228) instead of SCHUR_JACOBI.
    """
    dtype = lin_buckets[0].Jp.dtype
    b = jnp.zeros((num_cameras, POSE_SIZE), dtype)
    blocks = jnp.zeros((num_cameras, POSE_SIZE, POSE_SIZE), dtype)
    Q1hs = []
    Rs = []
    b_rows = []
    blk_rows_all = []
    for lin, bucket in zip(lin_buckets, buckets):
        R, Q1h = _augmented_qr(lin, lam)
        Q1hs.append(Q1h)
        Rs.append(R)
        flat_idx = bucket.cam_idx.reshape(-1)

        # RHS: Jp^T (r - Q1h Q1h^T r)
        w = _project_out(Q1h, lin.r)
        y = jnp.einsum("lnrj,lnr->lnj", lin.Jp, w)
        if csr is not None:
            b_rows.append(y.reshape(-1, POSE_SIZE))
        else:
            b = b + jax.ops.segment_sum(
                y.reshape(-1, POSE_SIZE), flat_idx,
                num_segments=num_cameras
            )

        # preconditioner blocks. NOTE: computed as broadcast-mul-reduce
        # (not dot_general) and flattened to [O, 81] before the scatter:
        # a materialized [L,n,9,9] dot output gets (8,128) minor-dim
        # tiling on TPU, inflating memory ~25x (OOM at venice scale);
        # the elementwise formulation fuses into the flat layout.
        L, n = lin.Jp.shape[0], lin.Jp.shape[1]

        def gram81(M):  # [O, rows, 9] -> [O, 81], no 9x9 shape anywhere
            A = jnp.repeat(M, POSE_SIZE, axis=2)  # A[o,r,i*9+j] = M[o,r,i]
            B = jnp.tile(M, (1, 1, POSE_SIZE))  # B[o,r,i*9+j] = M[o,r,j]
            return jnp.sum(A * B, axis=1)

        blk = gram81(lin.Jp.reshape(L * n, 2, POSE_SIZE))
        if not precond_jacobi:
            # SCHUR_JACOBI: Jp_i' Jp_i - W_i' W_i, W_i = Q1h_i' Jp_i.
            # W computed 27-wide by repeat/tile (a dot_general producing
            # [L,n,3,9] materializes 19x padded at scale)
            Q1h_f = Q1h.reshape(L * n, 2, 3)
            Jp_f = lin.Jp.reshape(L * n, 2, POSE_SIZE)
            A = jnp.repeat(Q1h_f, POSE_SIZE, axis=2)  # [O,2,27]
            B = jnp.tile(Jp_f, (1, 1, 3))  # [O,2,27]
            W27 = jnp.sum(A * B, axis=1)  # W27[o, c*9+j]
            blk = blk - gram81(W27.reshape(L * n, 3, POSE_SIZE))
        if csr is not None:
            blk_rows_all.append(blk)
        else:
            blocks = blocks + jax.ops.segment_sum(
                blk, flat_idx, num_segments=num_cameras,
            ).reshape(num_cameras, POSE_SIZE, POSE_SIZE)

    if csr is not None:
        b = csr_cam_reduce(b_rows, csr, num_cameras)
        blocks = csr_cam_reduce(blk_rows_all, csr, num_cameras).reshape(
            num_cameras, POSE_SIZE, POSE_SIZE)

    # pose damping on the preconditioner diagonal (both JACOBI's explicit
    # damping vector and SCHUR_JACOBI's += lam, reference
    # linearizor_qr.cpp:216-232, linearization_qr.hpp:485-486)
    blocks = blocks + lam.astype(dtype) * jnp.eye(POSE_SIZE, dtype=dtype)
    if precond_diagonal:
        # scalar DIAGONAL preconditioner (reference
        # preconditioner.hpp:48-69): diagonal of the SCHUR_JACOBI
        # blocks; chol9 of a diagonal block is its elementwise sqrt
        blocks = blocks * jnp.eye(POSE_SIZE, dtype=dtype)
    chol = chol9(blocks)

    return SqrtStage2(Q1h=tuple(Q1hs), R=tuple(Rs), b=b, precond_chol=chol,
                      lam=jnp.asarray(lam, dtype))


def sqrt_matvec(
    lin_buckets: Sequence[LinBucket],
    buckets: Sequence[BucketIndex],
    stage2: SqrtStage2,
    num_cameras: int,
    x: jnp.ndarray,
    csr: CamCsrIndex | None = None,
) -> jnp.ndarray:
    """y = [(Q2'Jp)'(Q2'Jp) + lam I] x   (reference right_multiply,
    linearization_qr.hpp:823-825 -> landmark_block_base.ipp
    add_Q2TJp_T_Q2TJp_mult_x, with the mutex scatter replaced by a
    static camera-CSR gather-reduce, or segment-sum when sharded)."""
    y = stage2.lam.astype(x.dtype) * x
    yb_rows = []
    for lin, bucket, Q1h in zip(lin_buckets, buckets, stage2.Q1h):
        xg = x[bucket.cam_idx]  # [L,n,9]
        w = jnp.einsum("lnrj,lnj->lnr", lin.Jp, xg)
        w = _project_out(Q1h, w)
        yb = jnp.einsum("lnrj,lnr->lnj", lin.Jp, w)
        if csr is not None:
            yb_rows.append(yb.reshape(-1, POSE_SIZE))
        else:
            y = y + jax.ops.segment_sum(
                yb.reshape(-1, POSE_SIZE),
                bucket.cam_idx.reshape(-1),
                num_segments=num_cameras,
            )
    if csr is not None:
        y = y + csr_cam_reduce(yb_rows, csr, num_cameras)
    return y


def precond_apply(chol: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Block-diagonal preconditioner solve via cached Cholesky factors
    (reference BlockDiagonalPreconditioner, cg/preconditioner.hpp:72-143).
    Unrolled 9x9 substitution: this runs inside the PCG loop body, where
    the library triangular_solve's looped lowering dominates the
    iteration cost (see ops/block9)."""
    from rootba_tpu.ops.block9 import chol9_solve

    return chol9_solve(chol, r)


def sqrt_back_substitute(
    lin_buckets: Sequence[LinBucket],
    buckets: Sequence[BucketIndex],
    stage2: SqrtStage2,
    lm_ps: Sequence[jnp.ndarray],
    pose_inc: jnp.ndarray,  # [N,9] in scaled coordinates (true increment)
    compensated: bool = False,
):
    """Landmark back-substitution + exact model-cost decrease
    (reference landmark_block_base.ipp:213-284):

        dl_s  = -R^-1 Q1h^T (r + Jp dp)
        l_diff -= v^T (0.5 v + r),  v = Jp dp + Jl_s dl_s  (undamped rows)
        lm_p  += dl_s * Jl_col_scale

    compensated=True accumulates l_diff with error-free transforms
    (ops.compensated): the sum cancels catastrophically near
    convergence under f32 (SURVEY §7.6), distorting rho = f_diff/l_diff.
    """
    acc_dtype = jnp.result_type(pose_inc.dtype, jnp.float32)
    l_hi = jnp.zeros((), acc_dtype)
    l_lo = jnp.zeros((), acc_dtype)
    new_lm_ps = []
    for lin, bucket, Q1h, R, lm_p in zip(
        lin_buckets, buckets, stage2.Q1h, stage2.R, lm_ps
    ):
        xg = pose_inc[bucket.cam_idx]
        w = jnp.einsum("lnrj,lnj->lnr", lin.Jp, xg)  # Jp dp
        u = lin.r + w
        rhs3 = jnp.einsum("lnrc,lnr->lc", Q1h, u)
        dl_s = -solve_upper(R, rhs3)  # [L,3]
        # guard padded landmark rows (R can be anything there)
        dl_s = jnp.where(bucket.lm_mask[:, None], dl_s, 0.0)

        v = w + jnp.einsum("lnrc,lc->lnr", lin.Jl, dl_s)
        parts = (v * (0.5 * v + lin.r)).astype(acc_dtype)
        if compensated:
            from rootba_tpu.ops.compensated import comp_sum2, two_sum

            bhi, blo = comp_sum2(parts)
            l_hi, e = two_sum(l_hi, -bhi)
            l_lo = l_lo + e - blo
        else:
            l_hi = l_hi - jnp.sum(parts)

        dl = dl_s * lin.Jl_scale
        new_lm_ps.append(lm_p + dl.astype(lm_p.dtype))
    return tuple(new_lm_ps), l_hi + l_lo
