"""Batched linearization of bucketed BAL problems.

TPU re-design of the reference's per-landmark storage fill
(qr/impl/landmark_block_base.ipp:89-147 linearize_landmark and
sc/landmark_block.hpp:116-166): for every bucket, residuals and
robust-weighted Jacobians of all (landmark, obs) slots are produced as
padded dense tensors in one fused pass

    Jp [L, n, 2, 9]   pose+intrinsics Jacobian  (sqrt-weighted, masked)
    Jl [L, n, 2, 3]   landmark Jacobian          (sqrt-weighted, masked)
    r  [L, n, 2]      residual                   (sqrt-weighted, masked)

plus the landmark-Jacobian column scaling (scale_Jl_cols,
landmark_block_base.ipp:572-587) and the global pose-Jacobian column
norms (add_Jp_diag2 -> jacobi scaling, linearizor_qr.cpp:104-110),
whose per-camera accumulation is a segment-sum instead of the
reference's mutex scatter.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rootba_tpu.core.projection import linearize_point
from rootba_tpu.core.residuals import (
    ResidualInfo,
    accumulate_residual_info,
    empty_residual_info,
    join_residual_info,
)

POSE_SIZE = 9


class CamState(NamedTuple):
    q: jnp.ndarray  # [N,4]
    t: jnp.ndarray  # [N,3]
    intr: jnp.ndarray  # [N,3]


class BucketIndex(NamedTuple):
    """Static per-bucket index data (device arrays, never updated)."""

    obs_uv: jnp.ndarray  # [L,n,2]
    cam_idx: jnp.ndarray  # [L,n] int32
    mask: jnp.ndarray  # [L,n] bool
    lm_mask: jnp.ndarray  # [L] bool


class LinBucket(NamedTuple):
    """Linearized (stage-1) data of one bucket."""

    Jp: jnp.ndarray  # [L,n,2,9] sqrt-weighted, masked, maybe pose-scaled
    Jl: jnp.ndarray  # [L,n,2,3] sqrt-weighted, masked, Jl-col-scaled
    r: jnp.ndarray  # [L,n,2]
    Jl_scale: jnp.ndarray  # [L,3] (1/(eps+||col||))


def linearize_bucket(
    cams: CamState,
    lm_p: jnp.ndarray,
    bucket: BucketIndex,
    robust_norm: int,
    huber_parameter: float,
    use_valid_projections_only: bool,
    jacobi_scaling_eps: float,
):
    """Linearize one bucket. Returns (LinBucket-without-Jl-scaling
    applied yet, jp_diag2 contribution [N,9], num_valid_failures)."""
    from rootba_tpu.core.residuals import compute_error_weight

    q = cams.q[bucket.cam_idx]  # [L,n,4]
    t = cams.t[bucket.cam_idx]
    intr = cams.intr[bucket.cam_idx]
    p = lm_p[:, None, :]  # [L,1,3] broadcast over obs

    res, valid, Jp, Jl = linearize_point(
        jnp.broadcast_to(p, q.shape[:-1] + (3,)), bucket.obs_uv, q, t, intr
    )

    res_squared = jnp.sum(res * res, axis=-1)  # [L,n]
    _, weight = compute_error_weight(res_squared, robust_norm, huber_parameter)
    sqrt_weight = jnp.sqrt(weight)

    use_mask = bucket.mask
    if use_valid_projections_only:
        use_mask = use_mask & valid
    w = jnp.where(use_mask, sqrt_weight, 0.0)  # [L,n]

    Jp = Jp * w[..., None, None]
    Jl = Jl * w[..., None, None]
    r = res * w[..., None]

    # numerical validity over used slots (reference
    # landmark_block_base.ipp:120-125): any non-finite J/res is failure
    finite = (
        jnp.all(jnp.isfinite(Jp), axis=(-2, -1))
        & jnp.all(jnp.isfinite(Jl), axis=(-2, -1))
        & jnp.all(jnp.isfinite(res), axis=-1)
    )
    num_failures = jnp.sum(jnp.where(use_mask & ~finite, 1, 0))

    return LinBucket(Jp=Jp, Jl=Jl, r=r, Jl_scale=jnp.zeros(())), num_failures


def scale_jl_cols(lin: LinBucket, jacobi_scaling_eps: float) -> LinBucket:
    """Landmark-Jacobian column scaling 1/(eps + ||col||)
    (reference landmark_block_base.ipp:572-587), per landmark over all
    its (2n) rows."""
    L, n = lin.Jl.shape[0], lin.Jl.shape[1]
    cols = lin.Jl.reshape(L, 2 * n, 3)
    norms = jnp.linalg.norm(cols, axis=1)  # [L,3]
    scale = 1.0 / (jacobi_scaling_eps + norms)
    Jl = (cols * scale[:, None, :]).reshape(lin.Jl.shape)
    return lin._replace(Jl=Jl, Jl_scale=scale)


def jp_diag2(lin: LinBucket, cam_idx: jnp.ndarray, num_cameras: int):
    """Per-camera column squared norms of Jp (add_Jp_diag2,
    landmark_block_base.ipp: add_Jp_diag2), as a segment-sum."""
    contrib = jnp.sum(lin.Jp * lin.Jp, axis=-2)  # [L,n,9]
    return jax.ops.segment_sum(
        contrib.reshape(-1, POSE_SIZE),
        cam_idx.reshape(-1),
        num_segments=num_cameras,
    )


def jp_t_jp_blockdiag(lin: LinBucket, cam_idx: jnp.ndarray,
                      num_cameras: int):
    """Per-camera 9x9 Gram blocks of Jp (add_Jp_T_Jp_blockdiag), used
    by the JACOBI preconditioner of the QR solver."""
    blocks = jnp.einsum("lnri,lnrj->lnij", lin.Jp, lin.Jp)
    return jax.ops.segment_sum(
        blocks.reshape(-1, POSE_SIZE, POSE_SIZE),
        cam_idx.reshape(-1),
        num_segments=num_cameras,
    )


def scale_jp_cols(lin: LinBucket, cam_idx: jnp.ndarray,
                  pose_scale: jnp.ndarray) -> LinBucket:
    """Apply the per-camera 9-vector jacobi scaling to Jp columns
    (scale_Jp_cols, landmark_block_base.ipp:589-614)."""
    s = pose_scale[cam_idx]  # [L,n,9]
    return lin._replace(Jp=lin.Jp * s[..., None, :])


def compute_error_buckets(
    cams: CamState,
    lm_ps: Sequence[jnp.ndarray],
    buckets: Sequence[BucketIndex],
    robust_norm: int,
    huber_parameter: float,
) -> ResidualInfo:
    """Whole-problem cost evaluation (reference
    bal_bundle_adjustment_helper.cpp:67-109 compute_error)."""
    info = empty_residual_info()
    for lm_p, bucket in zip(lm_ps, buckets):
        q = cams.q[bucket.cam_idx]
        t = cams.t[bucket.cam_idx]
        intr = cams.intr[bucket.cam_idx]
        p = jnp.broadcast_to(lm_p[:, None, :], q.shape[:-1] + (3,))
        res, valid, _, _ = linearize_point(
            p, bucket.obs_uv, q, t, intr, with_jacobians=False
        )
        info = join_residual_info(
            info,
            accumulate_residual_info(
                res, valid, bucket.mask, robust_norm, huber_parameter
            ),
        )
    return info
