"""Planar (structure-of-arrays) kernels for the sqrt-BA compute path.

TPU memory is tiled (8, 128) over the two minor dimensions; arrays with
small trailing dims like [L, n, 2, 9] inflate up to ~50x when
materialized row-major. The planar layout puts the large landmark axis
L on lanes and enumerates features on sublanes: every tensor is
[F, L] with F = (obs_slot x feature) flattened, so padding overhead is
<= ceil(F/8)/F on sublanes and negligible on lanes.

All math is written as elementwise expressions over [L]-vectors (row
slices of the planar arrays) with static Python loops over the small
obs-slot/feature dims -- the VPU form factor. Scatters to the
camera-indexed accumulators use flat 1-D segment-sums with expanded
ids (cam * width + feature), which avoids padded 2-D scatter operands.

The math mirrors rootba_tpu.core.projection / ops.batched_qr /
solver.sqrt_qr exactly (same reference citations); equivalence is
asserted in tests/test_planar.py.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from rootba_tpu.core.projection import sophus_eps

POSE_SIZE = 9


class PlanarBucketIndex(NamedTuple):
    """Static per-bucket index data, planar layout."""

    obs_u: jnp.ndarray  # [n, L]
    obs_v: jnp.ndarray  # [n, L]
    cam_idx: jnp.ndarray  # [n, L] int32
    mask: jnp.ndarray  # [n, L] bool
    lm_mask: jnp.ndarray  # [L] bool


class PlanarLin(NamedTuple):
    """Stage-1 output, planar: Jp [n*18, L] (slot*18 + row*9 + col),
    Jl [n*6, L] (slot*6 + row*3 + col), r [n*2, L] (slot*2 + row),
    Jl_scale [3, L]."""

    Jp: jnp.ndarray
    Jl: jnp.ndarray
    r: jnp.ndarray
    Jl_scale: jnp.ndarray


def to_planar_bucket(bucket) -> PlanarBucketIndex:
    """Convert a BucketIndex ([L,n,...] layout) to planar."""
    return PlanarBucketIndex(
        obs_u=bucket.obs_uv[..., 0].T,
        obs_v=bucket.obs_uv[..., 1].T,
        cam_idx=bucket.cam_idx.T,
        mask=bucket.mask.T,
        lm_mask=bucket.lm_mask,
    )


def _quat_rows(q, idx):
    """Gather quaternion components: q [N,4], idx [L] -> 4 x [L]."""
    qT = q.T  # [4, N]
    return qT[0][idx], qT[1][idx], qT[2][idx], qT[3][idx]


def _rot_matrix_rows(qw, qx, qy, qz):
    """Rotation matrix entries from quaternion components ([L] each)."""
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    return (
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    )


def snavely_planes(qw, qx, qy, qz, tx, ty, tz, f, k1, k2, X, Y, Z,
                   obs_u, obs_v, with_jacobians: bool = True):
    """Scalarized Snavely residual + Jacobian planes over same-shape
    component vectors (any shape; used with [L] planar slices and flat
    [O] obs vectors). Mirrors core.projection.linearize_point
    (reference bal_bundle_adjustment_helper.cpp:112-146).

    Returns (res_u, res_v, valid, Jp_planes(18) or None,
    Jl_planes(6) or None); Jp order = (row u then row v) x
    [trans(3), rot(3), intr(3)].
    """
    dtype = X.dtype
    R = _rot_matrix_rows(qw, qx, qy, qz)
    x = R[0] * X + R[1] * Y + R[2] * Z + tx
    y = R[3] * X + R[4] * Y + R[5] * Z + ty
    z = R[6] * X + R[7] * Y + R[8] * Z + tz

    eps = jnp.asarray(sophus_eps(dtype), dtype)
    valid = z > eps
    z_safe = jnp.where(jnp.abs(z) > eps, z,
                       jnp.where(z < 0, -eps, eps))
    iz = 1.0 / z_safe
    dx = x * iz
    dy = y * iz
    r2 = dx * dx + dy * dy
    rho = 1.0 + r2 * (k1 + r2 * k2)
    frho = f * rho
    res_u = frho * dx - obs_u
    res_v = frho * dy - obs_v

    if not with_jacobians:
        return res_u, res_v, valid, None, None

    # d res / d p_c rows (A0 = d res_u / d p_c, A1 = d res_v / d p_c)
    a = k1 + 2.0 * k2 * r2
    dr2_0 = 2.0 * dx * iz
    dr2_1 = 2.0 * dy * iz
    dr2_2 = -2.0 * r2 * iz
    A00 = f * (rho * iz + dx * a * dr2_0)
    A01 = f * (dx * a * dr2_1)
    A02 = f * (rho * (-dx * iz) + dx * a * dr2_2)
    A10 = f * (dy * a * dr2_0)
    A11 = f * (rho * iz + dy * a * dr2_1)
    A12 = f * (rho * (-dy * iz) + dy * a * dr2_2)

    # pose: trans cols = A, rot cols = A x p_c pattern
    # (d_point_d_xi = [I | -hat(p_c)], reference :139-144)
    def rot_cols(a0, a1, a2):
        return (a2 * y - a1 * z, a0 * z - a2 * x, a1 * x - a0 * y)

    r3u, r4u, r5u = rot_cols(A00, A01, A02)
    r3v, r4v, r5v = rot_cols(A10, A11, A12)
    fr2 = f * r2
    Jp_rows = [
        # row u (9)
        A00, A01, A02, r3u, r4u, r5u, rho * dx, fr2 * dx, fr2 * r2 * dx,
        # row v (9)
        A10, A11, A12, r3v, r4v, r5v, rho * dy, fr2 * dy, fr2 * r2 * dy,
    ]
    # landmark: A @ R
    Jl_rows = [
        A00 * R[0] + A01 * R[3] + A02 * R[6],
        A00 * R[1] + A01 * R[4] + A02 * R[7],
        A00 * R[2] + A01 * R[5] + A02 * R[8],
        A10 * R[0] + A11 * R[3] + A12 * R[6],
        A10 * R[1] + A11 * R[4] + A12 * R[7],
        A10 * R[2] + A11 * R[5] + A12 * R[8],
    ]
    return res_u, res_v, valid, Jp_rows, Jl_rows


def robust_sqrt_weight(res_u, res_v, valid, mask, robust_norm: int,
                       huber_parameter: float, use_valid_only: bool):
    """sqrt robust weight, zeroed on padded/invalid slots
    (bal_bundle_adjustment_helper.cpp:45-65)."""
    dtype = res_u.dtype
    res_sq = res_u * res_u + res_v * res_v
    if robust_norm == 1:
        thresh = jnp.asarray(huber_parameter, dtype)
        rn = jnp.sqrt(jnp.maximum(res_sq, jnp.finfo(dtype).tiny))
        weight = jnp.where(res_sq < thresh * thresh, 1.0, thresh / rn)
    else:
        weight = jnp.ones_like(res_sq)
    use_mask = mask & valid if use_valid_only else mask
    return jnp.where(use_mask, jnp.sqrt(weight), 0.0), use_mask


def linearize_slot(cams, X, Y, Z, bucket: PlanarBucketIndex, i: int,
                   robust_norm: int, huber_parameter: float,
                   use_valid_only: bool, with_jacobians: bool = True):
    """Residual + Jacobian rows of obs slot i (all [L] vectors).

    Returns (res_u, res_v, valid, use_mask, sw, Jp_rows(18), Jl_rows(6)).
    """
    idx = bucket.cam_idx[i]
    qw, qx, qy, qz = _quat_rows(cams.q, idx)
    tT = cams.t.T
    tx, ty, tz = tT[0][idx], tT[1][idx], tT[2][idx]
    iT = cams.intr.T
    f, k1, k2 = iT[0][idx], iT[1][idx], iT[2][idx]

    res_u, res_v, valid, Jp_rows, Jl_rows = snavely_planes(
        qw, qx, qy, qz, tx, ty, tz, f, k1, k2, X, Y, Z,
        bucket.obs_u[i], bucket.obs_v[i], with_jacobians)
    sw, use_mask = robust_sqrt_weight(
        res_u, res_v, valid, bucket.mask[i], robust_norm,
        huber_parameter, use_valid_only)
    if with_jacobians:
        Jp_rows = [sw * v for v in Jp_rows]
        Jl_rows = [sw * v for v in Jl_rows]
    return res_u, res_v, valid, use_mask, sw, Jp_rows, Jl_rows


def flat_cam_scatter(rows: Sequence[jnp.ndarray], cam_idx: jnp.ndarray,
                     num_cameras: int, width: int) -> jnp.ndarray:
    """Scatter per-slot feature rows into a [num_cameras, width] array.

    rows: list over (slot, feature) of [L] values in feature-major
    order per slot: rows = [slot0_f0..slot0_f{w-1}, slot1_f0, ...].
    cam_idx [n, L]. Uses one flat 1-D segment-sum (ids = cam*width+f).
    """
    n = cam_idx.shape[0]
    L = cam_idx.shape[1]
    assert len(rows) == n * width
    vals = jnp.stack(rows)  # [n*width, L]
    ids = (cam_idx[:, None, :] * width
           + jnp.arange(width, dtype=cam_idx.dtype)[None, :, None])
    out = jax.ops.segment_sum(
        vals.reshape(-1), ids.reshape(-1),
        num_segments=num_cameras * width)
    return out.reshape(num_cameras, width)


def planar_qr3(cols, m: int):
    """Thin Householder QR of a [m x 3 x L] planar matrix.

    cols: list of 3 arrays [m, L] (the 3 columns). Returns
    (R (3x3 list-of-lists of [L]), Q1 cols: list of 3 arrays [m, L]).
    Mirrors ops.batched_qr.householder_qr3.
    """
    A = [c for c in cols]  # each [m, L]
    dtype = A[0].dtype
    L = A[0].shape[1]
    eps_tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    rows = jnp.arange(m)

    vs = []
    betas = []
    for k in range(3):
        col = A[k]
        rowmask = (rows >= k)[:, None]
        x = jnp.where(rowmask, col, 0.0)
        sigma = jnp.sum(x * x, axis=0)  # [L]
        norm = jnp.sqrt(sigma)
        x0 = x[k]
        sign = jnp.where(x0 >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sign * norm
        v = x.at[k].add(-alpha)
        vtv = jnp.sum(v * v, axis=0)
        beta = jnp.where(vtv > eps_tiny,
                         2.0 / jnp.where(vtv > eps_tiny, vtv, 1.0), 0.0)
        for c in range(3):
            vtA = jnp.sum(v * A[c], axis=0)  # [L]
            A[c] = A[c] - beta[None, :] * v * vtA[None, :]
        vs.append(v)
        betas.append(beta)

    R = [[A[c][k] if c >= k else jnp.zeros_like(A[c][k])
          for c in range(3)] for k in range(3)]

    # Q1 = H1 H2 H3 [e1 e2 e3]
    eye = [jnp.zeros((m, L), dtype).at[c].set(1.0) for c in range(3)]
    Q1 = eye
    for k in (2, 1, 0):
        v = vs[k]
        beta = betas[k]
        for c in range(3):
            vtQ = jnp.sum(v * Q1[c], axis=0)
            Q1[c] = Q1[c] - beta[None, :] * v * vtQ[None, :]
    return R, Q1


def solve_upper_rows(R, b):
    """Solve R x = b with R the 3x3 list-of-lists of [L] rows from
    planar_qr3, b list of 3 [L] vectors."""
    x2 = b[2] / R[2][2]
    x1 = (b[1] - R[1][2] * x2) / R[1][1]
    x0 = (b[0] - R[0][1] * x1 - R[0][2] * x2) / R[0][0]
    return [x0, x1, x2]
