"""Scalarized ("plane"-form) Snavely projection kernels.

TPU memory is tiled (8, 128) over the two minor dimensions; arrays with
small trailing dims like [O, 2, 9] inflate when materialized row-major.
The solvers therefore compute the residual/Jacobian math as elementwise
expressions over same-shape component vectors ("planes") and only stack
the results into their final flat layouts — the VPU form factor. These
kernels are shared by the flat sqrt layout (solver/sqrt_flat.py), the
einsum layout and the error evaluation (solver/linearization.py).

The math mirrors rootba_tpu.core.projection exactly (same reference
citations); equivalence vs jax.jacfwd is asserted in
tests/test_projection.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from rootba_tpu.core.projection import sophus_eps

POSE_SIZE = 9


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
    component vectors (any shape; used with flat [O] obs vectors).
    Mirrors core.projection.linearize_point (reference
    bal_bundle_adjustment_helper.cpp:112-146).

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
