"""Snavely/BalCamera projection with analytic Jacobians, batched.

Model (reference: rootba src/rootba/bal/snavely_projection.hpp:50-73 and
basalt BalCamera): for a 3D point P in the camera frame (positive-z
forward convention; the BAL loader flips axes accordingly),

    d      = P.xy / P.z
    r2     = ||d||^2
    rho    = 1 + k1 r2 + k2 r2^2
    proj   = f * rho * d
    valid  = P.z > eps

Residual is ``proj - obs`` (reference bal_bundle_adjustment_helper.cpp:127).

Jacobians (reference bal_bundle_adjustment_helper.cpp:112-146):
    Jpose (2x6) = d_res_d_pc @ [ I | -hat(p_c) ]   (trans first, then rot)
    Jintr (2x3) = [rho*d, f*r2*d, f*r2^2*d]
    Jl    (2x3) = d_res_d_pc @ R     (R = world-to-cam rotation)

All functions are batched over arbitrary leading dims and dtype-generic.
"""

from __future__ import annotations

import jax.numpy as jnp

from rootba_tpu.core.lie import quat_rotate, quat_to_matrix


def sophus_eps(dtype) -> float:
    """Sophus::Constants<Scalar>::epsilon(): 1e-10 (f64), 1e-5 (f32)."""
    return 1e-10 if jnp.dtype(dtype).itemsize >= 8 else 1e-5


def project(p_c: jnp.ndarray, intr: jnp.ndarray):
    """Project camera-frame points.

    Args:
      p_c:  [..., 3] points in camera frame.
      intr: [..., 3] (f, k1, k2).

    Returns:
      (proj [..., 2], valid [...] bool)
    """
    dtype = p_c.dtype
    f = intr[..., 0]
    k1 = intr[..., 1]
    k2 = intr[..., 2]
    z = p_c[..., 2]
    eps = jnp.asarray(sophus_eps(dtype), dtype)
    valid = z > eps
    z_safe = jnp.where(valid, z, jnp.ones_like(z))
    d = p_c[..., 0:2] / z_safe[..., None]
    r2 = jnp.sum(d * d, axis=-1)
    rho = 1.0 + r2 * (k1 + r2 * k2)
    proj = (f * rho)[..., None] * d
    return proj, valid


def linearize_point(
    p_w: jnp.ndarray,
    obs: jnp.ndarray,
    cam_q: jnp.ndarray,
    cam_t: jnp.ndarray,
    intr: jnp.ndarray,
    *,
    with_jacobians: bool = True,
):
    """Residual and analytic Jacobians of one (landmark, camera) pair.

    Args:
      p_w:   [..., 3] landmark positions (world frame).
      obs:   [..., 2] observed pixel positions.
      cam_q: [..., 4] world-to-cam unit quaternion (w,x,y,z).
      cam_t: [..., 3] world-to-cam translation.
      intr:  [..., 3] (f, k1, k2).

    Returns:
      res [..., 2], valid [...],
      Jp [..., 2, 9] (d res / d [trans, rot, intr]) or None,
      Jl [..., 2, 3] (d res / d p_w) or None.

    Note: like the reference with ignore_validity_check=true, residuals
    and Jacobians are computed for invalid (z<=eps) projections too; the
    z used in the division is clamped so values stay finite, and `valid`
    reports the true validity.
    """
    dtype = p_w.dtype
    p_c = quat_rotate(cam_q, p_w) + cam_t
    x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
    f = intr[..., 0]
    k1 = intr[..., 1]
    k2 = intr[..., 2]

    eps = jnp.asarray(sophus_eps(dtype), dtype)
    valid = z > eps
    # Keep math finite for invalid points (reference lets 1/z blow up and
    # handles inf/nan downstream; clamping |z| instead keeps jit-friendly
    # finite values while `valid` carries the semantics).
    z_safe = jnp.where(jnp.abs(z) > eps, z, jnp.where(z < 0, -eps, eps))

    iz = 1.0 / z_safe
    dx = x * iz
    dy = y * iz
    r2 = dx * dx + dy * dy
    rho = 1.0 + r2 * (k1 + r2 * k2)
    frho = f * rho
    res = jnp.stack([frho * dx - obs[..., 0], frho * dy - obs[..., 1]], axis=-1)

    if not with_jacobians:
        return res, valid, None, None

    # d d / d p_c : [...,2,3]
    dd_dp = jnp.stack(
        [
            jnp.stack([iz, jnp.zeros_like(iz), -dx * iz], axis=-1),
            jnp.stack([jnp.zeros_like(iz), iz, -dy * iz], axis=-1),
        ],
        axis=-2,
    )
    # d r2 / d p_c = 2 d^T dd_dp : [...,3]
    d_vec = jnp.stack([dx, dy], axis=-1)
    dr2_dp = 2.0 * jnp.einsum("...i,...ij->...j", d_vec, dd_dp)
    # d rho / d p_c
    drho_dp = (k1 + 2.0 * k2 * r2)[..., None] * dr2_dp
    # d res / d p_c = f * (rho * dd_dp + d ⊗ drho_dp) : [...,2,3]
    dres_dp = f[..., None, None] * (
        rho[..., None, None] * dd_dp
        + d_vec[..., :, None] * drho_dp[..., None, :]
    )

    # pose: translation cols = dres_dp, rotation cols = -dres_dp @ hat(p_c)
    zeros = jnp.zeros_like(x)
    hat_pc = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    dres_drot = -jnp.einsum("...ij,...jk->...ik", dres_dp, hat_pc)

    # intrinsics: [rho*d, f*r2*d, f*r2^2*d]
    fr2 = f * r2
    dres_di = jnp.stack(
        [
            rho[..., None] * d_vec,
            fr2[..., None] * d_vec,
            (fr2 * r2)[..., None] * d_vec,
        ],
        axis=-1,
    )

    Jp = jnp.concatenate([dres_dp, dres_drot, dres_di], axis=-1)

    # landmark: dres_dp @ R
    R = quat_to_matrix(cam_q)
    Jl = jnp.einsum("...ij,...jk->...ik", dres_dp, R)

    return res, valid, Jp, Jl
