"""Batched SO(3)/SE(3) utilities on unit quaternions.

Semantics mirror Sophus/basalt as used by the reference implementation
(rootba src/rootba/bal/bal_problem.hpp:97-110): camera poses are
world-to-camera transforms ``p_c = R p_w + t``, and the LM pose increment
is the *decoupled* left increment ``T <- se3_expd(inc) * T`` with
``se3_expd([v, w]) = (exp(w^), v)`` (translation applied directly, not
through the SE3 exponential's V(w) matrix).

Quaternions are stored as ``[..., 4]`` arrays in (w, x, y, z) order.
Everything is batched and dtype-generic (f32/f64).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2, (w,x,y,z) layout."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [...,3] by unit quaternions q [...,4].

    Uses the expanded 15-mul form (cheaper than two quat products).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [...,4] -> rotation matrix [...,3,3]."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [...,3] -> unit quaternion [...,4] (w,x,y,z).

    Taylor-safe around theta = 0 (matches Sophus SO3::exp).
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2)
    half = 0.5 * theta
    small = theta2 < jnp.asarray(1e-10, dtype=omega.dtype)
    # sin(t/2)/t: series 1/2 - t^2/48 + ...
    sinc_half = jnp.where(
        small,
        0.5 - theta2 / 48.0,
        jnp.sin(half) / jnp.where(small, jnp.ones_like(theta), theta),
    )
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate(
        [w[..., None], sinc_half[..., None] * omega], axis=-1
    )


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> axis-angle (for testing; Taylor-safe)."""
    w = q[..., 0]
    u = q[..., 1:4]
    n = jnp.linalg.norm(u, axis=-1)
    # ensure w >= 0 for the principal log
    sign = jnp.where(w < 0, -1.0, 1.0).astype(q.dtype)
    w = w * sign
    u = u * sign[..., None]
    small = n < jnp.asarray(1e-7, dtype=q.dtype)
    n_safe = jnp.where(small, jnp.ones_like(n), n)
    angle = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(small, 2.0 / jnp.clip(w, 1e-12), angle / n_safe)
    return scale[..., None] * u


def se3_apply(q: jnp.ndarray, t: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """p_c = R p_w + t for batched poses/points."""
    return quat_rotate(q, p) + t


def se3_inverse(q: jnp.ndarray, t: jnp.ndarray):
    qinv = quat_conj(q)
    return qinv, -quat_rotate(qinv, t)


def apply_inc_pose(q: jnp.ndarray, t: jnp.ndarray, inc: jnp.ndarray):
    """Decoupled left-multiplied SE3 increment (Sophus::se3_expd).

    inc [...,6] = [v(3), w(3)]:  R <- exp(w^) R,  t <- exp(w^) t + v.
    Mirrors reference bal_problem.hpp:99-101 (inc_pose).
    """
    v = inc[..., 0:3]
    w = inc[..., 3:6]
    dq = so3_exp(w)
    q_new = quat_normalize(quat_mul(dq, q))
    t_new = quat_rotate(dq, t) + v
    return q_new, t_new
