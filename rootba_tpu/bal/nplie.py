"""Host-side (numpy, float64) quaternion/SO3 helpers for problem IO and
preprocessing. Mirrors rootba_tpu.core.lie but operates on numpy arrays
(preprocessing is always done in double, like the reference which loads
as double regardless of solver precision, bal_problem.cpp:774-853)."""

from __future__ import annotations

import numpy as np


def quat_mul(q1: np.ndarray, q2: np.ndarray) -> np.ndarray:
    w1, x1, y1, z1 = np.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(q2, -1, 0)
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: np.ndarray) -> np.ndarray:
    out = q.copy()
    out[..., 1:] *= -1
    return out


def quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def quat_normalize(q: np.ndarray) -> np.ndarray:
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def so3_exp(omega: np.ndarray) -> np.ndarray:
    omega = np.asarray(omega, dtype=np.float64)
    theta2 = np.sum(omega * omega, axis=-1)
    theta = np.sqrt(theta2)
    half = 0.5 * theta
    small = theta2 < 1e-16
    theta_safe = np.where(small, 1.0, theta)
    sinc_half = np.where(small, 0.5 - theta2 / 48.0, np.sin(half) / theta_safe)
    w = np.where(small, 1.0 - theta2 / 8.0, np.cos(half))
    return np.concatenate([w[..., None], sinc_half[..., None] * omega], axis=-1)


def quat_from_matrix(R: np.ndarray) -> np.ndarray:
    """Rotation matrix [...,3,3] -> quaternion (w,x,y,z); numerically
    robust Shepperd method, batched."""
    R = np.asarray(R, dtype=np.float64)
    batch = R.shape[:-2]
    q = np.zeros(batch + (4,), dtype=np.float64)
    t = np.trace(R, axis1=-2, axis2=-1)

    # case 0: t > 0
    c0 = t > 0
    s = np.sqrt(np.where(c0, t + 1.0, 1.0)) * 2.0
    q0 = np.stack(
        [
            0.25 * s,
            (R[..., 2, 1] - R[..., 1, 2]) / s,
            (R[..., 0, 2] - R[..., 2, 0]) / s,
            (R[..., 1, 0] - R[..., 0, 1]) / s,
        ],
        axis=-1,
    )

    def case(i, j, k):
        s = np.sqrt(
            np.maximum(1.0 + R[..., i, i] - R[..., j, j] - R[..., k, k], 0.0)
        ) * 2.0
        s = np.where(s == 0, 1.0, s)
        out = np.zeros(batch + (4,), dtype=np.float64)
        out[..., 0] = (R[..., k, j] - R[..., j, k]) / s
        out[..., 1 + i] = 0.25 * s
        out[..., 1 + j] = (R[..., j, i] + R[..., i, j]) / s
        out[..., 1 + k] = (R[..., k, i] + R[..., i, k]) / s
        return out

    c1 = (R[..., 0, 0] >= R[..., 1, 1]) & (R[..., 0, 0] >= R[..., 2, 2])
    c2 = R[..., 1, 1] >= R[..., 2, 2]
    q = np.where(
        c0[..., None],
        q0,
        np.where(
            c1[..., None],
            case(0, 1, 2),
            np.where(c2[..., None], case(1, 2, 0), case(2, 0, 1)),
        ),
    )
    return quat_normalize(q)


def so3_log(q: np.ndarray) -> np.ndarray:
    """Quaternion (w,x,y,z) -> rotation vector (inverse of so3_exp),
    batched; small-angle-safe Taylor branch."""
    q = np.asarray(q, dtype=np.float64)
    q = q * np.where(q[..., 0:1] < 0, -1.0, 1.0)  # w >= 0: theta in [0, pi]
    w = q[..., 0]
    v = q[..., 1:4]
    vn2 = np.sum(v * v, axis=-1)
    vn = np.sqrt(vn2)
    theta = 2.0 * np.arctan2(vn, w)
    small = vn2 < 1e-16
    # omega = theta * v / |v|; for small angle theta/|v| ~ 2/w (1 + ...)
    scale = np.where(small, 2.0 / np.where(w == 0, 1.0, w),
                     theta / np.where(small, 1.0, vn))
    return scale[..., None] * v
