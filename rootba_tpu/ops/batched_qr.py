"""Batched thin Householder QR for 3-column landmark Jacobians.

The reference marginalizes each landmark by an in-place dense QR of the
3 Jl columns applied to the whole storage matrix
(qr/impl/landmark_block_base.ipp:718-743, perform_qr_householder).
TPU re-design: we never materialize Q2^T * storage. Instead this module
computes, batched over the bucket's landmark axis, the thin factors

    A = Q1 R,   A = [Jl_scaled; sqrt(lambda) I3]  of shape [L, m, 3]

and solvers use the projection identity Q2 Q2^T = I - Q1 Q1^T, which
gives bit-comparable numerics (orthogonal transforms only, no normal
equations) at a fraction of the memory traffic.

Everything is jnp (XLA fuses the 3 reflection steps); shapes static.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def householder_qr3(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Thin QR of [L, m, 3] (m >= 3 static) via 3 Householder steps.

    Returns (R [L,3,3] upper-triangular, Q1 [L,m,3] with orthonormal
    columns satisfying A = Q1 @ R). Rank-deficient inputs give beta=0
    identity reflections; R may then be singular (callers guard).
    """
    L, m, _ = A.shape
    dtype = A.dtype
    eps_tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    rows = jnp.arange(m)
    vs = []
    betas = []
    for k in range(3):
        col = A[:, :, k]  # [L,m]
        rowmask = (rows >= k)[None, :]
        x = jnp.where(rowmask, col, 0.0)
        sigma = jnp.sum(x * x, axis=1)  # [L]
        norm = jnp.sqrt(sigma)
        x0 = x[:, k]
        sign = jnp.where(x0 >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sign * norm
        v = x.at[:, k].add(-alpha)  # v = x - alpha e_k
        vtv = jnp.sum(v * v, axis=1)
        beta = jnp.where(vtv > eps_tiny, 2.0 / jnp.where(vtv > eps_tiny, vtv, 1.0), 0.0)
        # A <- A - beta v (v^T A)
        vtA = jnp.einsum("lm,lmc->lc", v, A)
        A = A - beta[:, None, None] * v[:, :, None] * vtA[:, None, :]
        vs.append(v)
        betas.append(beta)

    R = jnp.triu(A[:, :3, :])  # [L,3,3]

    # Q1 = H1 H2 H3 [e1 e2 e3]
    eye = jnp.zeros((L, m, 3), dtype).at[:, :3, :].set(jnp.eye(3, dtype=dtype))
    Q1 = eye
    for k in (2, 1, 0):
        v = vs[k]
        beta = betas[k]
        vtQ = jnp.einsum("lm,lmc->lc", v, Q1)
        Q1 = Q1 - beta[:, None, None] * v[:, :, None] * vtQ[:, None, :]
    return R, Q1


def solve_upper(R: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve R x = b for upper-triangular R [L,3,3], b [L,3].

    Hand-unrolled 3x3 back substitution (cheaper than a general
    triangular_solve on TPU). Zero diagonals give inf; callers mask.
    """
    x2 = b[:, 2] / R[:, 2, 2]
    x1 = (b[:, 1] - R[:, 1, 2] * x2) / R[:, 1, 1]
    x0 = (b[:, 0] - R[:, 0, 1] * x1 - R[:, 0, 2] * x2) / R[:, 0, 0]
    return jnp.stack([x0, x1, x2], axis=-1)


def householder_qr3_planar(A: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                    jnp.ndarray]:
    """Thin QR of PLANAR [m, 3, L] (m >= 3 static) via 3 Householder
    steps, with the landmark batch L on the LANE (minor) axis.

    Same math as householder_qr3 (reference landmark_block.cpp
    damping QR), different physical layout: the row-major [L, m, 3]
    form makes every intermediate of the 6-step update chain a
    minor-dim-3 tensor that the (8,128) TPU tiling lane-pads 3 -> 128
    (~42x, ~12 MB per materialized step at a 2k-landmark bucket --
    measured 33 ms/solve of pure padding traffic in the fused ladybug
    program). Planar [m, 3, L] puts L on the lanes: zero padding, the
    m*3 <= ~60 rows ride the sublanes.

    Returns (R [3, 3, L] upper-triangular, Q1 [m, 3, L]).
    Rank-deficient inputs give beta=0 identity reflections; R may then
    be singular (callers guard)."""
    m, _, L = A.shape
    dtype = A.dtype
    eps_tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    rows = jnp.arange(m)
    vs = []
    betas = []
    for k in range(3):
        col = A[:, k, :]  # [m, L]
        x = jnp.where((rows >= k)[:, None], col, 0.0)
        sigma = jnp.sum(x * x, axis=0)  # [L]
        norm = jnp.sqrt(sigma)
        x0 = x[k]
        sign = jnp.where(x0 >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sign * norm
        v = x.at[k].add(-alpha)  # v = x - alpha e_k
        vtv = jnp.sum(v * v, axis=0)
        beta = jnp.where(vtv > eps_tiny,
                         2.0 / jnp.where(vtv > eps_tiny, vtv, 1.0), 0.0)
        # A <- A - beta v (v^T A)
        vtA = jnp.sum(v[:, None, :] * A, axis=0)  # [3, L]
        A = A - beta[None, None, :] * v[:, None, :] * vtA[None, :, :]
        vs.append(v)
        betas.append(beta)

    tri = (jnp.arange(3)[:, None] <= jnp.arange(3)[None, :])
    R = jnp.where(tri[:, :, None], A[:3], 0.0)  # [3,3,L]

    # Q1 = H1 H2 H3 [e1 e2 e3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[:, :, None],
                           (3, 3, L))
    Q1 = jnp.concatenate([eye, jnp.zeros((m - 3, 3, L), dtype)],
                         axis=0)
    for k in (2, 1, 0):
        v = vs[k]
        beta = betas[k]
        vtQ = jnp.sum(v[:, None, :] * Q1, axis=0)  # [3, L]
        Q1 = Q1 - beta[None, None, :] * v[:, None, :] * vtQ[None, :, :]
    return R, Q1
