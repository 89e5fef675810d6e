"""Unrolled batched 9x9 SPD block linear algebra.

The per-camera preconditioner blocks are 9x9 (POSE_SIZE) SPD matrices,
N per problem (reference BlockDiagonalPreconditioner,
cg/preconditioner.hpp:72-143, uses Eigen LLT per block under TBB).
XLA's jnp.linalg.cholesky / lax.linalg.triangular_solve lower to
looped/custom-call kernels that cost ~0.25 ms per call at N=257 -- and
the triangular solves sit INSIDE the PCG while-loop body. These
fully-unrolled formulations are pure elementwise ops over the [N]
batch axis (45 + 2*45 fused multiply-subtracts), which XLA fuses into
a single VPU kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

D = 9


def chol9(A: jnp.ndarray) -> jnp.ndarray:
    """Batched lower-Cholesky of SPD [N, 9, 9] blocks, unrolled.

    Matches jnp.linalg.cholesky for SPD input. Non-SPD blocks produce
    NaN (same as the library routine); callers guard like the
    reference guards Eigen LLT failure.
    """
    L = [[None] * D for _ in range(D)]
    for j in range(D):
        s = A[:, j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, D):
            s = A[:, i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = []
    zero = jnp.zeros_like(A[:, 0, 0])
    for i in range(D):
        rows.append(jnp.stack(
            [L[i][j] if j <= i else zero for j in range(D)], axis=-1))
    return jnp.stack(rows, axis=-2)


def chol9_solve(L: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L') z = r for batched lower factors L [N,9,9],
    r [N,9]: unrolled forward + back substitution."""
    y = [None] * D
    for i in range(D):
        s = r[:, i]
        for k in range(i):
            s = s - L[:, i, k] * y[k]
        y[i] = s / L[:, i, i]
    z = [None] * D
    for i in reversed(range(D)):
        s = y[i]
        for k in range(i + 1, D):
            s = s - L[:, k, i] * z[k]
        z[i] = s / L[:, i, i]
    return jnp.stack(z, axis=-1)


def chol9_inv(L: jnp.ndarray) -> jnp.ndarray:
    """Explicit block inverse M = (L L')^-1 = L^-T L^-1 from batched
    lower factors [N,9,9], unrolled.

    Why: chol9_solve is an 18-step serial substitution chain; inside a
    PCG while-loop body those dependent steps cost ~0.8 ms per
    application at N=1778 (venice, measured r4). Inverting once per
    stage2 (~3x the flops, OUTSIDE the loop) turns every preconditioner
    application into the single fused batched product inv9_apply --
    amortized over the 10s-100s of CG iterations of a solve.

    NaN propagates from non-SPD blocks exactly like chol9_solve.
    """
    Li = [[None] * D for _ in range(D)]
    for j in range(D):
        Li[j][j] = 1.0 / L[:, j, j]
        for i in range(j + 1, D):
            s = None
            for k in range(j, i):
                t = L[:, i, k] * Li[k][j]
                s = t if s is None else s + t
            Li[i][j] = -s / L[:, i, i]
    rows = []
    for a in range(D):
        cols = []
        for b in range(D):
            s = None
            for k in range(max(a, b), D):
                t = Li[k][a] * Li[k][b]
                s = t if s is None else s + t
            cols.append(s)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def inv9_apply(M: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """z = M r for batched [N,9,9] x [N,9]: one fused mult-sum."""
    return jnp.sum(M * r[:, None, :], axis=2)
