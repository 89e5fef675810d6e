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
