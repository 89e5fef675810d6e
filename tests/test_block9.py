"""Unit tests for the unrolled batched 9x9 SPD kernels (ops/block9),
against the library cholesky/solve (reference uses Eigen LLT per block,
cg/preconditioner.hpp:72-143)."""

import jax.numpy as jnp
import numpy as np

from rootba_tpu.ops.block9 import chol9, chol9_solve


def random_spd9(rng, n, cond=100.0):
    out = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(9, 9)))
        ev = np.geomspace(1.0, cond, 9)
        out.append(q @ np.diag(ev) @ q.T)
    return np.stack(out)


def test_chol9_matches_library():
    rng = np.random.default_rng(0)
    A = random_spd9(rng, 7)
    L = np.asarray(chol9(jnp.asarray(A)))
    L_ref = np.linalg.cholesky(A)
    np.testing.assert_allclose(L, L_ref, rtol=1e-10, atol=1e-12)
    # strictly lower-triangular structure
    assert np.all(np.triu(L, 1) == 0.0)


def test_chol9_solve_solves():
    rng = np.random.default_rng(1)
    A = random_spd9(rng, 5, cond=1e4)
    r = rng.normal(size=(5, 9))
    L = chol9(jnp.asarray(A))
    z = np.asarray(chol9_solve(L, jnp.asarray(r)))
    for i in range(5):
        np.testing.assert_allclose(A[i] @ z[i], r[i], rtol=1e-8,
                                   atol=1e-10)


def test_chol9_inv_matches_solve():
    """Explicit inverse (one-time per stage2) equals the 18-step
    substitution chain it replaces inside the CG loop (r4 venice:
    ~0.8 ms/apply -> one fused product)."""
    from rootba_tpu.ops.block9 import chol9, chol9_inv, chol9_solve, inv9_apply

    rng = np.random.default_rng(5)
    A = rng.standard_normal((17, 9, 9))
    A = A @ A.transpose(0, 2, 1) + 9.0 * np.eye(9)
    L = chol9(jnp.asarray(A))
    r = jnp.asarray(rng.standard_normal((17, 9)))
    z_solve = chol9_solve(L, r)
    z_inv = inv9_apply(chol9_inv(L), r)
    np.testing.assert_allclose(np.asarray(z_inv), np.asarray(z_solve),
                               rtol=1e-6, atol=1e-8)


def test_bsr_matvec_packed_matches_reference():
    """Run-major packed MXU matvec == the per-application gather form
    (and both == the dense matrix assembled from the same blocks)."""
    from rootba_tpu.bal.bucketing import build_bsr_matvec
    from rootba_tpu.solver.linearization import (
        BsrMatvecIndex,
        bsr_matvec,
        bsr_matvec_pack,
        bsr_matvec_packed,
    )

    rng = np.random.default_rng(11)
    N, P = 13, 23
    pr = rng.integers(0, N - 1, P)
    pc = pr + 1 + rng.integers(0, np.maximum(N - 1 - pr, 1))
    pc = np.minimum(pc, N - 1)
    keep = pr < pc
    pr, pc = pr[keep], pc[keep]
    # dedupe
    seen = sorted({(a, b) for a, b in zip(pr, pc)})
    pr = np.array([a for a, _ in seen])
    pc = np.array([b for _, b in seen])
    P = len(pr)
    blocks = rng.standard_normal((P, 81))
    perm_t = np.arange(81).reshape(9, 9).T.reshape(-1)
    blocks2 = jnp.asarray(np.concatenate([blocks, blocks[:, perm_t]]),
                          jnp.float32)
    diag = rng.standard_normal((N, 9, 9))
    diag = jnp.asarray(diag + diag.transpose(0, 2, 1), jnp.float32)
    bsr = BsrMatvecIndex.from_host(build_bsr_matvec(pr, pc, N, width=4))
    x = jnp.asarray(rng.standard_normal((N, 9)), jnp.float32)

    y_old = bsr_matvec(blocks2, diag, bsr, x)
    packed = bsr_matvec_pack(blocks2, bsr)
    y_new = bsr_matvec_packed(packed, diag, bsr, x)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old),
                               rtol=1e-5, atol=1e-5)

    # dense reference
    H = np.zeros((9 * N, 9 * N))
    for k in range(P):
        B = np.asarray(blocks[k]).reshape(9, 9)
        H[9 * pr[k]:9 * pr[k] + 9, 9 * pc[k]:9 * pc[k] + 9] += B
        H[9 * pc[k]:9 * pc[k] + 9, 9 * pr[k]:9 * pr[k] + 9] += B.T
    for c in range(N):
        H[9 * c:9 * c + 9, 9 * c:9 * c + 9] += np.asarray(diag[c])
    y_ref = (H @ np.asarray(x).reshape(-1)).reshape(N, 9)
    np.testing.assert_allclose(np.asarray(y_new), y_ref, rtol=1e-4,
                               atol=1e-4)

    # pack built straight from the HALF table (the stage2-side path
    # that replaces the [2P, 81] intermediate; r5 final-4585 OOM fix)
    from rootba_tpu.solver.linearization import bsr_pack_from_half

    packed_h = bsr_pack_from_half(jnp.asarray(blocks, jnp.float32),
                                  bsr)
    np.testing.assert_allclose(np.asarray(packed_h),
                               np.asarray(packed), rtol=0, atol=0)
