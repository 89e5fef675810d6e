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
