"""PCG unit tests (analog of the reference's CG-related coverage in
cg/preconditioner.test.cpp + conjugate_gradient.hpp behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rootba_tpu.solver.cg import (
    CG_FAILURE,
    CG_NO_CONVERGENCE,
    CG_SUCCESS,
    pcg,
)
from rootba_tpu.solver.sqrt_qr import precond_apply


def random_spd(n, rng, cond=100.0):
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.geomspace(1.0, cond, n)
    return (Q * eigs) @ Q.T


def test_pcg_solves_spd_system():
    rng = np.random.default_rng(0)
    n = 36
    A = random_spd(n, rng)
    b = rng.normal(size=(n,))

    def matvec(x):
        return jnp.asarray(A) @ x

    res = pcg(matvec, lambda r: r, jnp.asarray(b),
              max_num_iterations=200, q_tolerance=1e-12)
    x = np.asarray(res.x)
    assert int(res.termination_type) == CG_SUCCESS
    # the zeta test stops when the quadratic model stops improving;
    # residual is small but not machine-precision
    assert np.linalg.norm(A @ x - b) <= 1e-4 * np.linalg.norm(b)


def test_pcg_q_tolerance_terminates_early():
    rng = np.random.default_rng(1)
    n = 64
    A = random_spd(n, rng, cond=1e4)
    b = rng.normal(size=(n,))

    def matvec(x):
        return jnp.asarray(A) @ x

    res_loose = pcg(matvec, lambda r: r, jnp.asarray(b),
                    max_num_iterations=500, q_tolerance=0.5)
    res_tight = pcg(matvec, lambda r: r, jnp.asarray(b),
                    max_num_iterations=500, q_tolerance=1e-10)
    assert int(res_loose.num_iterations) < int(res_tight.num_iterations)


def test_pcg_zero_rhs():
    def matvec(x):
        return 2.0 * x

    res = pcg(matvec, lambda r: r, jnp.zeros((8,)))
    assert int(res.termination_type) == CG_SUCCESS
    np.testing.assert_array_equal(np.asarray(res.x), 0.0)


def test_pcg_indefinite_detected():
    A = np.diag(np.array([1.0, -1.0, 2.0, 3.0]))
    b = np.ones(4)

    def matvec(x):
        return jnp.asarray(A) @ x

    res = pcg(matvec, lambda r: r, jnp.asarray(b),
              max_num_iterations=50, q_tolerance=1e-12)
    assert int(res.termination_type) in (CG_NO_CONVERGENCE, CG_FAILURE)


def test_pcg_preconditioner_accelerates():
    rng = np.random.default_rng(2)
    N = 12  # 12 cameras x 9 = 108-dim block system
    blocks = np.stack([random_spd(9, rng, cond=1000.0) for _ in range(N)])
    # block diagonal system: perfect preconditioner converges in 1 iter
    A = np.zeros((9 * N, 9 * N))
    for i in range(N):
        A[9 * i:9 * i + 9, 9 * i:9 * i + 9] = blocks[i]
    b = rng.normal(size=(N, 9))
    chol = jnp.linalg.cholesky(jnp.asarray(blocks))

    def matvec(x):
        return (jnp.asarray(A) @ x.reshape(-1)).reshape(N, 9)

    res_plain = pcg(matvec, lambda r: r, jnp.asarray(b),
                    max_num_iterations=500, q_tolerance=1e-10)
    res_precond = pcg(matvec, lambda r: precond_apply(chol, r),
                      jnp.asarray(b), max_num_iterations=500,
                      q_tolerance=1e-10)
    assert int(res_precond.num_iterations) <= 3
    assert int(res_precond.num_iterations) < int(res_plain.num_iterations)


def test_precond_apply_matches_direct_solve():
    rng = np.random.default_rng(3)
    blocks = np.stack([random_spd(9, rng) for _ in range(5)])
    r = rng.normal(size=(5, 9))
    chol = jnp.linalg.cholesky(jnp.asarray(blocks))
    z = np.asarray(precond_apply(chol, jnp.asarray(r)))
    for i in range(5):
        np.testing.assert_allclose(blocks[i] @ z[i], r[i], rtol=1e-8,
                                   atol=1e-10)


def test_pallas_vmem_cg_matches_pcg():
    """The whole-loop VMEM CG kernel (interpret mode on CPU) follows
    the reference pcg loop on the same z-space dense system."""
    from rootba_tpu.ops.pallas_cg import pcg_dense_vmem

    rng = np.random.default_rng(7)
    N = 11
    Nc = 128  # padded camera grid
    M = 9 * Nc
    n = 9 * N
    A0 = (rng.normal(size=(n, n)) / np.sqrt(n)).astype(np.float32)
    A = (A0 @ A0.T + 2.0 * np.eye(n)).astype(np.float32)
    b = rng.normal(size=(N, 9)).astype(np.float32)
    blocks = np.stack([A[9 * i:9 * i + 9, 9 * i:9 * i + 9]
                       for i in range(N)]).astype(np.float32)
    chol = jnp.linalg.cholesky(jnp.asarray(blocks))

    # x-space [n,n] -> padded z-space [M,M]:
    # Hz[a*Nc+i, b*Nc+j] = A[i*9+a, j*9+b]
    Hz = np.zeros((M, M), np.float32)
    A4 = A.reshape(N, 9, N, 9)
    Hz4 = Hz.reshape(9, Nc, 9, Nc)
    Hz4[:, :N, :, :N] = A4.transpose(1, 0, 3, 2)
    Hz = Hz4.reshape(M, M)

    def matvec(x):
        return (jnp.asarray(A) @ x.reshape(-1)).reshape(N, 9)

    for q_tol, max_it in ((1e-1, 100), (1e-8, 200)):
        ref = pcg(matvec, lambda r: precond_apply(chol, r),
                  jnp.asarray(b), max_num_iterations=max_it,
                  q_tolerance=q_tol)
        got = pcg_dense_vmem(
            jnp.asarray(Hz), chol, jnp.asarray(b),
            max_num_iterations=max_it, q_tolerance=q_tol,
            interpret=True)
        assert int(got.num_iterations) == int(ref.num_iterations)
        assert int(got.termination_type) == int(ref.termination_type)
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   rtol=2e-4, atol=2e-5)
