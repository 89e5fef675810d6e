"""Whole-PCG-loop Pallas kernel for VMEM-resident dense systems.

For BAL problems whose dense reduced camera system fits on-chip
(9 * Nc <= ~1.5k lanes, i.e. <= ~190 cameras after padding -- a large
share of the 97-problem BAL suite), the ENTIRE preconditioned-CG solve
runs as ONE kernel: H stays resident in VMEM across all iterations, so
a CG iteration costs only its compute -- no HBM re-streaming and no
per-iteration launch overhead. Measured on the XLA path, a CG
iteration costs ~2x the bare GEMV at trafalgar scale purely in
launch/fusion overhead of the small surrounding ops
(benchmarks/micro_cg.py); at ladybug scale the loop overhead dominates
the whole linear solve.

Semantics mirror solver.cg.pcg exactly (the Ceres-derived loop,
cg/conjugate_gradient.hpp:83-300): rho/beta/alpha breakdown detection,
indefiniteness, periodic exact-residual reset, Nash zeta test +
residual-norm test with min/max iteration bounds. The system is the
feature-major ("z-space") padded dense matrix Hz [M, M], M = 9 * Nc
(see linearization.assemble_rcs_dense), with the block-diagonal
preconditioner passed as 81 planar Cholesky rows [81, Nc] padded with
identity so padded lanes solve to zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rootba_tpu.solver.cg import (
    CG_FAILURE,
    CG_NO_CONVERGENCE,
    CG_RUNNING,
    CG_SUCCESS,
    CGResult,
)

D = 9


def chol_planes(chol: jnp.ndarray, Nc: int) -> jnp.ndarray:
    """[N,9,9] lower factors -> [81, Nc] planar rows (row i*9+j =
    L[:, i, j]), padded with identity beyond N so the in-kernel solve
    yields zero for padded lanes."""
    N = chol.shape[0]
    pl81 = chol.reshape(N, 81).T  # [81, N]
    pad = jnp.zeros((81, Nc - N), chol.dtype)
    # rows i*9+i get 1.0 in the padded region
    diag_rows = jnp.asarray(
        [i * D + i for i in range(D)], jnp.int32)
    pad = pad.at[diag_rows, :].set(1.0)
    return jnp.concatenate([pl81, pad], axis=1)


def _solve_planar(Lp, r2):
    """(L L')^-1 r for planar factors Lp [81, Nc] and r2 [9, Nc]:
    unrolled forward/back substitution, all ops [Nc]-wide."""
    y = [None] * D
    for i in range(D):
        s = r2[i]
        for k in range(i):
            s = s - Lp[i * D + k] * y[k]
        y[i] = s / Lp[i * D + i]
    z = [None] * D
    for i in reversed(range(D)):
        s = y[i]
        for k in range(i + 1, D):
            s = s - Lp[k * D + i] * z[k]
        z[i] = s / Lp[i * D + i]
    return jnp.stack(z, axis=0)


def _cg_kernel(H_ref, b_ref, Lp_ref, out_x, out_stats,
               *, max_iters, min_iters, q_tol, r_tol, reset_period):
    H = H_ref[:]
    b = b_ref[:]  # [9, Nc]
    Lp = Lp_ref[:]
    M = H.shape[0]
    Nc = M // D
    f32 = jnp.float32

    def matvec(v2):  # [9, Nc] -> [9, Nc]
        q = jax.lax.dot_general(
            H, v2.reshape(1, M),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [M, 1]
        return q.reshape(D, Nc)

    def dot(a, c):
        return jnp.sum(a * c)

    norm_b = jnp.sqrt(dot(b, b))
    tol_r = r_tol * norm_b

    def cond(state):
        i, x, r, p, rho, q0, term = state
        return (term == CG_RUNNING) & (i < max_iters)

    def body(state):
        i, x, r, p, rho, q0, term = state
        i = i + 1

        z = _solve_planar(Lp, r)
        last_rho = rho
        rho = dot(r, z)
        fail_rho = (rho == 0) | jnp.isinf(rho)

        beta = rho / jnp.where(last_rho == 0, 1.0, last_rho)
        fail_beta = (i > 1) & ((beta == 0) | jnp.isinf(beta))
        p = jnp.where(i == 1, z, z + beta * p)

        q = matvec(p)
        pq = dot(p, q)
        indefinite = (pq <= 0) | jnp.isinf(pq)
        alpha = rho / jnp.where(pq == 0, 1.0, pq)
        fail_alpha = jnp.isinf(alpha)

        broken = fail_rho | fail_beta | fail_alpha | indefinite
        alpha_eff = jnp.where(broken, 0.0, alpha)
        x = x + alpha_eff * p

        r = jnp.where(i % reset_period == 0,
                      b - matvec(x),
                      r - alpha_eff * q)

        q1 = -dot(x, b + r)
        zeta = i.astype(f32) * (q1 - q0) / q1
        norm_r = jnp.sqrt(dot(r, r))
        done_q = (zeta < q_tol) & (i >= min_iters)
        done_r = (norm_r <= tol_r) & (i >= min_iters)
        term = jnp.where(
            fail_rho | fail_beta | fail_alpha,
            CG_FAILURE,
            jnp.where(indefinite, CG_NO_CONVERGENCE,
                      jnp.where(done_q | done_r, CG_SUCCESS,
                                CG_RUNNING))).astype(jnp.int32)
        return (i, x, r, p, rho, q1, term)

    zero2 = jnp.zeros((D, Nc), f32)
    state0 = (jnp.asarray(0, jnp.int32), zero2, b, b,
              jnp.asarray(1.0, f32), jnp.asarray(0.0, f32),
              jnp.asarray(CG_RUNNING, jnp.int32))
    i, x, r, p, rho, q0, term = jax.lax.while_loop(cond, body, state0)

    bzero = norm_b == 0
    term = jnp.where(bzero, CG_SUCCESS,
                     jnp.where(term == CG_RUNNING, CG_NO_CONVERGENCE,
                               term))
    x = jnp.where(bzero, zero2, x)
    q1 = -dot(x, b + r)
    zeta = i.astype(f32) * (q1 - q0) / jnp.where(q1 == 0, 1.0, q1)

    out_x[:] = x
    out_stats[:] = jnp.stack(
        [i.astype(f32), term.astype(f32), zeta,
         jnp.sqrt(dot(r, r))]).reshape(1, 4)


@functools.partial(
    jax.jit,
    static_argnames=("min_num_iterations", "max_num_iterations",
                     "residual_reset_period", "q_tolerance",
                     "r_tolerance", "interpret"))
def pcg_dense_vmem(
    Hz: jnp.ndarray,  # [M, M] z-space padded dense system, M = 9*Nc
    chol: jnp.ndarray,  # [N, 9, 9] preconditioner Cholesky factors
    b: jnp.ndarray,  # [N, 9]
    *,
    min_num_iterations: int = 0,
    max_num_iterations: int = 500,
    residual_reset_period: int = 10,
    q_tolerance: float = 0.1,
    r_tolerance: float = -1.0,
    interpret: bool = False,
) -> CGResult:
    """Drop-in pcg() for the VMEM-resident dense path (f32 only).

    Returns x in the caller's [N, 9] layout.
    """
    M = Hz.shape[0]
    Nc = M // D
    N = b.shape[0]
    Lp = chol_planes(chol.astype(jnp.float32), Nc)
    b2 = jnp.zeros((D, Nc), jnp.float32)
    b2 = b2.at[:, :N].set(b.astype(jnp.float32).T)

    kernel = functools.partial(
        _cg_kernel,
        max_iters=max_num_iterations,
        min_iters=min_num_iterations,
        q_tol=q_tolerance,
        r_tol=r_tolerance,
        reset_period=residual_reset_period,
    )
    x2, stats = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, Nc), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ),
        interpret=interpret,
    )(Hz.astype(jnp.float32), b2, Lp)

    x = x2[:, :N].T.astype(b.dtype)
    return CGResult(
        x=x,
        num_iterations=stats[0, 0].astype(jnp.int32),
        termination_type=stats[0, 1].astype(jnp.int32),
        final_zeta=stats[0, 2],
        final_norm_r=stats[0, 3],
    )
