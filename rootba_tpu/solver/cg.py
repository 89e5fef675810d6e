"""Preconditioned conjugate gradients inside jit.

Port of the reference's Ceres-derived solver logic
(cg/conjugate_gradient.hpp:83-300) to a lax.while_loop: residual reset
every `residual_reset_period` iterations, rho/beta/alpha breakdown
detection, indefiniteness check (p'q <= 0), and the dual termination
criterion -- Nash quadratic-model zeta test (zeta = i (Q1-Q0)/Q1 <
q_tolerance) and |r| <= r_tolerance |b| -- with min/max iteration
bounds. The operator and preconditioner are closures, so the same loop
serves the implicit sqrt-QR operator, the explicit SC block matrix and
the PoBA preconditioner.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# termination types (mirror ConjugateGradientsSolver::Summary)
CG_RUNNING = -1
CG_NO_CONVERGENCE = 0
CG_SUCCESS = 1
CG_FAILURE = 2


class CGResult(NamedTuple):
    x: jnp.ndarray
    num_iterations: jnp.ndarray  # int32
    termination_type: jnp.ndarray  # int32
    final_zeta: jnp.ndarray
    final_norm_r: jnp.ndarray


def _dot(a, b):
    return jnp.vdot(a.ravel(), b.ravel())


def _make_dot(compensated: bool):
    if not compensated:
        return _dot
    from rootba_tpu.ops.compensated import comp_dot

    return lambda a, b: comp_dot(a.ravel(), b.ravel())


def _zero_or_inf(x):
    return (x == 0) | jnp.isinf(x)


def pcg(
    matvec: Callable,
    precond: Callable,
    b: jnp.ndarray,
    *,
    min_num_iterations: int = 0,
    max_num_iterations: int = 500,
    residual_reset_period: int = 10,
    q_tolerance: float = 0.1,
    r_tolerance: float = -1.0,
    compensated: bool = False,
) -> CGResult:
    """Solve H x = b. x0 = 0. Shapes of b are free-form (typically [N,9]).

    compensated=True computes the rho / p'q / Nash-q1 dot products with
    error-free-transform accumulation (ops.compensated.comp_dot): under
    f32 the zeta = i(Q1-Q0)/Q1 termination test differs two large
    near-equal model values, where plain f32 dots can trigger early or
    late termination at multi-million-observation scale (SURVEY §7.6)."""
    dtype = b.dtype
    _dot = _make_dot(compensated)
    norm_b = jnp.linalg.norm(b.ravel())
    tol_r = jnp.asarray(r_tolerance, dtype) * norm_b

    x0 = jnp.zeros_like(b)
    r0 = b  # r = b - H @ 0

    def cond(state):
        i, x, r, p, rho, q0, term = state
        return (term == CG_RUNNING) & (i < max_num_iterations)

    def body(state):
        i, x, r, p, rho, q0, term = state
        i = i + 1

        z = precond(r)
        last_rho = rho
        rho = _dot(r, z)

        fail_rho = _zero_or_inf(rho)

        beta = rho / jnp.where(last_rho == 0, jnp.ones_like(last_rho), last_rho)
        fail_beta = (i > 1) & _zero_or_inf(beta)
        p = jnp.where(i == 1, z, z + beta.astype(dtype) * p)

        q = matvec(p)
        pq = _dot(p, q)
        indefinite = (pq <= 0) | jnp.isinf(pq)

        alpha = rho / jnp.where(pq == 0, jnp.ones_like(pq), pq)
        fail_alpha = jnp.isinf(alpha)

        # the reference breaks *before* applying the update on any of
        # these failures (conjugate_gradient.hpp:140-225); keep x as-is
        broken = fail_rho | fail_beta | fail_alpha | indefinite
        alpha_eff = jnp.where(broken, jnp.zeros_like(alpha), alpha)
        x = x + alpha_eff.astype(dtype) * p

        # periodic exact residual to fight drift (extra matvec)
        def reset_r(_):
            return b - matvec(x)

        def update_r(_):
            return r - alpha_eff.astype(dtype) * q

        r = jax.lax.cond(i % residual_reset_period == 0, reset_r, update_r,
                         None)

        q1 = -_dot(x, b + r)
        zeta = i.astype(q1.dtype) * (q1 - q0) / q1
        norm_r = jnp.linalg.norm(r.ravel())

        done_q = (zeta < q_tolerance) & (i >= min_num_iterations)
        done_r = (norm_r <= tol_r) & (i >= min_num_iterations)

        term = jnp.where(
            fail_rho | fail_beta | fail_alpha,
            CG_FAILURE,
            jnp.where(
                indefinite,
                CG_NO_CONVERGENCE,
                jnp.where(done_q | done_r, CG_SUCCESS, CG_RUNNING),
            ),
        ).astype(jnp.int32)

        q0 = q1
        return (i, x, r, p, rho, q0, term)

    i0 = jnp.asarray(0, jnp.int32)
    rho0 = jnp.asarray(1.0, jnp.result_type(dtype, jnp.float32))
    q00 = jnp.asarray(0.0, rho0.dtype)
    term0 = jnp.asarray(CG_RUNNING, jnp.int32)

    i, x, r, p, rho, q0, term = jax.lax.while_loop(
        cond, body, (i0, x0, r0, r0, rho0, q00, term0)
    )

    # |b| == 0 -> success with x = 0 (reference line: "Convergence. |b| = 0")
    bzero = norm_b == 0
    term = jnp.where(bzero, CG_SUCCESS, jnp.where(term == CG_RUNNING,
                                                  CG_NO_CONVERGENCE, term))
    x = jnp.where(bzero, jnp.zeros_like(x), x)

    q1 = -_dot(x, b + r)
    zeta = i.astype(q1.dtype) * (q1 - q0) / jnp.where(q1 == 0, 1.0, q1)
    return CGResult(
        x=x,
        num_iterations=i,
        termination_type=term,
        final_zeta=zeta,
        final_norm_r=jnp.linalg.norm(r.ravel()),
    )
