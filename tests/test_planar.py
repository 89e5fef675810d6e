"""Planar-layout sqrt solver must match the einsum-layout formulation
exactly (same math, different memory layout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rootba_tpu.bal.bucketing import bucketize
from rootba_tpu.config.options import SolverOptions
from rootba_tpu.ops import planar as pl
from rootba_tpu.ops.batched_qr import householder_qr3
from rootba_tpu.solver.lm import SqrtLinearizer, bundle_adjust, initial_state
from rootba_tpu.solver.sqrt_planar import PlanarSqrtLinearizer


@pytest.fixture(scope="module")
def setup(synthetic_problem):
    bp = bucketize(synthetic_problem, pow2_from=4)
    opts = SolverOptions(bucket_pow2_from=4)
    return bp, opts


def test_planar_qr_matches_batched(setup):
    rng = np.random.default_rng(0)
    L, m = 64, 11
    A = rng.normal(size=(L, m, 3))
    R_b, Q1_b = householder_qr3(jnp.asarray(A))
    cols = [jnp.asarray(A[:, :, c].T) for c in range(3)]  # [m, L]
    R_p, Q1_p = pl.planar_qr3(cols, m)
    for k in range(3):
        for c in range(3):
            np.testing.assert_allclose(np.asarray(R_p[k][c]),
                                       np.asarray(R_b[:, k, c]),
                                       rtol=1e-12, atol=1e-12)
    for c in range(3):
        np.testing.assert_allclose(np.asarray(Q1_p[c]),
                                   np.asarray(Q1_b[:, :, c].T),
                                   rtol=1e-12, atol=1e-12)


def test_planar_stage1_matches_einsum(setup):
    bp, opts = setup
    lin_e = SqrtLinearizer(bp, opts, jnp.float64)
    lin_p = PlanarSqrtLinearizer(bp, opts, jnp.float64)
    state = initial_state(bp, jnp.float64)
    state_p = lin_p.prepare_state(state)

    lins_e, ps_e, _ = jax.jit(lin_e.stage1_pure)(lin_e.consts, state.cams, state.lm_ps)
    lins_p, ps_p, _ = jax.jit(lin_p.stage1_pure)(lin_p.consts, state_p.cams,
                                                 state_p.lm_ps)
    np.testing.assert_allclose(np.asarray(ps_p), np.asarray(ps_e),
                               rtol=1e-12)
    for le, lp, bucket in zip(lins_e, lins_p, bp.buckets):
        n = bucket.n_obs
        L = le.Jp.shape[0]
        # Jp: einsum [L,n,2,9] vs planar [n*18, L]
        Jp_p = np.asarray(lp.Jp).reshape(n, 2, 9, L).transpose(3, 0, 1, 2)
        np.testing.assert_allclose(Jp_p, np.asarray(le.Jp), rtol=1e-10,
                                   atol=1e-12)
        Jl_p = np.asarray(lp.Jl).reshape(n, 2, 3, L).transpose(3, 0, 1, 2)
        np.testing.assert_allclose(Jl_p, np.asarray(le.Jl), rtol=1e-10,
                                   atol=1e-12)
        r_p = np.asarray(lp.r).reshape(n, 2, L).transpose(2, 0, 1)
        np.testing.assert_allclose(r_p, np.asarray(le.r), rtol=1e-10,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(lp.Jl_scale).T,
                                   np.asarray(le.Jl_scale), rtol=1e-12)


def test_planar_solve_matches_einsum(setup):
    bp, opts = setup
    lam = jnp.asarray(1e-3, jnp.float64)

    lin_e = SqrtLinearizer(bp, opts, jnp.float64)
    state = initial_state(bp, jnp.float64)
    lins_e, ps_e, _ = jax.jit(lin_e.stage1_pure)(lin_e.consts, state.cams, state.lm_ps)
    inc_e, s2_e, it_e, _ = jax.jit(lin_e.solve_pure)(lin_e.consts, lins_e, lam)

    lin_p = PlanarSqrtLinearizer(bp, opts, jnp.float64)
    state_p = lin_p.prepare_state(state)
    lins_p, ps_p, _ = jax.jit(lin_p.stage1_pure)(lin_p.consts, state_p.cams,
                                                 state_p.lm_ps)
    inc_p, s2_p, it_p, _ = jax.jit(lin_p.solve_pure)(lin_p.consts, lins_p, lam)

    np.testing.assert_allclose(np.asarray(s2_p.b), np.asarray(s2_e.b),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(inc_p), np.asarray(inc_e),
                               rtol=1e-7, atol=1e-9)
    assert int(it_p) == int(it_e)

    # apply
    cams_e, lm_e, ld_e = jax.jit(lin_e.apply_pure)(
        lin_e.consts, state.cams, state.lm_ps, lins_e, s2_e, ps_e, inc_e)
    cams_p, lm_p2, ld_p = jax.jit(lin_p.apply_pure)(
        lin_p.consts, state_p.cams, state_p.lm_ps, lins_p, s2_p, ps_p,
        inc_p)
    np.testing.assert_allclose(float(ld_p), float(ld_e), rtol=1e-9)
    for a, b in zip(lin_p.export_lm_ps(lm_p2), lm_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cams_p.q),
                               np.asarray(cams_e.q), atol=1e-12)


def test_planar_error_matches_einsum(setup):
    bp, opts = setup
    lin_e = SqrtLinearizer(bp, opts, jnp.float64)
    lin_p = PlanarSqrtLinearizer(bp, opts, jnp.float64)
    state = initial_state(bp, jnp.float64)
    state_p = lin_p.prepare_state(state)
    ri_e = jax.jit(lin_e.error_pure)(lin_e.consts, state.cams, state.lm_ps)
    ri_p = jax.jit(lin_p.error_pure)(lin_p.consts, state_p.cams, state_p.lm_ps)
    np.testing.assert_allclose(float(ri_p.all.error),
                               float(ri_e.all.error), rtol=1e-12)
    assert int(ri_p.valid.num_obs) == int(ri_e.valid.num_obs)


def test_planar_end_to_end(synthetic_problem):
    p1 = synthetic_problem.copy()
    s1 = bundle_adjust(p1, SolverOptions(
        max_num_iterations=6, verbosity_level=0, bucket_pow2_from=4,
        kernel_layout="planar"))
    p2 = synthetic_problem.copy()
    s2 = bundle_adjust(p2, SolverOptions(
        max_num_iterations=6, verbosity_level=0, bucket_pow2_from=4,
        kernel_layout="einsum"))
    for a, b in zip(s1.iterations, s2.iterations):
        np.testing.assert_allclose(a.cost.all.error, b.cost.all.error,
                                   rtol=1e-9)
        assert a.step_is_successful == b.step_is_successful
    np.testing.assert_allclose(p1.lm_p, p2.lm_p, rtol=1e-6, atol=1e-8)
