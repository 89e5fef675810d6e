"""Camera-major layout equivalence: CmSqrtLinearizer must reproduce the
flat layout bit-for-bit up to reduction-order rounding (the TPU analog
of the reference's reduction_alg 0-vs-1 dual-path guarantee,
solver_options.hpp:266 and qr/linearization_qr.test.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rootba_tpu.bal.bucketing import bucketize
from rootba_tpu.config.options import SolverOptions
from rootba_tpu.solver.lm import initial_state
from rootba_tpu.solver.sqrt_cm import CmSqrtLinearizer
from rootba_tpu.solver.sqrt_flat import FlatSqrtLinearizer


@pytest.fixture(scope="module")
def pair(synthetic_problem):
    bp = bucketize(synthetic_problem, pow2_from=9)
    opts = SolverOptions(use_double=True)
    flat = FlatSqrtLinearizer(bp, opts, np.float64)
    cm = CmSqrtLinearizer(bp, opts, np.float64)
    state = initial_state(bp, jnp.float64)
    flat.set_state(state)
    cm.set_state(state)
    flat.linearize()
    cm.linearize()
    return bp, flat, cm, state


def test_error_equivalence(pair):
    bp, flat, cm, state = pair
    e_flat = flat.error_pure(flat.consts, state.cams, state.lm_ps)
    e_cm = cm.error_pure(cm.consts, state.cams, state.lm_ps)
    assert int(e_flat.all.num_obs) == int(e_cm.all.num_obs)
    assert int(e_flat.valid.num_obs) == int(e_cm.valid.num_obs)
    np.testing.assert_allclose(float(e_flat.all.error),
                               float(e_cm.all.error), rtol=1e-12)
    np.testing.assert_allclose(float(e_flat.valid.error),
                               float(e_cm.valid.error), rtol=1e-12)


def test_stage1_pose_scale(pair):
    bp, flat, cm, state = pair
    np.testing.assert_allclose(np.asarray(flat._pose_scale),
                               np.asarray(cm._pose_scale), rtol=1e-10)


@pytest.mark.parametrize("lam", [1e-4, 1e-1])
def test_stage2_and_matvec(pair, lam):
    from rootba_tpu.solver import sqrt_cm, sqrt_flat

    bp, flat, cm, state = pair
    N = flat.num_cameras
    lam_arr = jnp.asarray(lam, jnp.float64)

    buckets, csr, cam_flat = flat.consts[:3]
    s2_flat = sqrt_flat.flat_stage2(flat._lins, buckets, cam_flat,
                                    lam_arr, N)
    cmi, lm_masks = cm.consts
    s2_cm = sqrt_cm.cm_stage2(cm._lins, cmi, cm._width, cm._bp_shapes,
                              lam_arr, N)

    np.testing.assert_allclose(np.asarray(s2_flat.b),
                               np.asarray(s2_cm.b), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2_flat.precond_chol),
                               np.asarray(s2_cm.precond_chol),
                               rtol=1e-8, atol=1e-10)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(N, 9)))
    y_flat = sqrt_flat.flat_matvec(flat._lins, s2_flat, buckets,
                                   cam_flat, N, x, csr=csr)
    y_cm = sqrt_cm.cm_matvec(cm._lins, s2_cm, cmi, cm._width,
                             cm._bp_shapes, N, x)
    np.testing.assert_allclose(np.asarray(y_flat), np.asarray(y_cm),
                               rtol=1e-9, atol=1e-12)


def test_solve_and_apply(pair):
    bp, flat, cm, state = pair
    inc_flat = flat.solve(1e-3)
    inc_cm = cm.solve(1e-3)
    np.testing.assert_allclose(np.asarray(inc_flat), np.asarray(inc_cm),
                               rtol=1e-6, atol=1e-9)

    st_flat, ld_flat = flat.apply(inc_flat)
    st_cm, ld_cm = cm.apply(inc_flat)
    np.testing.assert_allclose(ld_flat, ld_cm, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(st_flat.cams.q),
                               np.asarray(st_cm.cams.q), rtol=1e-12)
    for a, b in zip(st_flat.lm_ps, st_cm.lm_ps):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_full_lm_run_matches_flat(synthetic_problem):
    """5 LM iterations end-to-end: identical cost trajectory."""
    from rootba_tpu.log.summary import SolverSummary
    from rootba_tpu.solver.lm import bundle_adjust

    costs = {}
    for layout in ("flat", "cm"):
        problem = synthetic_problem.copy()
        opts = SolverOptions(use_double=True, max_num_iterations=5,
                             verbosity_level=0, kernel_layout=layout,
                             function_tolerance=0.0)
        summary = SolverSummary()
        bundle_adjust(problem, opts, summary)
        costs[layout] = [it.cost.all.error for it in summary.iterations]
    np.testing.assert_allclose(costs["flat"], costs["cm"], rtol=1e-7)
