"""Multi-device sharding equivalence: the landmark-sharded solve on an
8-device mesh must reproduce the single-device solve (the TPU analog of
the reference's reduce-vs-mutex dual-path consistency check,
SURVEY 2.11 / solver_options.hpp reduction_alg)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rootba_tpu.bal.bucketing import bucketize
from rootba_tpu.bal.synthetic import generate_synthetic_bal
from rootba_tpu.config.options import SolverOptions, SolverType
from rootba_tpu.parallel.mesh import (
    make_mesh,
    pad_rows_for_mesh,
    shard_state,
)
from rootba_tpu.solver.lm import (
    SqrtLinearizer,
    create_linearizer,
    initial_state,
)


def make_problem():
    p = generate_synthetic_bal(num_cams=10, num_lms=160,
                               mean_obs_per_lm=4.0, seed=9)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    return p


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("solver_type", [
    SolverType.SQUARE_ROOT,
    SolverType.SCHUR_COMPLEMENT,
    SolverType.POWER_SCHUR_COMPLEMENT,
])
def test_sharded_solve_matches_single_device(solver_type):
    p = make_problem()
    # dense_rcs_max_cameras=0: the single-device side must use the same
    # block-sparse/implicit formulation the mesh side uses, so the
    # comparison isolates sharding (dense-vs-sparse equivalence is
    # covered by test_solver_equivalence)
    opts = SolverOptions(max_num_iterations=4, verbosity_level=0,
                         bucket_pow2_from=4, solver_type=solver_type,
                         kernel_layout="einsum",
                         dense_rcs_max_cameras=0)
    bp = bucketize(p, pow2_from=4, row_align=pad_rows_for_mesh(8))

    # single device
    lin1 = create_linearizer(bp, opts, jnp.float64)
    state1 = initial_state(bp, jnp.float64)
    lin1.set_state(state1)
    lin1.linearize()
    inc1 = lin1.solve(1e-4)
    new1, ldiff1 = lin1.apply(inc1)

    # 8-device mesh
    mesh = make_mesh(8)
    lin8 = create_linearizer(bp, opts, jnp.float64, mesh)
    state8 = shard_state(initial_state(bp, jnp.float64), mesh)
    lin8.set_state(state8)
    lin8.linearize()
    inc8 = lin8.solve(1e-4)
    new8, ldiff8 = lin8.apply(inc8)

    np.testing.assert_allclose(np.asarray(inc8), np.asarray(inc1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(ldiff8), float(ldiff1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(new8.cams.q),
                               np.asarray(new1.cams.q), atol=1e-12)
    for a, b in zip(new8.lm_ps, new1.lm_ps):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fused_solve_sharded():
    """Full fused LM on the mesh produces the same result as unsharded."""
    from rootba_tpu.solver.fused_lm import build_fused_lm

    p = make_problem()
    opts = SolverOptions(max_num_iterations=4, verbosity_level=0,
                         bucket_pow2_from=4)
    bp = bucketize(p, pow2_from=4, row_align=pad_rows_for_mesh(8))

    lin1 = SqrtLinearizer(bp, opts, jnp.float64)
    fn1 = build_fused_lm(lin1, opts)
    s1 = initial_state(bp, jnp.float64)
    out1 = jax.block_until_ready(fn1(lin1.consts, s1.cams, s1.lm_ps))

    mesh = make_mesh(8)
    lin8 = SqrtLinearizer(bp, opts, jnp.float64, mesh)
    fn8 = build_fused_lm(lin8, opts)
    s8 = shard_state(initial_state(bp, jnp.float64), mesh)
    out8 = jax.block_until_ready(fn8(lin8.consts, s8.cams, s8.lm_ps))

    np.testing.assert_allclose(
        np.asarray(out8[2].cost_all_error),
        np.asarray(out1[2].cost_all_error), rtol=1e-9)
    assert int(out8[4]) == int(out1[4])
    np.testing.assert_allclose(np.asarray(out8[0].q),
                               np.asarray(out1[0].q), atol=1e-9)
