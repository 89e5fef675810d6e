"""Checkpoint/resume of the host-loop LM driver.

The reference has no mid-solve checkpointing (SURVEY §5); this is a
TPU-native addition. The invariant tested: a solve interrupted at
iteration k and resumed must follow the same LM trajectory (costs,
trust region) as an uninterrupted solve, because the checkpoint captures
the complete driver state (state pytree, lambda, lambda_vee, iteration
log).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from rootba_tpu.bal.bucketing import bucketize
from rootba_tpu.bal.synthetic import generate_synthetic_bal
from rootba_tpu.config.options import SolverOptions
from rootba_tpu.log.summary import SolverSummary
from rootba_tpu.solver.lm import optimize_lm


def _problem():
    p = generate_synthetic_bal(num_cams=8, num_lms=120,
                               mean_obs_per_lm=4.0, seed=21)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    return bucketize(p)


def _opts(**kw):
    return SolverOptions(use_double=True, verbosity_level=0,
                         function_tolerance=0.0, lm_loop="host", **kw)


def test_checkpoint_resume_matches_straight_run(tmp_path):
    bp = _problem()

    ref_state, ref_summary = optimize_lm(bp, _opts(max_num_iterations=8))

    ckpt = os.path.join(tmp_path, "solve.ckpt.npz")
    # phase 1: run 4 iterations, checkpoint every iteration
    optimize_lm(bp, _opts(max_num_iterations=4, checkpoint_path=ckpt,
                          checkpoint_interval=1))
    assert os.path.exists(ckpt)
    # phase 2: resume to 8
    state2, summary2 = optimize_lm(
        bp, _opts(max_num_iterations=8, checkpoint_path=ckpt,
                  checkpoint_interval=1))

    assert len(summary2.iterations) == len(ref_summary.iterations)
    for a, b in zip(summary2.iterations, ref_summary.iterations):
        assert a.iteration == b.iteration
        np.testing.assert_allclose(a.cost.all.error, b.cost.all.error,
                                   rtol=1e-12)
        np.testing.assert_allclose(a.trust_region_radius,
                                   b.trust_region_radius, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(state2.cams.q),
                               np.asarray(ref_state.cams.q), atol=1e-12)
    for a, b in zip(state2.lm_ps, ref_state.lm_ps):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-12)


def test_checkpoint_roundtrip_content(tmp_path):
    from rootba_tpu.log.summary import IterationSummary
    from rootba_tpu.solver.lm import BAState, initial_state
    from rootba_tpu.utils.checkpoint import (
        iteration_from_dict,
        iteration_to_dict,
        load_checkpoint,
        save_checkpoint,
    )

    bp = _problem()
    state = initial_state(bp, jnp.float64)
    its = [iteration_to_dict(IterationSummary(iteration=0))]
    path = os.path.join(tmp_path, "c.npz")
    save_checkpoint(path, state, 0.125, 4.0, 3, its)
    cq, ct, ci, lm_ps, lam, vee, it, its2 = load_checkpoint(path)
    assert lam == 0.125 and vee == 4.0 and it == 3
    np.testing.assert_array_equal(cq, np.asarray(state.cams.q))
    assert len(lm_ps) == len(state.lm_ps)
    rec = iteration_from_dict(its2[0])
    assert rec.iteration == 0 and rec.cost.all.num_obs == 0


def test_load_checkpoint_missing_returns_none(tmp_path):
    from rootba_tpu.utils.checkpoint import load_checkpoint

    assert load_checkpoint(os.path.join(tmp_path, "nope.npz")) is None
