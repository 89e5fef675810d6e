"""Compensated f32 accumulation (ops/compensated.py): accuracy vs
float64 ground truth, and the LM driver's honest-timing plumbing
(timing_attributed flag, calibration fractions).

The reference sidesteps f32 accumulation error by offering use_double
(solver_options.hpp:255); on TPU f64 is emulated, so the f32 path
carries error-free-transform accumulation instead (SURVEY §7.6 risk
points: CG dots, l_diff).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rootba_tpu.ops.compensated import (
    comp_dot,
    comp_sum,
    comp_sum2,
    two_prod,
    two_sum,
)


def test_two_sum_exact():
    a = jnp.float32(1e8)
    b = jnp.float32(1.5)
    s, e = two_sum(a, b)
    assert float(s) + float(e) == 1e8 + 1.5


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=64).astype(np.float32))
    b = jnp.asarray(rng.normal(size=64).astype(np.float32))
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


@pytest.mark.parametrize("n", [1, 2, 7, 1024, 100001])
def test_comp_sum_correctly_rounded(n):
    rng = np.random.default_rng(n)
    # wide dynamic range + cancellation: the plain-f32 killer
    x = (rng.normal(size=n) * 10.0 ** rng.uniform(-3, 6, size=n)).astype(
        np.float32)
    exact = float(np.sum(x.astype(np.float64)))
    got = float(comp_sum(jnp.asarray(x)))
    assert got == pytest.approx(exact, rel=2e-7, abs=1e-30)
    # the double-float pair is much tighter than one f32
    hi, lo = comp_sum2(jnp.asarray(x))
    assert float(np.float64(hi) + np.float64(lo)) == pytest.approx(
        exact, rel=1e-12, abs=1e-30)


def test_comp_dot_cancellation():
    # a'b with massive cancellation: plain f32 loses most digits
    rng = np.random.default_rng(3)
    n = 4096
    a = rng.normal(size=n).astype(np.float32) * 1e3
    b = rng.normal(size=n).astype(np.float32)
    # make the true dot tiny relative to the term magnitudes
    b64 = b.astype(np.float64)
    a64 = a.astype(np.float64)
    target = np.dot(a64, b64)
    b = (b - (target / np.dot(a64, a64) * a)).astype(np.float32)
    exact = np.dot(a.astype(np.float64), b.astype(np.float64))
    got = float(comp_dot(jnp.asarray(a), jnp.asarray(b)))
    plain = float(jnp.vdot(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - exact) <= abs(plain - exact)
    assert got == pytest.approx(exact, rel=1e-5, abs=1e-2)


def test_l_diff_compensation_close_to_f64(synthetic_problem):
    """f32 l_diff with compensation matches the f64 l_diff much more
    tightly than plain f32 on a real back-substitution."""
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver.lm import create_linearizer, initial_state

    bp = bucketize(synthetic_problem, pow2_from=9)

    def l_diff_for(dtype, compensated):
        opts = SolverOptions(use_double=(dtype == np.float64),
                             compensated_accumulation=compensated)
        lin = create_linearizer(bp, opts, dtype)
        state = initial_state(bp, dtype)
        lam = jnp.asarray(1e-3, dtype)
        lins, pose_scale, _ = lin._stage1_fn(lin.consts, state.cams,
                                             state.lm_ps)
        aux = lin._stage2_fn(lin.consts, lins, lam)
        inc, s2, _, _ = lin._lsolve_fn(lin.consts, lins, aux)
        _, _, l_diff = lin._apply_fn(lin.consts, state.cams,
                                     state.lm_ps, lins, s2, pose_scale,
                                     inc)
        return float(l_diff)

    ref = l_diff_for(np.float64, False)
    comp = l_diff_for(np.float32, True)
    assert comp == pytest.approx(ref, rel=1e-3)


def test_host_loop_timings_measured_or_flagged(synthetic_problem):
    """Every iteration's stage timings are either measured (calibration
    iterations) or explicitly flagged timing_attributed; the attributed
    ones use measured fractions, not constants."""
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.solver.lm import optimize_lm

    bp = bucketize(synthetic_problem, pow2_from=9)
    opts = SolverOptions(max_num_iterations=6, verbosity_level=0,
                         lm_loop="host", timing_calibration_interval=3)
    _, summary = optimize_lm(bp, opts)
    its = summary.iterations[1:]  # iteration 0 is eval-only
    assert len(its) >= 4
    flags = [it.timing_attributed for it in its]
    assert any(flags) and not all(flags)
    for it in its:
        total_stage = (it.stage2_time_in_seconds
                       + it.prepare_time_in_seconds
                       + it.solve_reduced_system_time_in_seconds
                       + it.back_substitution_time_in_seconds)
        assert total_stage > 0.0
    # the ba_log carries the flag per iteration and in the static blob
    from rootba_tpu.log.ba_log import build_log_dict

    d = build_log_dict(summary)
    assert "timing_attributed" in d
    assert d["_static"]["solver"]["timing_attributed"] is True
