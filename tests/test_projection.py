"""Projection Jacobian tests: analytic vs jax.jacfwd (the TPU analog of
the reference's central-difference checks, testing/test_jacobian.hpp:66-108
and bal/snavely_projection.test.cpp / bal_bundle_adjustment_helper.test.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rootba_tpu.core import lie
from rootba_tpu.core.projection import linearize_point, project


def make_case(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(n, 3))
    # points guaranteed in front of the camera: p_c = R p_w + t with z>0
    p_c = np.stack([rng.normal(0, 1, n), rng.normal(0, 1, n),
                    rng.uniform(2.0, 8.0, n)], axis=1)
    Rm = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    p_w = np.einsum("nji,nj->ni", Rm, p_c - t)  # R^T (p_c - t)
    intr = np.stack([rng.uniform(500, 1000, n),
                     rng.uniform(-1e-7, 1e-7, n),
                     rng.uniform(-1e-13, 1e-13, n)], axis=1)
    obs = rng.normal(0, 100, (n, 2))
    return q, t, p_w, intr, obs


def test_jacobians_vs_autodiff():
    rng = np.random.default_rng(0)
    q, t, p_w, intr, obs = (jnp.asarray(a) for a in make_case(rng, 16))

    res, valid, Jp, Jl = linearize_point(p_w, obs, q, t, intr)
    assert bool(jnp.all(valid))

    # landmark jacobian via autodiff
    def res_of_lm(p, i):
        r, _, _, _ = linearize_point(p, obs[i], q[i], t[i], intr[i],
                                     with_jacobians=False)
        return r

    for i in range(4):
        Jl_num = jax.jacfwd(res_of_lm)(p_w[i], i)
        np.testing.assert_allclose(np.asarray(Jl[i]), np.asarray(Jl_num),
                                   rtol=1e-9, atol=1e-9)

    # pose jacobian: perturb with decoupled left increment at 0
    def res_of_inc(inc, i):
        qq, tt = lie.apply_inc_pose(q[i], t[i], inc)
        r, _, _, _ = linearize_point(p_w[i], obs[i], qq, tt,
                                     intr[i] + inc[6:9],
                                     with_jacobians=False)
        return r

    for i in range(4):
        J_num = jax.jacfwd(res_of_inc)(jnp.zeros(9, dtype=p_w.dtype), i)
        np.testing.assert_allclose(np.asarray(Jp[i]), np.asarray(J_num),
                                   rtol=1e-7, atol=1e-7)


def test_project_validity():
    intr = jnp.asarray([[100.0, 0.0, 0.0]])
    behind = jnp.asarray([[0.1, 0.1, -1.0]])
    front = jnp.asarray([[0.1, 0.1, 1.0]])
    _, v1 = project(behind, intr)
    _, v2 = project(front, intr)
    assert not bool(v1[0])
    assert bool(v2[0])


def test_float32_close_to_float64():
    rng = np.random.default_rng(1)
    q, t, p_w, intr, obs = make_case(rng, 8)
    args64 = tuple(jnp.asarray(a) for a in (p_w, obs, q, t, intr))
    args32 = tuple(jnp.asarray(a, dtype=jnp.float32)
                   for a in (p_w, obs, q, t, intr))
    r64, _, Jp64, Jl64 = linearize_point(*args64)
    r32, _, Jp32, Jl32 = linearize_point(*args32)
    np.testing.assert_allclose(np.asarray(r32), np.asarray(r64),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(Jp32), np.asarray(Jp64),
                               rtol=1e-2, atol=1.0)
    np.testing.assert_allclose(np.asarray(Jl32), np.asarray(Jl64),
                               rtol=1e-2, atol=1.0)
