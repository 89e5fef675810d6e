"""SO3/SE3 unit tests (quaternion conventions, exp/log, increments)."""

import jax.numpy as jnp
import numpy as np

from rootba_tpu.bal import nplie
from rootba_tpu.core import lie


def random_quat(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = random_quat(rng, 32)
    v = rng.normal(size=(32, 3))
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    out1 = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    out2 = np.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(out1, out2, atol=1e-12)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 3))
    w *= (rng.uniform(0, 3.0, (64, 1)) / np.linalg.norm(w, axis=-1,
                                                        keepdims=True))
    q = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(q))
    np.testing.assert_allclose(w2, w, atol=1e-9)


def test_exp_small_angle():
    w = jnp.asarray([[1e-12, 0, 0], [0.0, 0, 0]])
    q = np.asarray(lie.so3_exp(w))
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-15)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-15)


def test_np_and_jax_agree():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(16, 3))
    q_np = nplie.so3_exp(w)
    q_jx = np.asarray(lie.so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(q_np, q_jx, atol=1e-14)

    v = rng.normal(size=(16, 3))
    np.testing.assert_allclose(
        nplie.quat_rotate(q_np, v),
        np.asarray(lie.quat_rotate(jnp.asarray(q_np), jnp.asarray(v))),
        atol=1e-13,
    )


def test_quat_from_matrix_roundtrip():
    rng = np.random.default_rng(3)
    q = random_quat(rng, 128)
    q[q[:, 0] < 0] *= -1  # canonical sign
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    q2 = nplie.quat_from_matrix(R)
    q2[q2[:, 0] < 0] *= -1
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_apply_inc_pose_matches_matrix_composition():
    rng = np.random.default_rng(4)
    q = random_quat(rng, 8)
    t = rng.normal(size=(8, 3))
    inc = rng.normal(size=(8, 6)) * 0.1
    q2, t2 = lie.apply_inc_pose(jnp.asarray(q), jnp.asarray(t),
                                jnp.asarray(inc))
    # reference semantics: T_new = (exp(w), v) * T_old
    Rinc = np.asarray(lie.quat_to_matrix(lie.so3_exp(jnp.asarray(inc[:, 3:]))))
    Rold = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    Rnew = np.einsum("nij,njk->nik", Rinc, Rold)
    tnew = np.einsum("nij,nj->ni", Rinc, t) + inc[:, :3]
    np.testing.assert_allclose(
        np.asarray(lie.quat_to_matrix(q2)), Rnew, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t2), tnew, atol=1e-12)
