"""BAL problem IO / preprocessing / bucketing tests."""

import numpy as np
import pytest

from rootba_tpu.bal import nplie
from rootba_tpu.bal.bucketing import bucketize, scatter_landmarks
from rootba_tpu.bal.problem import (
    BalProblem,
    load_bal,
    load_normalized_bal_problem,
)
from rootba_tpu.bal.synthetic import generate_synthetic_bal, write_bal_file
from rootba_tpu.config.options import BalDatasetOptions


def test_bal_roundtrip(tmp_path):
    p = generate_synthetic_bal(num_cams=8, num_lms=50, seed=1)
    path = str(tmp_path / "problem-8-50-pre.txt")
    write_bal_file(p, path)
    p2 = load_bal(path, quiet=True)
    assert p2.num_cameras == p.num_cameras
    assert p2.num_landmarks == p.num_landmarks
    assert p2.num_observations == p.num_observations
    np.testing.assert_allclose(p2.cam_t, p.cam_t, atol=1e-12)
    np.testing.assert_allclose(p2.cam_intr, p.cam_intr, atol=1e-12)
    np.testing.assert_allclose(p2.lm_p, p.lm_p, atol=1e-12)
    np.testing.assert_allclose(p2.obs_uv, p.obs_uv, atol=1e-12)
    # quaternions up to sign
    R1 = np.asarray([nplie.quat_from_matrix(np.eye(3))])  # touch helper
    q1, q2 = p.cam_q, p2.cam_q
    sign = np.sign(np.sum(q1 * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q1, sign * q2, atol=1e-9)


def test_save_bal_roundtrip(tmp_path):
    """save_bal inverts load_bal's axis-flip exactly: the exported text
    re-loads to the same state (reference-readable interop export)."""
    p = generate_synthetic_bal(num_cams=7, num_lms=40, seed=5)
    path = str(tmp_path / "problem-out.txt")
    p.save_bal(path)
    p2 = load_bal(path, quiet=True)
    assert p2.num_observations == p.num_observations
    np.testing.assert_allclose(p2.cam_t, p.cam_t, atol=1e-12)
    np.testing.assert_allclose(p2.cam_intr, p.cam_intr, atol=1e-12)
    np.testing.assert_allclose(p2.lm_p, p.lm_p, atol=1e-12)
    np.testing.assert_allclose(p2.obs_uv, p.obs_uv, atol=1e-12)
    sign = np.sign(np.sum(p.cam_q * p2.cam_q, axis=-1, keepdims=True))
    np.testing.assert_allclose(p.cam_q, sign * p2.cam_q, atol=1e-9)


def test_npz_roundtrip(tmp_path):
    p = generate_synthetic_bal(num_cams=6, num_lms=30, seed=2)
    path = str(tmp_path / "problem.npz")
    p.save_npz(path)
    p2 = BalProblem.load_npz(path)
    np.testing.assert_array_equal(p2.obs_lm, p.obs_lm)
    np.testing.assert_allclose(p2.lm_p, p.lm_p)


def test_normalize_semantics():
    p = generate_synthetic_bal(num_cams=8, num_lms=101, seed=3)
    centers_before = nplie.quat_rotate(nplie.quat_conj(p.cam_q), -p.cam_t)
    lm_before = p.lm_p.copy()
    p.normalize(100.0)
    # median (upper median = element at index n//2) of new positions ~ 0
    k = p.num_landmarks // 2
    med = np.partition(p.lm_p, k, axis=0)[k]
    np.testing.assert_allclose(med, 0.0, atol=1e-9)
    # MAD == 100
    dev = np.sum(np.abs(p.lm_p - med), axis=1)
    mad = np.partition(dev, k)[k]
    np.testing.assert_allclose(mad, 100.0, rtol=1e-12)
    # rigid+scale transform consistency for cameras: relative geometry kept
    centers_after = nplie.quat_rotate(nplie.quat_conj(p.cam_q), -p.cam_t)
    d_before = np.linalg.norm(centers_before[0] - lm_before[5])
    d_after = np.linalg.norm(centers_after[0] - p.lm_p[5])
    med0 = np.partition(lm_before, k, axis=0)[k]
    dev0 = np.sum(np.abs(lm_before - med0), axis=1)
    scale = 100.0 / np.partition(dev0, k)[k]
    np.testing.assert_allclose(d_after, scale * d_before, rtol=1e-9)


def test_perturb_changes_state_deterministically():
    p1 = generate_synthetic_bal(num_cams=6, num_lms=40, seed=4)
    p2 = p1.copy()
    p1.perturb(0.0, 0.01, 0.01, 38401)
    p2.perturb(0.0, 0.01, 0.01, 38401)
    np.testing.assert_array_equal(p1.cam_t, p2.cam_t)
    np.testing.assert_array_equal(p1.lm_p, p2.lm_p)
    p3 = generate_synthetic_bal(num_cams=6, num_lms=40, seed=4)
    assert not np.allclose(p1.cam_t, p3.cam_t)
    # rotation untouched with rotation_sigma=0
    np.testing.assert_array_equal(p1.cam_q, p3.cam_q)


def test_filter_obs():
    p = generate_synthetic_bal(num_cams=8, num_lms=60, seed=5)
    # huge threshold filters everything
    p2 = p.copy()
    p2.filter_obs(1e9)
    assert p2.num_landmarks == 0
    assert p2.num_observations == 0
    # moderate threshold keeps consistent counts
    p3 = p.copy()
    p3.filter_obs(0.1)
    counts = p3.obs_per_landmark()
    assert counts.size == 0 or counts.min() >= 2
    assert p3.obs_lm.max(initial=-1) < p3.num_landmarks


def test_pipeline(tmp_path, synthetic_problem):
    path = str(tmp_path / "problem-12-200-pre.txt")
    write_bal_file(synthetic_problem, path)
    opts = BalDatasetOptions(input=path, quiet=True,
                             translation_sigma=0.01, point_sigma=0.01,
                             init_depth_threshold=0.1)
    p = load_normalized_bal_problem(opts)
    assert p.num_cameras == synthetic_problem.num_cameras
    assert p.num_landmarks > 0


def test_bucketize_roundtrip(synthetic_problem):
    bp = bucketize(synthetic_problem, pow2_from=5)
    assert sum(b.num_real for b in bp.buckets) == bp.num_landmarks
    assert sum(int(b.mask.sum()) for b in bp.buckets) == bp.num_observations
    for b in bp.buckets:
        # within each landmark row, obs counts match and padded slots masked
        real_counts = b.mask.sum(axis=1)
        assert real_counts[b.lm_mask].min() >= 2
        assert (real_counts[~b.lm_mask] == 0).all()
        assert (b.cam_idx[~b.mask] == 0).all()
    # scatter back reproduces original landmark positions
    out = scatter_landmarks(bp, bp.lm_p0)
    np.testing.assert_allclose(out, synthetic_problem.lm_p)
    # exact buckets below pow2_from, pow2 above
    for b in bp.buckets:
        if b.n_obs >= 5:
            assert (b.n_obs & (b.n_obs - 1)) == 0
