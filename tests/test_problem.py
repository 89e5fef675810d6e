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


# ---------------------------------------------------------------------------
# golden-file loader tests (reference quirks, bal_problem.cpp:190-404;
# VERDICT r3 'loader hardening': first contact with real data must not
# be in production)
# ---------------------------------------------------------------------------

def _golden_bal_text():
    # 2 cams, 2 lms, 3 obs; cam0 = identity rotation at origin,
    # cam1 = 90deg about z with translation (1,2,3)
    import math
    half = math.pi / 2
    return "\n".join([
        "2 2 3",
        "0 0  10.0  20.0",
        "1 0 -10.0   5.0",
        "1 1   0.5  -0.5",
        # cam 0: rodrigues(0,0,0), t(0,0,0), f=500, k1=1e-2, k2=1e-4
        "0.0", "0.0", "0.0", "0.0", "0.0", "0.0",
        "500.0", "0.01", "0.0001",
        # cam 1: rodrigues(0,0,pi/2), t(1,2,3), f=600, k1=0, k2=0
        "0.0", "0.0", f"{half!r}", "1.0", "2.0", "3.0",
        "600.0", "0.0", "0.0",
        # landmarks
        "1.0", "2.0", "3.0",
        "-1.0", "0.5", "4.0",
    ]) + "\n"


def test_load_bal_golden_axis_flip(tmp_path):
    """The loader must reproduce the reference's exact conventions:
    obs y negated; R = diag(1,-1,-1) @ exp(rodrigues);
    t = diag(1,-1,-1) @ t_raw (bal_problem.cpp:243-262)."""
    import math

    path = tmp_path / "golden.txt"
    path.write_text(_golden_bal_text())
    p = load_bal(str(path), quiet=True)
    assert p.num_cameras == 2 and p.num_landmarks == 2
    assert p.num_observations == 3
    # obs y is negated, x untouched
    k = [(c, l) for c, l in zip(p.obs_cam, p.obs_lm)].index((0, 0))
    np.testing.assert_allclose(p.obs_uv[k], [10.0, -20.0])
    # cam 0: flip only -> R = diag(1,-1,-1): quaternion 180deg about x
    R0 = _quat_mat(p.cam_q[0])
    np.testing.assert_allclose(R0, np.diag([1.0, -1.0, -1.0]), atol=1e-12)
    np.testing.assert_allclose(p.cam_t[0], 0.0, atol=1e-15)
    # cam 1: R = diag(1,-1,-1) @ Rz(pi/2), t = diag(1,-1,-1) @ (1,2,3)
    Rz = np.array([[math.cos(math.pi / 2), -math.sin(math.pi / 2), 0],
                   [math.sin(math.pi / 2), math.cos(math.pi / 2), 0],
                   [0, 0, 1.0]])
    np.testing.assert_allclose(_quat_mat(p.cam_q[1]),
                               np.diag([1.0, -1.0, -1.0]) @ Rz,
                               atol=1e-12)
    np.testing.assert_allclose(p.cam_t[1], [1.0, -2.0, -3.0])
    np.testing.assert_allclose(p.cam_intr[0], [500.0, 0.01, 0.0001])
    np.testing.assert_allclose(p.lm_p[1], [-1.0, 0.5, 4.0])


def _quat_mat(q):
    from rootba_tpu.bal import nplie

    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_load_bal_rejects_duplicates_and_bad_indices(tmp_path):
    """Reference CHECK semantics (bal_problem.cpp:225-231)."""
    bad_dup = "1 1 2\n0 0 1.0 2.0\n0 0 3.0 4.0\n" + "0.0\n" * 9 + \
        "1.0\n1.0\n1.0\n"
    path = tmp_path / "dup.txt"
    path.write_text(bad_dup)
    with pytest.raises(ValueError):
        load_bal(str(path), quiet=True)
    bad_idx = "1 1 1\n0 5 1.0 2.0\n" + "0.0\n" * 9 + "1.0\n1.0\n1.0\n"
    path2 = tmp_path / "idx.txt"
    path2.write_text(bad_idx)
    with pytest.raises(ValueError):
        load_bal(str(path2), quiet=True)


def test_load_bundler_skips_uninitialized_cameras(tmp_path):
    """Bundler cameras with f == 0 are skipped with index remapping and
    their observations dropped (bal_problem.cpp:321-339,372-375)."""
    from rootba_tpu.bal.problem import load_bundler

    txt = "\n".join([
        "# Bundle file v0.3",
        "3 2",
        # cam 0: valid, f=100, identity R, t=0
        "100.0 0.0 0.0",
        "1 0 0  0 1 0  0 0 1",
        "0 0 0",
        # cam 1: f == 0 -> skipped
        "0.0 0.0 0.0",
        "1 0 0  0 1 0  0 0 1",
        "0 0 0",
        # cam 2: valid
        "200.0 0.0 0.0",
        "1 0 0  0 1 0  0 0 1",
        "1 2 3",
        # lm 0 at (1,1,1), color, 3 views (one of skipped cam 1)
        "1 1 1", "255 0 0",
        "3  0 7 2.0 3.0   1 8 9.0 9.0   2 9 4.0 5.0",
        # lm 1 at (2,2,2), color, 1 view
        "2 2 2", "0 255 0",
        "1  2 4 6.0 7.0",
    ]) + "\n"
    path = tmp_path / "bundle.out"
    path.write_text(txt)
    p = load_bundler(str(path), quiet=True)
    assert p.num_cameras == 2  # cam 1 skipped
    assert p.num_observations == 3  # its view dropped
    np.testing.assert_allclose(p.cam_intr[:, 0], [100.0, 200.0])
    # remapped index: former cam 2 is now 1
    assert set(zip(p.obs_cam.tolist(), p.obs_lm.tolist())) == \
        {(0, 0), (1, 0), (1, 1)}
    # axis flip applied: t of former cam 2 = diag(1,-1,-1) @ (1,2,3)
    np.testing.assert_allclose(p.cam_t[1], [1.0, -2.0, -3.0])
    # obs y negated
    k = [(c, l) for c, l in zip(p.obs_cam, p.obs_lm)].index((0, 0))
    np.testing.assert_allclose(p.obs_uv[k], [2.0, -3.0])


def test_load_bundler_rejects_duplicate_views(tmp_path):
    from rootba_tpu.bal.problem import load_bundler

    txt = "\n".join([
        "# Bundle file v0.3",
        "1 1",
        "100.0 0.0 0.0", "1 0 0  0 1 0  0 0 1", "0 0 0",
        "1 1 1", "255 0 0",
        "2  0 7 2.0 3.0   0 8 4.0 5.0",
    ]) + "\n"
    path = tmp_path / "bundle_dup.out"
    path.write_text(txt)
    with pytest.raises(ValueError):
        load_bundler(str(path), quiet=True)


def test_cereal_roundtrip(tmp_path):
    """save_rootba/load_rootba round-trip exactly (reference .cereal
    binary layout, bal_problem_io.hpp:52-83)."""
    from rootba_tpu.bal.rootba_io import load_rootba, save_rootba

    p = generate_synthetic_bal(num_cams=9, num_lms=60, seed=11)
    path = str(tmp_path / "prob.cereal")
    save_rootba(p, path)
    q = load_rootba(path)
    np.testing.assert_allclose(q.cam_t, p.cam_t, rtol=0, atol=0)
    np.testing.assert_allclose(q.cam_intr, p.cam_intr, rtol=0, atol=0)
    # unit quaternions may round-trip with either sign convention but
    # the bytes are written verbatim, so exact equality holds
    np.testing.assert_allclose(q.cam_q, p.cam_q, rtol=0, atol=0)
    np.testing.assert_allclose(q.lm_p, p.lm_p, rtol=0, atol=0)
    np.testing.assert_array_equal(q.obs_lm, p.obs_lm)
    np.testing.assert_array_equal(q.obs_cam, p.obs_cam)
    np.testing.assert_allclose(q.obs_uv, p.obs_uv, rtol=0, atol=0)


def test_cereal_golden_bytes(tmp_path):
    """Pin the exact byte layout: cereal binary framing (u64 sizes, no
    padding, little-endian f64), FileInfo header, translation-first
    SE3, i32 map keys (see rootba_io.py module docstring)."""
    import struct

    from rootba_tpu.bal.problem import BalProblem
    from rootba_tpu.bal.rootba_io import save_rootba

    p = BalProblem(
        cam_q=np.array([[1.0, 0.0, 0.0, 0.0]]),
        cam_t=np.array([[1.5, -2.0, 3.25]]),
        cam_intr=np.array([[500.0, 1e-3, -2e-5]]),
        lm_p=np.array([[0.5, 0.25, -1.0], [4.0, 5.0, 6.0]]),
        obs_lm=np.array([0, 0, 1]),
        obs_cam=np.array([0, 0, 0]),
        obs_uv=np.array([[1.0, 2.0], [1.0, 2.0], [-3.0, 4.0]]),
        quiet=True,
    )
    # two obs of lm 0 by the same camera is invalid for a std::map;
    # make them distinct cameras -- but keep 1 camera in the file:
    # use a single obs per lm instead
    p.obs_lm = np.array([0, 1])
    p.obs_cam = np.array([0, 0])
    p.obs_uv = np.array([[1.0, 2.0], [-3.0, 4.0]])
    path = str(tmp_path / "g.cereal")
    save_rootba(p, path)
    raw = open(path, "rb").read()

    exp = b""
    exp += struct.pack("<Q", 18) + b"rootba::BalProblem"
    exp += struct.pack("<Q", 3) + b"1.0"
    exp += struct.pack("<Q", 1)  # num cameras
    exp += struct.pack("<3d", 1.5, -2.0, 3.25)            # t
    exp += struct.pack("<4d", 0.0, 0.0, 0.0, 1.0)         # q xyzw
    exp += struct.pack("<3d", 500.0, 1e-3, -2e-5)         # intrinsics
    exp += struct.pack("<Q", 2)  # num landmarks
    exp += struct.pack("<3d", 0.5, 0.25, -1.0)
    exp += struct.pack("<Q", 1) + struct.pack("<i", 0)
    exp += struct.pack("<2d", 1.0, 2.0)
    exp += struct.pack("<3d", 4.0, 5.0, 6.0)
    exp += struct.pack("<Q", 1) + struct.pack("<i", 0)
    exp += struct.pack("<2d", -3.0, 4.0)
    assert raw == exp


def test_cereal_loader_dispatch(tmp_path):
    """.cereal autodetects as ROOTBA and loads through the cereal
    reader in the preprocessing pipeline (bal_problem.cpp:786-800)."""
    from rootba_tpu.bal.problem import (
        DatasetType,
        autodetect_input_type,
        load_normalized_bal_problem_quiet,
    )
    from rootba_tpu.bal.rootba_io import save_rootba

    p = generate_synthetic_bal(num_cams=6, num_lms=40, seed=7)
    path = str(tmp_path / "prob.cereal")
    save_rootba(p, path)
    assert autodetect_input_type(path) == DatasetType.ROOTBA
    q = load_normalized_bal_problem_quiet(path)
    assert q.num_cameras == p.num_cameras
    assert q.num_observations == p.num_observations


def test_cereal_rejects_wrong_type(tmp_path):
    import struct

    from rootba_tpu.bal.rootba_io import load_rootba

    path = str(tmp_path / "bad.cereal")
    with open(path, "wb") as fp:
        fp.write(struct.pack("<Q", 5) + b"nope!")
        fp.write(struct.pack("<Q", 3) + b"9.9")
    with pytest.raises(ValueError, match="not a rootba problem file"):
        load_rootba(path)
