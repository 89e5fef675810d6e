"""Synthetic BAL-style problem generator.

The reference ships a shrunk real BAL problem as its test fixture
(data/rootba git submodule; test/smoke_tests use ladybug-49). The data
submodule is not vendored here, so tests and benchmarks use generated
problems with the same statistical shape: cameras on a noisy ring
looking inward at a clustered point cloud, Snavely intrinsics with mild
negative radial distortion, observations = exact projections plus pixel
noise. Written in the original BAL text convention (negative-z forward,
y-up) so the loader's axis-flip path is exercised.
"""

from __future__ import annotations

import numpy as np

from rootba_tpu.bal import nplie
from rootba_tpu.bal.problem import BalProblem


def generate_synthetic_bal(
    num_cams: int = 24,
    num_lms: int = 600,
    mean_obs_per_lm: float = 5.0,
    pixel_noise: float = 1.0,
    seed: int = 7,
    radius: float = 10.0,
    focal: float = 800.0,
) -> BalProblem:
    """Returns a BalProblem in the *internal* convention (positive-z
    forward, y-down), as if loaded through load_bal."""
    rng = np.random.default_rng(seed)

    # cameras on a noisy ring in the xy plane, looking at the origin
    angles = np.linspace(0, 2 * np.pi, num_cams, endpoint=False)
    centers = np.stack(
        [radius * np.cos(angles), radius * np.sin(angles),
         rng.normal(0, 0.5, num_cams)], axis=1)
    centers += rng.normal(0, 0.3, centers.shape)

    # world-to-cam rotation: camera z-axis points from center to origin
    fwd = -centers
    fwd /= np.linalg.norm(fwd, axis=1, keepdims=True)
    up = np.tile(np.array([0.0, 0.0, 1.0]), (num_cams, 1))
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right, axis=1, keepdims=True)
    down = np.cross(fwd, right)
    # rows of R are the camera axes expressed in world coords
    R = np.stack([right, down, fwd], axis=1)
    cam_q = nplie.quat_from_matrix(R)
    cam_t = -np.einsum("nij,nj->ni", R, centers)
    cam_intr = np.stack(
        [focal * rng.uniform(0.9, 1.1, num_cams),
         rng.uniform(-1e-7, -1e-8, num_cams),
         rng.uniform(1e-14, 1e-13, num_cams)], axis=1)

    # clustered point cloud around the origin
    lm_p = rng.normal(0, 2.0, (num_lms, 3))

    # observations (vectorized so venice/final-scale problems generate
    # in seconds): landmark m is seen by k_m consecutive cameras
    # starting at a random ring position
    k = np.maximum(
        2, np.minimum(num_cams,
                      rng.poisson(max(mean_obs_per_lm - 2, 0.01),
                                  num_lms) + 2))
    start = rng.integers(0, num_cams, num_lms)
    obs_lm = np.repeat(np.arange(num_lms, dtype=np.int64), k)
    # per-obs offset within its landmark's window
    cum = np.concatenate([[0], np.cumsum(k)])
    obs_off = np.arange(obs_lm.size, dtype=np.int64) - cum[obs_lm]
    obs_cam = (start[obs_lm] + obs_off) % num_cams

    p_c = (nplie.quat_rotate(cam_q[obs_cam], lm_p[obs_lm])
           + cam_t[obs_cam])
    keep = p_c[:, 2] >= 0.5
    obs_lm, obs_cam, p_c = obs_lm[keep], obs_cam[keep], p_c[keep]
    d = p_c[:, :2] / p_c[:, 2:3]
    r2 = np.sum(d * d, axis=1)
    f = cam_intr[obs_cam, 0]
    k1 = cam_intr[obs_cam, 1]
    k2 = cam_intr[obs_cam, 2]
    obs_uv = ((f * (1 + k1 * r2 + k2 * r2 * r2))[:, None] * d
              + rng.normal(0, pixel_noise, (obs_lm.size, 2)))

    problem = BalProblem(
        cam_q, cam_t, cam_intr, lm_p,
        obs_lm, obs_cam.astype(np.int64), obs_uv, quiet=True)
    # drop landmarks that ended with < 2 valid obs
    problem.filter_obs(1e-9)
    problem.sort_observations()
    return problem


def write_bal_file(problem: BalProblem, path: str):
    """Write in original BAL text convention (inverse of load_bal's
    axis flip), so that load_bal(write_bal_file(p)) == p."""
    flip = np.diag([1.0, -1.0, -1.0])
    with open(path, "w") as fp:
        fp.write(f"{problem.num_cameras} {problem.num_landmarks} "
                 f"{problem.num_observations}\n")
        # vectorized obs block (BAL files can have tens of millions)
        obs = np.empty((problem.num_observations, 4), dtype=object)
        obs[:, 0] = problem.obs_cam
        obs[:, 1] = problem.obs_lm
        obs[:, 2] = [f"{v:.17g}" for v in problem.obs_uv[:, 0]]
        obs[:, 3] = [f"{v:.17g}" for v in -problem.obs_uv[:, 1]]
        fp.write("\n".join(" ".join(map(str, row)) for row in obs))
        fp.write("\n")
        cam_vals = []
        for c in range(problem.num_cameras):
            # internal R = flip @ exp(rodrigues)  =>  exp(r) = flip @ R
            Rmat = _quat_to_matrix(problem.cam_q[c])
            R_raw = flip @ Rmat
            rod = _matrix_to_rodrigues(R_raw)
            t_raw = flip @ problem.cam_t[c]
            cam_vals.extend(list(rod) + list(t_raw)
                            + list(problem.cam_intr[c]))
        fp.write("\n".join(f"{v:.17g}" for v in cam_vals) + "\n")
        fp.write("\n".join(
            f"{v:.17g}" for v in problem.lm_p.reshape(-1)) + "\n")


def _quat_to_matrix(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _matrix_to_rodrigues(R):
    q = nplie.quat_from_matrix(R)
    w = np.clip(q[0], -1.0, 1.0)
    v = q[1:]
    n = np.linalg.norm(v)
    if n < 1e-12:
        return np.zeros(3)
    angle = 2.0 * np.arctan2(n, w)
    if angle > np.pi:
        angle -= 2 * np.pi
    return angle * v / n
