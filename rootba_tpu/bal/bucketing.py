"""Obs-count bucketing: BalProblem -> padded device tensors.

TPU-first re-design of the reference's landmark blocks: instead of one
heap-allocated row-major storage matrix per landmark
(qr/landmark_block_dynamic.hpp:43-102) with compile-time-specialized
sizes for nobs in [2,8] (landmark_block.cpp:48-83), landmarks are
grouped by observation count into a small set of buckets; each bucket is
a struct-of-arrays batch with a static per-landmark obs count (padded
slots masked). All solver kernels vmap/batch over the bucket's landmark
axis, which is also the axis sharded across the device mesh.

Exact buckets for nobs < bucket_pow2_from (default 9, mirroring the
reference's static specializations), power-of-two padded buckets above.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np

from rootba_tpu.bal.problem import BalProblem


class Bucket(NamedTuple):
    """Static per-bucket data (index part; landmark positions live in
    the solver state so they can be updated functionally)."""

    n_obs: int  # padded obs slots per landmark (static)
    num_real: int  # number of real landmarks (before row padding)
    obs_uv: np.ndarray  # [L, n, 2]
    cam_idx: np.ndarray  # [L, n] int32 (padded slots point at camera 0)
    mask: np.ndarray  # [L, n] bool, False = padded obs slot
    lm_mask: np.ndarray  # [L] bool, False = padded landmark row
    lm_id: np.ndarray  # [L] int32, original landmark index (-1 padded)


class BucketedProblem(NamedTuple):
    num_cameras: int
    num_landmarks: int  # real landmarks across all buckets
    num_observations: int  # real observations
    buckets: Tuple[Bucket, ...]
    lm_p0: Tuple[np.ndarray, ...]  # initial [L,3] per bucket (f64)
    cam_q0: np.ndarray  # [N,4] f64
    cam_t0: np.ndarray
    cam_intr0: np.ndarray


def _bucket_size_for(count: int, pow2_from: int) -> int:
    if count < pow2_from:
        return count
    n = 1
    while n < count:
        n *= 2
    return n


def bucketize(
    problem: BalProblem,
    pow2_from: int = 9,
    row_align: int = 8,
) -> BucketedProblem:
    """Group landmarks into obs-count buckets with padded SoA tensors.

    row_align pads each bucket's landmark count to a multiple (keeps
    sharding/retiling friendly; padded landmark rows are fully masked).
    """
    counts = problem.obs_per_landmark()
    if counts.min(initial=2) < 2:
        raise ValueError("landmarks must have >= 2 observations; "
                         "run filter_obs first")
    sizes = np.array([_bucket_size_for(int(c), pow2_from) for c in counts])

    # merge undersized buckets into the next larger one: a bucket with a
    # handful of landmarks costs a full extra compiled program section
    # for negligible work (the reference's analog is the single dynamic
    # landmark block class for all nobs > 8, landmark_block.cpp:48-83)
    min_rows = min(256, max(1, counts.size // 16))
    uniq = np.sort(np.unique(sizes))
    for i, n in enumerate(uniq[:-1]):
        if np.sum(sizes == n) < min_rows:
            nxt = uniq[uniq > n][0]
            sizes[sizes == n] = nxt
    # undersized largest bucket: nothing above to merge into; keep it
    obs_start = np.concatenate([[0], np.cumsum(counts)])

    buckets: List[Bucket] = []
    lm_p0: List[np.ndarray] = []
    for n in sorted(set(sizes.tolist())):
        lm_ids = np.nonzero(sizes == n)[0]
        num_real = lm_ids.size
        L = -(-num_real // row_align) * row_align
        obs_uv = np.zeros((L, n, 2), dtype=np.float64)
        cam_idx = np.zeros((L, n), dtype=np.int32)
        mask = np.zeros((L, n), dtype=bool)
        lm_mask = np.zeros((L,), dtype=bool)
        lm_id = np.full((L,), -1, dtype=np.int32)
        p0 = np.zeros((L, 3), dtype=np.float64)

        lm_mask[:num_real] = True
        lm_id[:num_real] = lm_ids
        p0[:num_real] = problem.lm_p[lm_ids]
        # vectorized ragged gather: for each selected landmark, its obs
        # span [obs_start[m], obs_start[m]+counts[m]) in the (lm, cam)-
        # sorted flat obs arrays
        c_sel = counts[lm_ids].astype(np.int64)
        total = int(c_sel.sum())
        rows = np.repeat(np.arange(num_real, dtype=np.int64), c_sel)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.cumsum(c_sel) - c_sel, c_sel))
        src = np.repeat(obs_start[lm_ids], c_sel) + within
        obs_uv[rows, within] = problem.obs_uv[src]
        cam_idx[rows, within] = problem.obs_cam[src]
        mask[rows, within] = True
        buckets.append(Bucket(n_obs=int(n), num_real=int(num_real),
                              obs_uv=obs_uv, cam_idx=cam_idx, mask=mask,
                              lm_mask=lm_mask, lm_id=lm_id))
        lm_p0.append(p0)

    return BucketedProblem(
        num_cameras=problem.num_cameras,
        num_landmarks=problem.num_landmarks,
        num_observations=problem.num_observations,
        buckets=tuple(buckets),
        lm_p0=tuple(lm_p0),
        cam_q0=problem.cam_q.copy(),
        cam_t0=problem.cam_t.copy(),
        cam_intr0=problem.cam_intr.copy(),
    )


def scatter_landmarks(
    bp: BucketedProblem, lm_p_buckets
) -> np.ndarray:
    """Gather per-bucket landmark positions back into problem order."""
    out = np.zeros((bp.num_landmarks, 3), dtype=np.float64)
    for bucket, p in zip(bp.buckets, lm_p_buckets):
        ids = bucket.lm_id[bucket.lm_mask]
        out[ids] = np.asarray(p, dtype=np.float64)[bucket.lm_mask]
    return out
