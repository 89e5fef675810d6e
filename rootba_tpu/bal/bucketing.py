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

import os
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


class CamCsr(NamedTuple):
    """Camera-major view of the flat obs axis (concatenation of every
    bucket's [L*n] slots, in bucket order).

    TPU scatter-adds (segment_sum) cost ~10-20x their memory-bound
    traffic, so per-camera accumulations (the reference's mutex
    scatters, linearization_qr.hpp:406-429) are instead expressed as a
    static gather + clean reduction: each camera's observation slots are
    listed in fixed-width "virtual rows" of `width` slots (a camera with
    many obs gets several rows; rows are sorted by camera; padding
    points at the dump slot = total_slots). A per-camera reduction is
    then sum(gather(contrib)[R, width], axis=1) -- no scatter anywhere.
    The second level maps each camera to its virtual rows with the same
    fixed-width trick (pad entries point at the dump row R), so
    per-camera sums stay camera-local -- no cumsum-over-cameras
    cancellation.
    """

    idx: np.ndarray  # [R, width] int32 flat-slot positions (pad=dump)
    idx2: np.ndarray  # [N, vmax] int32 virtual-row ids (pad=R)
    total_slots: int  # dump index == sum of L*n over buckets
    row_cam: np.ndarray  # [R] int32 camera of each virtual row (0 if empty)
    lm2cs: np.ndarray  # [total_slots] int32 CSR-slot of each flat obs
    #                    slot (= R*width for masked/padded slots)
    cs_lm: np.ndarray  # [R*width] int32 global landmark row (over the
    #                    concatenated per-bucket L axes) of each CSR slot
    #                    (= total landmark rows for padded slots)


class BucketedProblem(NamedTuple):
    num_cameras: int
    num_landmarks: int  # real landmarks across all buckets
    num_observations: int  # real observations
    buckets: Tuple[Bucket, ...]
    lm_p0: Tuple[np.ndarray, ...]  # initial [L,3] per bucket (f64)
    cam_q0: np.ndarray  # [N,4] f64
    cam_t0: np.ndarray
    cam_intr0: np.ndarray
    cam_csr: CamCsr


def _bucket_size_for(count: int, pow2_from: int) -> int:
    if count < pow2_from:
        return count
    n = 1
    while n < count:
        n *= 2
    return n


def _bucket_sizes_vec(counts: np.ndarray, pow2_from: int) -> np.ndarray:
    """Vectorized _bucket_size_for (a per-landmark Python loop costs
    ~1 min alone at final-13682's 4.4M landmarks)."""
    c = np.maximum(counts.astype(np.int64), 1)
    pow2 = np.int64(1) << np.ceil(np.log2(c)).astype(np.int64)
    return np.where(c < pow2_from, c, pow2)


def bucketize(
    problem: BalProblem,
    pow2_from: int = 9,
    row_align: int = 8,
    max_bucket_obs: int = 4_000_000,
    max_bucket_rows: int = 0,
) -> BucketedProblem:
    """Group landmarks into obs-count buckets with padded SoA tensors.

    row_align pads each bucket's landmark count to a multiple (keeps
    sharding/retiling friendly; padded landmark rows are fully masked).

    max_bucket_obs splits an obs-count class into several buckets of at
    most that many obs slots each (0 disables). Per-bucket fusion
    outputs with narrow minor dims lane-pad to 128 on TPU, so a bucket
    must be small enough that a [L*n, 9] row-major transient fits
    comfortably: 4M slots = 2.1 GB padded (final-13682's n=8 class
    alone holds 18.7M obs = a 9.6 GB transient unsplit).

    max_bucket_rows optionally caps the LANDMARK-row count per bucket
    (0 = off, the default). Tried in r4 on the theory that >=1M-row
    tables put the pair-pass gathers in the slow regime
    (micro_gather_big.py): measured at final-13682 it made the solve
    13% SLOWER (steady 17.1 -> 19.2 s/it) -- the per-group chunk-loop
    fixed overhead from the multiplied group count exceeds any gather
    saving. Kept as an experiment knob."""
    counts = problem.obs_per_landmark()
    if counts.min(initial=2) < 2:
        raise ValueError("landmarks must have >= 2 observations; "
                         "run filter_obs first")
    sizes = _bucket_sizes_vec(counts, pow2_from)

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

    # camera-locality ordering inside each bucket: landmarks sorted by
    # their minimum camera id, so a contiguous landmark range covers
    # few cameras -> few distinct camera pairs per PairStream
    # sub-stream (dense width-runs) and local scatter/gather patterns
    # everywhere else. Pure reordering; the math is permutation-
    # invariant (f32 sums reassociate within test tolerances).
    min_cam = np.minimum.reduceat(
        problem.obs_cam, obs_start[:-1]) if counts.size else \
        np.zeros(0, np.int64)

    buckets: List[Bucket] = []
    lm_p0: List[np.ndarray] = []
    groups: List[Tuple[int, np.ndarray]] = []
    for n in sorted(set(sizes.tolist())):
        ids = np.nonzero(sizes == n)[0]
        ids = ids[np.argsort(min_cam[ids], kind="stable")]
        per = ids.size
        if max_bucket_obs and ids.size * n > max_bucket_obs:
            per = max_bucket_obs // int(n)
        if max_bucket_rows:
            per = min(per, max_bucket_rows)
        per = max(per, row_align)
        if per < ids.size:
            for s in range(0, ids.size, per):
                groups.append((n, ids[s:s + per]))
        else:
            groups.append((n, ids))
    for n, lm_ids in groups:
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
        # lazy: the strips+BSR configurations never touch the CamCsr
        # fallback, and its build alone is ~21 s of host time at
        # final-13682 (r4 setup profile)
        cam_csr=_LazyCamCsr(tuple(buckets), problem.num_cameras),
    )


class _LazyCamCsr:
    """Build-on-first-access CamCsr (duck-typed: .idx/.idx2).

    Only FlatSqrtLinearizer's strips+BSR configuration avoids the
    build entirely; the SC/PowerSC linearizers touch cam_csr while
    constructing their consts, so for them lazy = deferred, not saved.
    The lock keeps concurrent first accesses (e.g. benchmark threads)
    from building the ~21 s table twice."""

    def __init__(self, buckets, num_cameras: int):
        import threading

        self._buckets = buckets
        self._n = num_cameras
        self._v: CamCsr | None = None
        self._lock = threading.Lock()

    def _get(self) -> CamCsr:
        if self._v is None:
            with self._lock:
                if self._v is None:
                    self._v = build_cam_csr(self._buckets, self._n)
        return self._v

    @property
    def idx(self):
        return self._get().idx

    @property
    def idx2(self):
        return self._get().idx2


def build_cam_csr(buckets, num_cameras: int, width: int = 64) -> CamCsr:
    """Build the camera-major virtual-row index of all real obs slots."""
    cam_flat = []
    mask_flat = []
    for b in buckets:
        cam_flat.append(b.cam_idx.reshape(-1))
        mask_flat.append(b.mask.reshape(-1))
    cam_flat = np.concatenate(cam_flat)
    mask_flat = np.concatenate(mask_flat)
    total_slots = cam_flat.size

    pos = np.nonzero(mask_flat)[0].astype(np.int64)
    cams = cam_flat[pos]
    order = np.argsort(cams, kind="stable")
    pos = pos[order]
    counts = np.bincount(cams, minlength=num_cameras).astype(np.int64)

    rows_per_cam = -(-counts // width)  # ceil; 0 for unseen cameras
    R = max(int(rows_per_cam.sum()), 1)
    idx = np.full((R, width), total_slots, dtype=np.int64)
    row_starts = np.zeros(num_cameras + 1, dtype=np.int64)
    row_starts[1:] = np.cumsum(rows_per_cam)

    # flat destination position of each sorted obs inside the padded
    # [R, width] grid: camera c's obs k goes to row row_starts[c] + k
    # // width, col k % width
    within = (np.arange(pos.size, dtype=np.int64)
              - np.repeat(np.cumsum(counts) - counts, counts))
    row = np.repeat(row_starts[:-1], counts) + within // width
    col = within % width
    idx[row, col] = pos

    vmax = max(int(rows_per_cam.max(initial=1)), 1)
    idx2 = np.full((num_cameras, vmax), R, dtype=np.int64)
    nrows = rows_per_cam
    rr = np.repeat(np.arange(num_cameras, dtype=np.int64), nrows)
    cc = (np.arange(rr.size, dtype=np.int64)
          - np.repeat(np.cumsum(nrows) - nrows, nrows))
    idx2[rr, cc] = np.arange(rr.size, dtype=np.int64)

    # inverse permutation: flat obs slot -> CSR slot (masked slots ->
    # sentinel R*width), plus per-CSR-slot camera row and global
    # landmark row for the camera-major solver layout
    row_cam = np.zeros((R,), dtype=np.int64)
    row_cam[:rr.size] = rr  # rows are laid out camera-major
    lm2cs = np.full((total_slots,), R * width, dtype=np.int64)
    lm2cs[idx[row, col]] = row * width + col

    # global landmark row of each flat obs slot: buckets concatenate as
    # [L_b * n_b] with lm row = bucket_base + slot // n_b
    lm_of_flat = np.empty((total_slots,), dtype=np.int64)
    off = 0
    lbase = 0
    for b in buckets:
        L, n = b.cam_idx.shape
        lm_of_flat[off:off + L * n] = (
            lbase + np.repeat(np.arange(L, dtype=np.int64), n))
        off += L * n
        lbase += L
    cs_lm = np.full((R * width,), lbase, dtype=np.int64)
    cs_lm[lm2cs[lm2cs < R * width]] = lm_of_flat[lm2cs < R * width]

    return CamCsr(idx=idx.astype(np.int32), idx2=idx2.astype(np.int32),
                  total_slots=int(total_slots),
                  row_cam=row_cam.astype(np.int32),
                  lm2cs=lm2cs.astype(np.int32),
                  cs_lm=cs_lm.astype(np.int32))


class PairCsr(NamedTuple):
    """Camera-pair-major index of all strict observation pairs (i < j
    within one landmark), canonicalized so the first element's camera
    <= the second's.

    Used to assemble the explicit reduced camera system H_pp as two
    static row gathers + a clean reduction instead of a segment-sum
    scatter (TPU scatter-adds cost ~10x the equivalent sorted gather,
    and materialized [L,n,n,9,9] pair tensors pay double layout-copy
    passes; measured in benchmarks/stage2_break.py /
    benchmarks/profile_solve.py). Each CSR slot stores the FLAT OBS
    indices (into the [O] obs axis) of the pair's two observations:
    the consumer gathers the per-obs strip rows (e.g. W = Q1h'Jp,
    [O, 27]) for both sides, forms the 9x9 block product elementwise,
    and reduces fixed-width runs -- level 2 sums each unique camera
    pair's runs (same two-level scheme as CamCsr). Only the upper
    camera triangle is assembled; densification mirrors the transpose.
    Diagonal (i == i) contributions are NOT in the pair stream -- they
    reduce per camera via CamCsr.

    Replaces the reference's num_cams^2 mutex array for RCS assembly
    (sc/linearization_sc.hpp:92-95, :327-348).
    """

    wi_idx: np.ndarray  # [R, width] int32 flat obs index of side 1 (pad=O)
    wj_idx: np.ndarray  # [R, width] int32 flat obs index of side 2 (pad=O)
    idx2: np.ndarray  # [P, vmax] int32 virtual-row ids (pad=R)
    pair_row: np.ndarray  # [P] int32 camera row (<= col) of each pair
    pair_col: np.ndarray  # [P] int32 camera col
    up_idx: np.ndarray  # [N*N] int32 dense block (r,c) -> pair id of
    #                     (r,c) if r <= c else P
    lo_idx: np.ndarray  # [N*N] int32 dense block (r,c) -> pair id of
    #                     (c,r) if c <= r else P (transposed mirror)
    num_obs_slots: int  # dump obs index == sum of L*n over buckets


def _csr_rows(pos: np.ndarray, seg: np.ndarray, num_segments: int,
              width: int, dump: int):
    """Shared virtual-row packing: scatter sorted positions `pos`
    (segment ids `seg`, already sorted by segment) into fixed-width
    rows grouped by segment. Returns (idx [R,width], idx2 [S,vmax],
    rows_per_segment)."""
    counts = np.bincount(seg, minlength=num_segments).astype(np.int64)
    rows_per_seg = -(-counts // width)
    R = max(int(rows_per_seg.sum()), 1)
    idx = np.full((R, width), dump, dtype=np.int64)
    row_starts = np.zeros(num_segments + 1, dtype=np.int64)
    row_starts[1:] = np.cumsum(rows_per_seg)
    within = (np.arange(pos.size, dtype=np.int64)
              - np.repeat(np.cumsum(counts) - counts, counts))
    row = np.repeat(row_starts[:-1], counts) + within // width
    col = within % width
    idx[row, col] = pos
    vmax = max(int(rows_per_seg.max(initial=1)), 1)
    idx2 = np.full((num_segments, vmax), R, dtype=np.int64)
    rr = np.repeat(np.arange(num_segments, dtype=np.int64), rows_per_seg)
    cc = (np.arange(rr.size, dtype=np.int64)
          - np.repeat(np.cumsum(rows_per_seg) - rows_per_seg,
                      rows_per_seg))
    idx2[rr, cc] = np.arange(rr.size, dtype=np.int64)
    return idx, idx2, rows_per_seg


def build_pair_csr(buckets, num_cameras: int, width: int = 64,
                   grid_n: int | None = None,
                   dense_grid: bool = True) -> PairCsr:
    """Build the canonicalized strict-pair index (see PairCsr).

    grid_n > num_cameras lays the dense block tables out on a padded
    [grid_n, grid_n] camera grid (padded blocks stay zero) -- used by
    the VMEM-resident CG kernel, which wants the camera axis padded to
    a lane multiple.

    dense_grid=False skips the [G*G] up_idx/lo_idx block maps (the
    block-sparse RCS mode never densifies; at final-13682's 13682
    cameras each map would be 750 MB)."""
    N = num_cameras
    G = grid_n if grid_n is not None else N
    wi_list, wj_list, code_list = [], [], []
    off = 0
    for b in buckets:
        L, n = b.cam_idx.shape
        iu, ju = np.triu_indices(n, k=1)
        if iu.size:
            # flat obs index of slot (l, k) is off + l*n + k
            base = off + np.arange(L, dtype=np.int64)[:, None] * n
            oi = (base + iu[None, :]).reshape(-1)
            oj = (base + ju[None, :]).reshape(-1)
            ci = b.cam_idx[:, iu].astype(np.int64).reshape(-1)
            cj = b.cam_idx[:, ju].astype(np.int64).reshape(-1)
            valid = (b.mask[:, iu] & b.mask[:, ju]).reshape(-1)
            # canonical order: first side's camera <= second side's
            swap = ci > cj
            oi2 = np.where(swap, oj, oi)
            oj2 = np.where(swap, oi, oj)
            a = np.where(swap, cj, ci)
            c = np.where(swap, ci, cj)
            wi_list.append(oi2[valid])
            wj_list.append(oj2[valid])
            code_list.append((a * N + c)[valid])
        off += L * n
    num_obs_slots = off
    if code_list:
        wi = np.concatenate(wi_list)
        wj = np.concatenate(wj_list)
        codes = np.concatenate(code_list)
    else:
        wi = wj = np.zeros(0, np.int64)
        codes = np.zeros(0, np.int64)

    unique, seg = np.unique(codes, return_inverse=True)
    P = unique.size
    order = np.argsort(seg, kind="stable")
    wi, wj, seg = wi[order], wj[order], seg[order]

    # pack (wi, wj) into the fixed-width virtual-row grid grouped by
    # unique pair; padded slots point both sides at the dump obs row O
    pos_rows, idx2, _ = _csr_rows(
        np.arange(wi.size, dtype=np.int64), seg, P, width, wi.size)
    wi_ext = np.concatenate([wi, [num_obs_slots]])
    wj_ext = np.concatenate([wj, [num_obs_slots]])
    wi_idx = wi_ext[np.minimum(pos_rows, wi.size)]
    wj_idx = wj_ext[np.minimum(pos_rows, wj.size)]

    rows = (unique // N).astype(np.int64)
    cols = (unique % N).astype(np.int64)
    if dense_grid:
        up_idx = np.full(G * G, P, dtype=np.int64)
        up_idx[rows * G + cols] = np.arange(P, dtype=np.int64)
        lo_idx = np.full(G * G, P, dtype=np.int64)
        lo_idx[cols * G + rows] = np.arange(P, dtype=np.int64)
    else:
        up_idx = lo_idx = np.zeros(0, dtype=np.int64)

    return PairCsr(
        wi_idx=wi_idx.astype(np.int32), wj_idx=wj_idx.astype(np.int32),
        idx2=idx2.astype(np.int32),
        pair_row=rows.astype(np.int32), pair_col=cols.astype(np.int32),
        up_idx=up_idx.astype(np.int32), lo_idx=lo_idx.astype(np.int32),
        num_obs_slots=int(num_obs_slots),
    )


class PairStrips(NamedTuple):
    """Landmark-strip formulation of the strict-pair index (the fast
    path of PairCsr; see its docstring for the role).

    Measured TPU gather economics (benchmarks/micro_gather_big.py):
    cost is per-index, row width is free up to ~432 B, and sources
    with <= ~256k rows gather ~5x faster than million-row tables. So
    instead of two per-observation row gathers per pair slot from the
    [O, 27] strip, slots are grouped by (bucket, within-landmark
    pattern (i, j)) and each slot gathers its landmark's ENTIRE
    [n*27]-wide strip row from the per-bucket [L_b, n*27] table (5-20x
    fewer source rows, ONE index per slot); the two sides fall out by
    STATIC column slices i*27/j*27. Slots are pair-sorted within each
    group and padded to width-aligned runs, so the two-level reduce is
    unchanged: concatenated per-group run sums -> idx2 per unique
    pair. Non-canonical slots (cam_i > cam_j) carry a swap flag and
    contribute the transposed block (a static column permutation).

    Small groups (a high-obs-count bucket has n(n-1)/2 patterns, most
    tiny) would pay a fixed per-op overhead each; groups below
    `min_group` slots are instead routed through a per-observation
    (wi, wj) side stream gathered like PairCsr. Their run rows follow
    the strip groups' rows on the shared row axis.
    """

    # per (bucket, i, j) group, flattened in deterministic order:
    group_bucket: Tuple[int, ...]  # bucket index of each group
    group_i: Tuple[int, ...]  # first-side obs slot within the landmark
    group_j: Tuple[int, ...]  # second-side obs slot
    lm_idx: Tuple[np.ndarray, ...]  # per group [g_pad] int32 landmark
    #   rows into the bucket's [L_b] axis, pair-sorted, pad = L_b
    swap: Tuple[np.ndarray, ...]  # per group [g_pad] bool
    wi_idx: np.ndarray  # [R_obs, width] leftover-slot side-1 flat obs
    #   index, canonical order (pad = O)
    wj_idx: np.ndarray  # [R_obs, width] side 2
    idx2: np.ndarray  # [P, vmax] int32 global run-row ids (pad = R)
    pair_row: np.ndarray  # [P] int32 (<= pair_col)
    pair_col: np.ndarray  # [P] int32
    up_idx: np.ndarray  # [G*G] int32 (see PairCsr)
    lo_idx: np.ndarray  # [G*G] int32


def _pad_runs(code_sorted, width, *cols):
    """Pad pair-sorted per-slot columns to width-aligned per-pair runs.
    Returns (padded columns..., run pair-codes) with pad slots left at
    the fill values pre-set in `fill`."""
    if code_sorted.size == 0:
        # fully-padded sub-stream (e.g. a trailing landmark range of
        # row padding): no slots, no runs
        return ([np.zeros(0, col.dtype) for col, _ in cols],
                np.zeros(0, code_sorted.dtype))
    u, counts = np.unique(code_sorted, return_counts=True)
    padded = (counts + width - 1) // width * width
    total = int(padded.sum())
    starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    src_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = (np.arange(code_sorted.size, dtype=np.int64)
              - np.repeat(src_starts, counts))
    dst = np.repeat(starts, counts) + within
    outs = []
    for col, fill in cols:
        out = np.full(total, fill, dtype=col.dtype)
        out[dst] = col
        outs.append(out)
    return outs, np.repeat(u, padded // width)


def build_pair_strips(buckets, num_cameras: int, width: int = 64,
                      grid_n: int | None = None,
                      min_group: int = 16384,
                      dense_grid: bool = True) -> PairStrips:
    """Build the landmark-strip strict-pair index (see PairStrips).
    dense_grid=False skips the [G*G] up_idx/lo_idx maps (BSR mode)."""
    N = num_cameras
    G = grid_n if grid_n is not None else N

    # collect per-pattern records; route small patterns to the
    # per-observation leftover stream. The per-pattern work (masking,
    # min/max, argsort) is embarrassingly parallel over the ~1000+
    # patterns of a final-13682-sized problem and numpy's sort/where
    # release the GIL, so it runs under a thread pool (measured ~40 s
    # single-threaded at final-13682, the bulk of solver setup).
    from concurrent.futures import ThreadPoolExecutor

    bucket_offs = [0]
    for b in buckets:
        L, n = b.cam_idx.shape
        bucket_offs.append(bucket_offs[-1] + L * n)
    num_obs_slots = bucket_offs[-1]

    tasks = []
    for bi, b in enumerate(buckets):
        L, n = b.cam_idx.shape
        iu, ju = np.triu_indices(n, k=1)
        for t in range(iu.size):
            tasks.append((bi, int(iu[t]), int(ju[t])))

    def _pattern(task):
        bi, i, j = task
        b = buckets[bi]
        L, n = b.cam_idx.shape
        obs_off = bucket_offs[bi]
        ci = b.cam_idx[:, i].astype(np.int64)
        cj = b.cam_idx[:, j].astype(np.int64)
        valid = b.mask[:, i] & b.mask[:, j]
        lm = np.nonzero(valid)[0].astype(np.int64)
        if lm.size == 0:
            return None
        a = np.minimum(ci[lm], cj[lm])
        c = np.maximum(ci[lm], cj[lm])
        swap = ci[lm] > cj[lm]
        code = a * N + c
        if lm.size >= min_group:
            order = np.argsort(code, kind="stable")
            return ("rec", (code[order], lm[order], swap[order]),
                    (bi, i, j, L))
        oi = obs_off + lm * n + i
        oj = obs_off + lm * n + j
        wi = np.where(swap, oj, oi)
        wj = np.where(swap, oi, oj)
        return ("left", (code, wi, wj), None)

    with ThreadPoolExecutor(max_workers=min(16, os.cpu_count() or 1)) \
            as pool:
        results = list(pool.map(_pattern, tasks))

    recs = []  # big groups: (code_sorted, lm_sorted, swap_sorted)
    group_meta = []
    left = []  # small groups: (code, oi, oj) per slot
    for res in results:
        if res is None:
            continue
        kind, payload, meta = res
        if kind == "rec":
            recs.append(payload)
            group_meta.append(meta)
        else:
            left.append(payload)

    all_codes = [r[0] for r in recs] + [lv[0] for lv in left]
    all_codes = (np.concatenate(all_codes) if all_codes
                 else np.zeros(0, np.int64))
    unique = np.unique(all_codes)
    P = unique.size

    def _group_runs(args):
        (code, lm, swap), (bi, i, j, L) = args
        pid = np.searchsorted(unique, code)
        (out_lm, out_sw), rp = _pad_runs(
            pid, width,
            (lm.astype(np.int64), L), (swap, False))
        return out_lm.astype(np.int32), out_sw.astype(bool), rp

    with ThreadPoolExecutor(max_workers=min(16, os.cpu_count() or 1)) \
            as pool:
        run_results = list(pool.map(_group_runs,
                                    zip(recs, group_meta)))

    lm_idx_groups = [r[0] for r in run_results]
    swap_groups = [r[1] for r in run_results]
    gb = [m[0] for m in group_meta]
    gi = [m[1] for m in group_meta]
    gj = [m[2] for m in group_meta]
    row_pair = [r[2] for r in run_results]

    # leftover per-observation stream (pair-sorted, width-padded)
    if left:
        lcode = np.concatenate([lv[0] for lv in left])
        lwi = np.concatenate([lv[1] for lv in left])
        lwj = np.concatenate([lv[2] for lv in left])
        order = np.argsort(lcode, kind="stable")
        pid = np.searchsorted(unique, lcode[order])
        (wi_pad, wj_pad), rp = _pad_runs(
            pid, width,
            (lwi[order], num_obs_slots), (lwj[order], num_obs_slots))
        wi_idx = wi_pad.reshape(-1, width).astype(np.int32)
        wj_idx = wj_pad.reshape(-1, width).astype(np.int32)
        row_pair.append(rp)
    else:
        wi_idx = np.zeros((0, width), np.int32)
        wj_idx = np.zeros((0, width), np.int32)

    row_pair = (np.concatenate(row_pair) if row_pair
                else np.zeros(0, np.int64))
    R = row_pair.size
    order = np.argsort(row_pair, kind="stable")
    # idx2: rows of each pair (rows stay in emission order; idx2
    # gathers them per pair)
    counts = np.bincount(row_pair, minlength=P).astype(np.int64)
    vmax = max(int(counts.max(initial=1)), 1)
    idx2 = np.full((P, vmax), R, dtype=np.int64)
    sorted_rows = order
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = (np.arange(R, dtype=np.int64) - np.repeat(starts, counts))
    idx2[row_pair[sorted_rows], within] = sorted_rows

    rows = (unique // N).astype(np.int64)
    cols = (unique % N).astype(np.int64)
    if dense_grid:
        up_idx = np.full(G * G, P, dtype=np.int64)
        up_idx[rows * G + cols] = np.arange(P, dtype=np.int64)
        lo_idx = np.full(G * G, P, dtype=np.int64)
        lo_idx[cols * G + rows] = np.arange(P, dtype=np.int64)
    else:
        up_idx = lo_idx = np.zeros(0, dtype=np.int64)

    return PairStrips(
        group_bucket=tuple(gb), group_i=tuple(gi), group_j=tuple(gj),
        lm_idx=tuple(lm_idx_groups), swap=tuple(swap_groups),
        wi_idx=wi_idx, wj_idx=wj_idx,
        idx2=idx2.astype(np.int32),
        pair_row=rows.astype(np.int32), pair_col=cols.astype(np.int32),
        up_idx=up_idx.astype(np.int32), lo_idx=lo_idx.astype(np.int32),
    )


class CamStrips(NamedTuple):
    """Landmark-strip formulation of the per-camera reduce (the fast
    path of CamCsr, same trick as PairStrips): per-camera sums of
    per-observation contribution rows gather the observation's ENTIRE
    landmark strip row from the per-bucket [L_b, n*F] table (few source
    rows -> the ~5x-faster gather regime) and take the slot's static
    column slice, instead of one row per obs from the [O, F] flat table
    (millions of source rows at venice scale). Slots are grouped by
    (bucket, within-landmark slot i); within a group they are sorted by
    camera and padded to width-aligned single-camera runs, so the
    two-level reduce is unchanged: concatenated per-group run sums ->
    idx2 per camera. Groups below `min_group` slots route through a
    per-observation leftover stream (identical to CamCsr economics);
    their run rows follow the strip groups' rows on the shared row axis.
    """

    group_bucket: Tuple[int, ...]  # bucket index of each strip group
    group_i: Tuple[int, ...]  # obs slot within the landmark
    lm_idx: Tuple[np.ndarray, ...]  # per group [g_pad] int32 landmark
    #   rows into the bucket's [L_b] axis, camera-sorted, pad = L_b
    wi_idx: np.ndarray  # [R_obs, width] leftover flat obs index (pad=O)
    idx2: np.ndarray  # [N, vmax] int32 global run-row ids (pad = R)


def build_cam_strips(buckets, num_cameras: int, width: int = 64,
                     min_group: int = 16384) -> CamStrips:
    """Build the landmark-strip per-camera reduce index (see CamStrips)."""
    recs = []  # big groups: (cam_sorted, lm_sorted)
    meta = []
    left = []  # small groups: (cam, flat_obs_pos) per slot
    obs_off = 0
    for bi, b in enumerate(buckets):
        L, n = b.cam_idx.shape
        for i in range(n):
            valid = b.mask[:, i]
            lm = np.nonzero(valid)[0].astype(np.int64)
            if lm.size == 0:
                continue
            cam = b.cam_idx[lm, i].astype(np.int64)
            if lm.size >= min_group:
                order = np.argsort(cam, kind="stable")
                recs.append((cam[order], lm[order]))
                meta.append((bi, i, L))
            else:
                left.append((cam, obs_off + lm * n + i))
        obs_off += L * n
    num_obs_slots = obs_off

    lm_groups, gb, gi = [], [], []
    row_cam = []  # camera of each global run row, in emission order
    for (cam, lm), (bi, i, L) in zip(recs, meta):
        (out_lm,), rc = _pad_runs(cam, width, (lm, L))
        lm_groups.append(out_lm.astype(np.int32))
        gb.append(bi)
        gi.append(i)
        row_cam.append(rc)

    if left:
        lcam = np.concatenate([lv[0] for lv in left])
        lpos = np.concatenate([lv[1] for lv in left])
        order = np.argsort(lcam, kind="stable")
        (wi_pad,), rc = _pad_runs(
            lcam[order], width, (lpos[order], num_obs_slots))
        wi_idx = wi_pad.reshape(-1, width).astype(np.int32)
        row_cam.append(rc)
    else:
        wi_idx = np.zeros((0, width), np.int32)

    row_cam = (np.concatenate(row_cam) if row_cam
               else np.zeros(0, np.int64))
    R = row_cam.size
    counts = np.bincount(row_cam, minlength=num_cameras).astype(np.int64)
    vmax = max(int(counts.max(initial=1)), 1)
    idx2 = np.full((num_cameras, vmax), R, dtype=np.int64)
    order = np.argsort(row_cam, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = (np.arange(R, dtype=np.int64)
              - np.repeat(starts, counts))
    idx2[row_cam[order], within] = order

    return CamStrips(
        group_bucket=tuple(gb), group_i=tuple(gi),
        lm_idx=tuple(lm_groups), wi_idx=wi_idx,
        idx2=idx2.astype(np.int32))


class BsrMatvec(NamedTuple):
    """Camera-major index for the block-sparse RCS matvec.

    The dense z-space GEMV (sc_matvec_dense) needs the [9G, 9G] matrix
    in HBM -- 60 GB at final-13682's 13682 cameras. But BAL problems'
    camera-pair graphs are sparse at that scale (~0.2% fill on
    final-13682: 179k unique pairs of 93M possible), so the CG operator
    is instead applied block-sparsely: each unique strict pair (i, j)
    contributes H_ij x_j to y_i AND H_ij' x_i to y_j. Both directions
    are laid out as one camera-major entry list (2P entries), CSR-
    packed into fixed-width runs exactly like CamCsr: per entry, gather
    the [81] block row from the concatenated [2P, 81] table
    [H_up; H_up'] and the [9] x row of the source camera, multiply-
    reduce, sum runs, idx2 per camera. No scatter anywhere; the
    transpose is a static column permutation applied once per stage2,
    not per CG iteration.

    Per-CG-iteration cost is ~2P gathered rows (4 ns/row regime) --
    final-13682: ~360k rows = ~1.5 ms vs ~250 ms for the matrix-free
    implicit operator (which streams all 29M observations).
    """

    blk_idx: np.ndarray  # [R, width] int32 row into the [2P,81] block
    #   table: pair id p for (row=pair_row[p]), P + p for the
    #   transposed direction (row=pair_col[p]); pad = 2P (gather-fill 0)
    col_idx: np.ndarray  # [R, width] int32 source camera of x (pad = N)
    idx2: np.ndarray  # [N, vmax] int32 run-row ids (pad = R)


def build_bsr_matvec(pair_row: np.ndarray, pair_col: np.ndarray,
                     num_cameras: int, width: int = 0) -> BsrMatvec:
    """Build the block-sparse matvec index from the strict-pair list
    (pair_row[p] < pair_col[p], as produced by build_pair_csr /
    build_pair_strips).

    width=0 picks the run width adaptively: every padded slot costs a
    row gather and a slice of the packed block table per matvec
    (linearization.bsr_matvec_packed), so the width minimizing total
    padded slots wins -- venice's ~22 entries/camera pad 3x at the
    old fixed 64."""
    P = pair_row.size
    N = num_cameras
    rows = np.concatenate([pair_row.astype(np.int64),
                           pair_col.astype(np.int64)])
    cols = np.concatenate([pair_col.astype(np.int64),
                           pair_row.astype(np.int64)])
    if width <= 0:
        counts = np.bincount(rows, minlength=N)
        best = None
        width = 64
        for w in (8, 16, 32, 64):
            padded = int(np.sum(-(-counts // w) * w))
            if best is None or padded < best:
                best, width = padded, w
    blks = np.concatenate([np.arange(P, dtype=np.int64),
                           P + np.arange(P, dtype=np.int64)])
    order = np.argsort(rows, kind="stable")
    rows, cols, blks = rows[order], cols[order], blks[order]
    pos_rows, idx2, _ = _csr_rows(
        np.arange(rows.size, dtype=np.int64), rows, N, width, rows.size)
    blks_ext = np.concatenate([blks, [2 * P]])
    cols_ext = np.concatenate([cols, [N]])
    sel = np.minimum(pos_rows, rows.size)
    return BsrMatvec(
        blk_idx=blks_ext[sel].astype(np.int32),
        col_idx=cols_ext[sel].astype(np.int32),
        idx2=idx2.astype(np.int32))


def scatter_landmarks(
    bp: BucketedProblem, lm_p_buckets
) -> np.ndarray:
    """Gather per-bucket landmark positions back into problem order."""
    out = np.zeros((bp.num_landmarks, 3), dtype=np.float64)
    for bucket, p in zip(bp.buckets, lm_p_buckets):
        ids = bucket.lm_id[bucket.lm_mask]
        out[ids] = np.asarray(p, dtype=np.float64)[bucket.lm_mask]
    return out


class PairStream(NamedTuple):
    """All-leftover, source-locality-tiled strict-pair index (round 5).

    The PairStrips pattern-grouping exploits per-(i, j)-column
    regularity that real/clustered covisibility does not have: a wide
    bucket has n(n-1)/2 patterns (233k at a 684-wide final-13682
    bucket -- the host enumeration alone is infeasible), and group
    gathers read the ENTIRE [n*27]-wide strip row to use 54 bytes.
    This index drops patterns entirely: every strict pair slot (l, i, j)
    is a per-observation gather, tiled so the gathers stay in the
    fast source regime (measured on v5e: <= ~200k-row sources gather
    at ~6 ns/row vs ~27 ns at 1.5M rows, and the regime follows the
    SOURCE BUFFER SHAPE, not the index working set -- benchmarks
    /tmp gather_ab3 r5):

      * landmarks are sorted by min-camera inside each bucket
        (bucketize) so a contiguous landmark range covers few cameras
        -> few distinct pairs -> dense width-runs;
      * each bucket is tiled into uniform sub-streams of <= slot_cap
        slots; the device reducer dynamic-slices the bucket's
        [L, n*K9] table to [rows_sub, n*K9], reshapes to the
        [rows_sub*n, K9] slot table (a bounded transient, sequential
        under lax.map) and gathers slots from THAT;
      * slots are pair-sorted within the sub-stream and padded to
        width-aligned single-pair runs; run sums land in a global
        [P, 81] via one segment-sum per stack (no [P, vmax] idx2 --
        18M pairs at final-13682 would make the dense idx2 GBs).
    """

    pair_row: np.ndarray  # [P] int32 (<= pair_col)
    pair_col: np.ndarray  # [P] int32
    widths: Tuple[int, ...]  # run width per stack (adaptive: wide
    #   buckets have few slots per (pair, stream), so a fixed W=16
    #   pads 5-7x at final scale; chosen per bucket to minimize
    #   padded-gather + run-scatter cost)
    stream_bucket: Tuple[int, ...]  # bucket id per stack
    rows_sub: Tuple[int, ...]  # landmark rows per sub-stream, per stack
    wi_idx: Tuple[np.ndarray, ...]  # per stack [S, R, W] int32 local
    #   slot ids into [rows_sub*n] (pad = rows_sub*n), canonical side 1
    wj_idx: Tuple[np.ndarray, ...]  # [S, R, W] side 2
    run_pair: Tuple[np.ndarray, ...]  # per stack [S, R] int32 pair id
    #   of each run (pad = P)
    up_idx: np.ndarray  # [G*G] int32 (see PairCsr); empty if not dense
    lo_idx: np.ndarray


def _stream_tiles(L: int, n: int, slot_cap: int,
                  npairs_hint: int) -> int:
    """Landmark rows per sub-stream: bound the [rows_sub*n, K9] slot
    table to the fast gather regime AND the per-stream pair-slot count
    (rows_sub * npairs) to a workable sort/pad size."""
    rows = max(1, slot_cap // max(n, 1))
    if npairs_hint > 0:
        rows = max(1, min(rows, 4_000_000 // npairs_hint))
    return rows


# pair-slot count above which the stream index shrinks its sub-tables
# to u16 indexing (module global so tests can force it at toy size)
_U16_SLOT_THRESHOLD = 80_000_000


def build_pair_stream(buckets, num_cameras: int, width: int = 16,
                      grid_n: int | None = None,
                      dense_grid: bool = True,
                      slot_cap: int = 196_608) -> PairStream:
    """Build the PairStream index (vectorized; no per-pattern loops --
    final-13682's 233k-pattern wide bucket builds in seconds)."""
    N = num_cameras
    G = grid_n if grid_n is not None else N

    # pass 1: global unique pair codes (per-bucket uniques merged)
    uniques = []
    total_slots = 0
    for b in buckets:
        L, n = b.cam_idx.shape
        if L == 0 or n < 2:
            continue
        iu, ju = np.triu_indices(n, k=1)
        ci = b.cam_idx[:, iu].astype(np.int64)
        cj = b.cam_idx[:, ju].astype(np.int64)
        valid = b.mask[:, iu] & b.mask[:, ju]
        total_slots += int(valid.sum())
        code = np.minimum(ci, cj) * N + np.maximum(ci, cj)
        uniques.append(np.unique(code[valid]))
    unique = (np.unique(np.concatenate(uniques)) if uniques
              else np.zeros(0, np.int64))
    P = unique.size

    # giant pair graphs: shrink the sub-tables so every slot index
    # fits u16 -- the [S, R, W] wi/wj tables are the second-largest
    # resident buffer at final-13682 scale (3.1 GB in i32 at ~240M
    # padded slots; u16 halves them). The fill sentinel rows_sub*n
    # must itself fit, hence the cap at 65535 rows.
    idx_dtype = np.int32
    if total_slots > _U16_SLOT_THRESHOLD and slot_cap > 65_535:
        slot_cap = 65_535
        idx_dtype = np.uint16

    stream_bucket = []
    rows_sub_list = []
    widths_list = []
    wi_stacks = []
    wj_stacks = []
    rp_stacks = []
    for bi, b in enumerate(buckets):
        L, n = b.cam_idx.shape
        if L == 0 or n < 2:
            continue
        iu, ju = np.triu_indices(n, k=1)
        npairs = iu.size
        rows_sub = _stream_tiles(L, n, slot_cap, npairs)
        S = -(-L // rows_sub)

        def one_stream(s, b=b, n=n, iu=iu, ju=ju, npairs=npairs,
                       rows_sub=rows_sub, L=L):
            l0 = s * rows_sub
            l1 = min(L, l0 + rows_sub)
            ci = b.cam_idx[l0:l1, iu].astype(np.int64)
            cj = b.cam_idx[l0:l1, ju].astype(np.int64)
            valid = (b.mask[l0:l1, iu] & b.mask[l0:l1, ju]).ravel()
            code = (np.minimum(ci, cj) * N
                    + np.maximum(ci, cj)).ravel()[valid]
            swap = (ci > cj).ravel()[valid]
            lrel = np.repeat(
                np.arange(l1 - l0, dtype=np.int64), npairs)[valid]
            oi = lrel * n + np.tile(iu, l1 - l0)[valid]
            oj = lrel * n + np.tile(ju, l1 - l0)[valid]
            wi = np.where(swap, oj, oi)
            wj = np.where(swap, oi, oj)
            order = np.argsort(code, kind="stable")
            pid = np.searchsorted(unique, code[order])
            return pid, wi[order], wj[order]

        # per-sub-stream work is embarrassingly parallel and numpy's
        # sorts release the GIL (final-13682: ~200 streams)
        from concurrent.futures import ThreadPoolExecutor

        if S > 1:
            with ThreadPoolExecutor(
                    max_workers=min(16, os.cpu_count() or 1)) as pool:
                sorted_streams = list(pool.map(one_stream, range(S)))
        else:
            sorted_streams = [one_stream(0)]

        # adaptive run width: wide buckets have few slots per
        # (pair, stream), so W=16 pads 5-7x at final scale. Choose
        # the W minimizing gathered-slot + run-scatter cost over the
        # realized per-(pair, stream) slot counts (gathers ~6 ns/slot
        # x2 sides, segment-sum ~60 ns/run -> runs weigh ~5 slots).
        counts_all = []
        for pid, _, _ in sorted_streams:
            if pid.size:
                counts_all.append(np.unique(pid, return_counts=True)[1])
        counts_all = (np.concatenate(counts_all) if counts_all
                      else np.zeros(0, np.int64))
        best_w, best_cost = width, None
        for w in (16, 8, 4, 2):
            runs = int(np.sum(-(-counts_all // w)))
            # ~6 ns/slot per gather side + ~8 ns/slot MXU fold vs
            # ~60 ns/run segment-sum scatter
            cost = runs * w * 2 + runs * 10
            if best_cost is None or cost < best_cost:
                best_cost, best_w = cost, w
        bw = best_w

        fill = rows_sub * n
        wi_runs, wj_runs, rp_runs = [], [], []
        for pid, wi_s, wj_s in sorted_streams:
            (wi_p, wj_p), rp = _pad_runs(
                pid, bw, (wi_s, fill), (wj_s, fill))
            wi_runs.append(wi_p.reshape(-1, bw))
            wj_runs.append(wj_p.reshape(-1, bw))
            rp_runs.append(rp)
        R = max([r.shape[0] for r in wi_runs] + [1])
        wi_st = np.full((S, R, bw), fill, idx_dtype)
        wj_st = np.full((S, R, bw), fill, idx_dtype)
        rp_st = np.full((S, R), P, np.int32)
        for s in range(S):
            r = wi_runs[s].shape[0]
            wi_st[s, :r] = wi_runs[s]
            wj_st[s, :r] = wj_runs[s]
            rp_st[s, :r] = rp_runs[s]
        stream_bucket.append(bi)
        rows_sub_list.append(rows_sub)
        widths_list.append(bw)
        wi_stacks.append(wi_st)
        wj_stacks.append(wj_st)
        rp_stacks.append(rp_st)

    rows = (unique // N).astype(np.int64)
    cols = (unique % N).astype(np.int64)
    if dense_grid:
        up_idx = np.full(G * G, P, dtype=np.int64)
        up_idx[rows * G + cols] = np.arange(P, dtype=np.int64)
        lo_idx = np.full(G * G, P, dtype=np.int64)
        lo_idx[cols * G + rows] = np.arange(P, dtype=np.int64)
    else:
        up_idx = lo_idx = np.zeros(0, dtype=np.int64)

    return PairStream(
        pair_row=rows.astype(np.int32), pair_col=cols.astype(np.int32),
        widths=tuple(widths_list),
        stream_bucket=tuple(stream_bucket),
        rows_sub=tuple(rows_sub_list),
        wi_idx=tuple(wi_stacks), wj_idx=tuple(wj_stacks),
        run_pair=tuple(rp_stacks),
        up_idx=up_idx.astype(np.int32), lo_idx=lo_idx.astype(np.int32))


class CamStream(NamedTuple):
    """Per-camera reduce in the PairStream formulation (self-slots,
    runs keyed by camera): replaces the CamStrips per-(bucket, i)
    groups whose whole-row gathers pay n x bandwidth on wide buckets
    (a 684-wide final bucket would read its table 684 times)."""

    width: int
    num_cameras: int
    stream_bucket: Tuple[int, ...]
    rows_sub: Tuple[int, ...]
    w_idx: Tuple[np.ndarray, ...]  # per stack [S, R, W] int32 local
    #   slot ids (pad = rows_sub*n)
    run_cam: Tuple[np.ndarray, ...]  # per stack [S, R] int32 (pad = N)


def build_cam_stream(buckets, num_cameras: int, width: int = 16,
                     slot_cap: int = 196_608) -> CamStream:
    N = num_cameras
    stream_bucket = []
    rows_sub_list = []
    w_stacks = []
    rc_stacks = []
    for bi, b in enumerate(buckets):
        L, n = b.cam_idx.shape
        if L == 0:
            continue
        rows_sub = max(1, slot_cap // max(n, 1))
        S = -(-L // rows_sub)
        w_runs, rc_runs = [], []
        for s in range(S):
            l0 = s * rows_sub
            l1 = min(L, l0 + rows_sub)
            cam = b.cam_idx[l0:l1].astype(np.int64).ravel()
            valid = b.mask[l0:l1].ravel()
            slot = np.arange((l1 - l0) * n, dtype=np.int64)[valid]
            cam = cam[valid]
            order = np.argsort(cam, kind="stable")
            fill = rows_sub * n
            (w_p,), rc = _pad_runs(cam[order], width,
                                   (slot[order], fill))
            w_runs.append(w_p.reshape(-1, width))
            rc_runs.append(rc)
        R = max([r.shape[0] for r in w_runs] + [1])
        fill = rows_sub * n
        w_st = np.full((S, R, width), fill, np.int32)
        rc_st = np.full((S, R), N, np.int32)
        for s in range(S):
            r = w_runs[s].shape[0]
            w_st[s, :r] = w_runs[s]
            rc_st[s, :r] = rc_runs[s]
        stream_bucket.append(bi)
        rows_sub_list.append(rows_sub)
        w_stacks.append(w_st)
        rc_stacks.append(rc_st)
    return CamStream(
        width=width,
        num_cameras=N,
        stream_bucket=tuple(stream_bucket),
        rows_sub=tuple(rows_sub_list),
        w_idx=tuple(w_stacks), run_cam=tuple(rc_stacks))
