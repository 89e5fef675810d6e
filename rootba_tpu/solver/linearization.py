"""Batched linearization of bucketed BAL problems.

TPU re-design of the reference's per-landmark storage fill
(qr/impl/landmark_block_base.ipp:89-147 linearize_landmark and
sc/landmark_block.hpp:116-166): for every bucket, residuals and
robust-weighted Jacobians of all (landmark, obs) slots are produced as
padded dense tensors in one fused pass

    Jp [L, n, 2, 9]   pose+intrinsics Jacobian  (sqrt-weighted, masked)
    Jl [L, n, 2, 3]   landmark Jacobian          (sqrt-weighted, masked)
    r  [L, n, 2]      residual                   (sqrt-weighted, masked)

plus the landmark-Jacobian column scaling (scale_Jl_cols,
landmark_block_base.ipp:572-587) and the global pose-Jacobian column
norms (add_Jp_diag2 -> jacobi scaling, linearizor_qr.cpp:104-110),
whose per-camera accumulation is a segment-sum instead of the
reference's mutex scatter.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rootba_tpu.core.projection import linearize_point
from rootba_tpu.core.residuals import (
    ResidualInfo,
    accumulate_residual_info,
    empty_residual_info,
    join_residual_info,
)

POSE_SIZE = 9


class CamState(NamedTuple):
    q: jnp.ndarray  # [N,4]
    t: jnp.ndarray  # [N,3]
    intr: jnp.ndarray  # [N,3]


class BucketIndex(NamedTuple):
    """Static per-bucket index data (device arrays, never updated)."""

    obs_uv: jnp.ndarray  # [L,n,2]
    cam_idx: jnp.ndarray  # [L,n] int32
    mask: jnp.ndarray  # [L,n] bool
    lm_mask: jnp.ndarray  # [L] bool


class CamCsrIndex(NamedTuple):
    """Device copy of bucketing.CamCsr (see its docstring)."""

    idx: jnp.ndarray  # [R, width] int32
    idx2: jnp.ndarray  # [N, vmax] int32


# per-chunk obs-slot budget for _map_rows: transient narrow arrays
# ([rows, <128]) lane-pad to 128, so a chunk costs up to
# rows*128*4 B of transient HBM (~65 MB at this budget; venice
# measured chunk-granularity-insensitive, and final-13682 needs the
# headroom)
_ROW_CHUNK_SLOTS = 131_072


def _map_rows(f, tables, L, n, budget_slots=None):
    """Apply f(list of [Lc, *] tables) -> pytree of [Lc, *] outputs
    over landmark-row chunks of a bucket's tables under lax.map.

    Sequentializes the chain so only ONE chunk's transients are live:
    XLA otherwise schedules many buckets' fusions concurrently and
    their lane-padded narrow intermediates ([rows, 3/9] -> 128 lanes)
    coexist -- 70 GB at final-13682 before chunking."""
    if budget_slots is None:
        # resolved at call time so tests can shrink the module global
        # and force the chunked path on toy problems (VERDICT r2 item 5)
        budget_slots = _ROW_CHUNK_SLOTS
    budget_rows = max(8, (budget_slots // max(n, 1)) // 8 * 8)
    if L <= budget_rows:
        return f(tables)
    # no zero-pad copies: padding each input table to a chunk multiple
    # duplicates it in HBM (measured 1.5-2 GB of pad.clone temps at
    # final-13682, the difference between fitting and OOM). The
    # divisible prefix runs under lax.map; the remainder is one direct
    # tail call (leading-axis slice + reshape are layout-preserving).
    C0 = L // budget_rows
    main = C0 * budget_rows
    stacked = tuple(
        t[:main].reshape((C0, budget_rows) + t.shape[1:])
        for t in tables)
    out = jax.lax.map(lambda ts: f(list(ts)), stacked)
    out = jax.tree_util.tree_map(
        lambda o: o.reshape((main,) + o.shape[2:]), out)
    if main == L:
        return out
    out_tail = f([t[main:] for t in tables])
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), out, out_tail)



# per-chunk gather budget for _level2_reduce (module global so tests
# can shrink it and force the lax.map-chunked path on toy problems)
_LEVEL2_CHUNK_BYTES = 16 << 20


def _level2_reduce(rows: jnp.ndarray, idx2: jnp.ndarray) -> jnp.ndarray:
    """Second-level run reduction shared by every gather-reduce here:
    out[s] = sum_v rows[idx2[s, v]] (idx2 padded with the dump row).
    Chunked over the segment axis under lax.map -- the [S, vmax, F]
    gather is otherwise one fusion output (5.5 GB at final-13682,
    where a popular camera pair spans vmax ~ 95 runs)."""
    S, V = idx2.shape
    F = rows.shape[1]
    chunk = max(1, min(S, _LEVEL2_CHUNK_BYTES // max(V * F * 4, 1)))
    Spad = -(-S // chunk) * chunk
    ix = idx2 if Spad == S else jnp.concatenate(
        [idx2, jnp.full((Spad - S, V), rows.shape[0] - 1, jnp.int32)])

    def chunk_sum(ic):
        g = jnp.take(rows, ic.reshape(-1), axis=0, mode="fill",
                     fill_value=0.0)
        return jnp.sum(g.reshape(chunk, V, F), axis=1)

    nchunks = Spad // chunk
    if nchunks == 1:
        out = chunk_sum(ix)
    else:
        out = jax.lax.map(
            chunk_sum, ix.reshape(nchunks, chunk, V)).reshape(Spad, F)
    return out[:S]


def csr_cam_reduce(contribs, csr: CamCsrIndex,
                   num_cameras: int) -> jnp.ndarray:
    """Per-camera sum of per-obs-slot contribution rows WITHOUT a
    scatter: contribs is the per-bucket list of flat [L*n, F] rows (in
    bucket order, matching the CamCsr slot numbering); returns [N, F].

    Replaces segment_sum (the reference's mutex scatter,
    linearization_qr.hpp:406-429): on TPU, scatter-adds cost ~10-20x
    their traffic while static gathers + dense reductions run near
    memory bandwidth.
    """
    flat = contribs[0] if len(contribs) == 1 else jnp.concatenate(
        contribs, axis=0)
    F = flat.shape[1]
    R, W = csr.idx.shape
    O = flat.shape[0]
    # row-chunked gather-reduce under lax.map (one chunk's transients
    # live at a time); fill-mode take (pad index == total_slots) avoids
    # copying the whole contribution array to append a zero dump row
    chunk = max(1, min(R, (512 << 10) // max(W, 1)))
    Rpad = -(-R // chunk) * chunk
    idx = csr.idx if Rpad == R else jnp.concatenate(
        [csr.idx, jnp.full((Rpad - R, W), O, jnp.int32)])

    def chunk_sum(ix):
        g = jnp.take(flat, ix.reshape(-1), axis=0, mode="fill",
                     fill_value=0.0)
        return jnp.sum(g.reshape(chunk, W, F), axis=1)

    nchunks = Rpad // chunk
    if nchunks == 1:
        rsum = chunk_sum(idx)
    else:
        rsum = jax.lax.map(
            chunk_sum, idx.reshape(nchunks, chunk, W)).reshape(Rpad, F)
    rsum = jnp.concatenate(
        [rsum[:R], jnp.zeros((1, F), rsum.dtype)], axis=0)
    return _level2_reduce(rsum, csr.idx2)  # [N, F]


class PairCsrIndex(NamedTuple):
    """Device copy of bucketing.PairCsr (see its docstring)."""

    wi_idx: jnp.ndarray  # [R, width] int32 (pad = O)
    wj_idx: jnp.ndarray  # [R, width] int32 (pad = O)
    idx2: jnp.ndarray  # [P, vmax] int32 (pad = R)
    pair_row: jnp.ndarray  # [P] int32
    pair_col: jnp.ndarray  # [P] int32
    up_idx: jnp.ndarray  # [N*N] int32
    lo_idx: jnp.ndarray  # [N*N] int32

    @property
    def num_pairs(self) -> int:
        return self.pair_row.shape[0]

    @staticmethod
    def from_host(pcsr) -> "PairCsrIndex":
        return PairCsrIndex(
            wi_idx=jnp.asarray(pcsr.wi_idx),
            wj_idx=jnp.asarray(pcsr.wj_idx),
            idx2=jnp.asarray(pcsr.idx2),
            pair_row=jnp.asarray(pcsr.pair_row),
            pair_col=jnp.asarray(pcsr.pair_col),
            up_idx=jnp.asarray(pcsr.up_idx),
            lo_idx=jnp.asarray(pcsr.lo_idx))


def csr_pair_outer(strip_a: jnp.ndarray, strip_b: jnp.ndarray,
                   pairs: PairCsrIndex) -> jnp.ndarray:
    """Per-unique-camera-pair sum of per-observation-pair block
    products, as two row gathers + elementwise products + clean
    reductions (no scatter, no [L,n,n,...] pair tensors):

        out[p, a*9+b] = sum over obs pairs (i, j) of camera pair p of
                        sum_k strip_a[i, k, a] * strip_b[j, k, b]

    strips are per-obs [O, K, 9] factors: the sqrt solver passes
    (W, W) with W = Q1h'Jp, the SC solver (Hll^-1 T, T) with
    T = Jl'Jp (the middle matrix must be symmetric for the canonical
    pair swap to be valid). Products are formed on the VPU in f32 --
    einsum-style dots would route these tiny contractions through the
    MXU at bf16 default precision with double layout-copy passes
    (benchmarks/profile_solve.py).

    Replaces the reference's num_cams^2 mutex scatter for RCS assembly
    (sc/linearization_sc.hpp:327-348).
    """
    O, K, _ = strip_a.shape
    R, W = pairs.wi_idx.shape
    fa = strip_a.reshape(O, K * 9)
    fb = strip_b.reshape(O, K * 9)
    same = (strip_a is strip_b) and (pairs.wi_idx is pairs.wj_idx)

    # level-1 reduce in row chunks under lax.map: the gathered sides +
    # products are transient [chunk*W, 81] buffers (~5 GB unchunked at
    # venice scale; the loop primitive also guarantees only ONE chunk's
    # transients are live -- a Python-unrolled chunk loop lets the
    # scheduler overlap them)
    chunk = max(1, min(R, (512 << 10) // max(W, 1)))
    Rpad = -(-R // chunk) * chunk
    pad_rows = Rpad - R
    wi = pairs.wi_idx if pad_rows == 0 else jnp.concatenate(
        [pairs.wi_idx, jnp.full((pad_rows, W), O, jnp.int32)])
    wj = pairs.wj_idx if pad_rows == 0 else jnp.concatenate(
        [pairs.wj_idx, jnp.full((pad_rows, W), O, jnp.int32)])

    shared_idx = pairs.wi_idx is pairs.wj_idx
    fab = (jnp.concatenate([fa, fb], axis=1)
           if shared_idx and not same else None)

    def chunk_sum(ix):
        wi_c, wj_c = ix
        # gather with fill (sentinel index == O): cheaper than
        # concatenating a zero dump row (copies the whole strip).
        # gather cost is per-index and width-free, so shared-index
        # two-strip reductions gather the concatenated strips once
        if same:
            si = jnp.take(fa, wi_c.reshape(-1), axis=0, mode="fill",
                          fill_value=0.0)
            sj = si
        elif shared_idx:
            g = jnp.take(fab, wi_c.reshape(-1), axis=0, mode="fill",
                         fill_value=0.0)
            si, sj = g[:, :K * 9], g[:, K * 9:]
        else:
            si = jnp.take(fa, wi_c.reshape(-1), axis=0, mode="fill",
                          fill_value=0.0)
            sj = jnp.take(fb, wj_c.reshape(-1), axis=0, mode="fill",
                          fill_value=0.0)
        # block product in flat 2-D form: out col a*9+b =
        # sum_c si[:,c*9+a] * sj[:,c*9+b]. repeat/tile keeps everything
        # {1,0}-laid-out [*,81] rows; a [*,K,9,9] formulation triggers a
        # full relayout copy pass before the run reduction
        # (benchmarks/profile_solve.py)
        A = jnp.repeat(si.reshape(-1, K, 9), 9, axis=2)  # [cW,K,81]
        B = jnp.tile(sj.reshape(-1, K, 9), (1, 1, 9))
        prod = jnp.sum(A * B, axis=1)  # [cW, 81]
        return jnp.sum(prod.reshape(chunk, W, 81), axis=1)

    nchunks = Rpad // chunk
    if nchunks == 1:
        rsum = chunk_sum((wi, wj))
    else:
        rsum = jax.lax.map(
            chunk_sum,
            (wi.reshape(nchunks, chunk, W),
             wj.reshape(nchunks, chunk, W))).reshape(Rpad, 81)
    rsum = jnp.concatenate(
        [rsum[:R], jnp.zeros((1, 81), rsum.dtype)], axis=0)
    return _level2_reduce(rsum, pairs.idx2)  # [P, 81]


@jax.tree_util.register_pytree_node_class
class PairStripsIndex:
    """Device copy of bucketing.PairStrips (see its docstring).

    Registered pytree whose (group_bucket, group_i, group_j) metadata
    is STATIC aux data -- it drives Python-level slicing decisions in
    csr_pair_outer_strips and must not be traced when the structure is
    passed as a jit argument."""

    def __init__(self, group_bucket, group_i, group_j, lm_idx, swap,
                 wi_idx, wj_idx, idx2, pair_row, pair_col, up_idx,
                 lo_idx):
        self.group_bucket = group_bucket
        self.group_i = group_i
        self.group_j = group_j
        self.lm_idx = lm_idx
        self.swap = swap
        self.wi_idx = wi_idx
        self.wj_idx = wj_idx
        self.idx2 = idx2
        self.pair_row = pair_row
        self.pair_col = pair_col
        self.up_idx = up_idx
        self.lo_idx = lo_idx

    def tree_flatten(self):
        children = (self.lm_idx, self.swap, self.wi_idx, self.wj_idx,
                    self.idx2, self.pair_row, self.pair_col,
                    self.up_idx, self.lo_idx)
        aux = (self.group_bucket, self.group_i, self.group_j)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def num_pairs(self) -> int:
        return self.pair_row.shape[0]

    @staticmethod
    def from_host(ps) -> "PairStripsIndex":
        return PairStripsIndex(
            group_bucket=tuple(ps.group_bucket),
            group_i=tuple(ps.group_i), group_j=tuple(ps.group_j),
            lm_idx=tuple(jnp.asarray(x) for x in ps.lm_idx),
            swap=tuple(jnp.asarray(x) for x in ps.swap),
            wi_idx=jnp.asarray(ps.wi_idx),
            wj_idx=jnp.asarray(ps.wj_idx),
            idx2=jnp.asarray(ps.idx2),
            pair_row=jnp.asarray(ps.pair_row),
            pair_col=jnp.asarray(ps.pair_col),
            up_idx=jnp.asarray(ps.up_idx),
            lo_idx=jnp.asarray(ps.lo_idx))


PAIR_WIDTH = 64
_PAIR_CHUNK_BYTES = 8 << 20  # per-chunk gather budget (test knob)


def _outer81_fold(s1: jnp.ndarray, s2: jnp.ndarray,
                  width: int) -> jnp.ndarray:
    """Run-folded 9x9 block outer products on the MXU:

        out[r, a*9+b] = sum_{s in run r} sum_k s1[s, k*9+a] s2[s, k*9+b]

    s1/s2 are slot-major [rows, K*9] strips (rows a multiple of
    `width`). Lowered as the wide-N batched dot_general

        [R, width, K*9]^T [R, width, K*9] -> [R, K*9, K*9]

    then summing the K diagonal 9x9 blocks: vs contracting the
    width*K axis with N=9 (the round-2 form), the [R, width, K9]
    operand lane-pads K9 -> 128 once instead of the [R, width*K, 9]
    operand padding 9 -> 128 (3x the operand bytes) -- measured
    30.0 -> 23.2 ms per 2.56M K=3 slots on v5e
    (benchmarks/fold_variants.py). HIGHEST precision keeps it
    f32-exact (max rel err 2.5e-7 vs the elementwise chain). Still
    ~4x the VPU repeat/tile chain it replaced in round 2."""
    K9 = s1.shape[1]
    K = K9 // 9
    r1 = s1.reshape(s1.shape[0] // width, width, K9)
    r2 = s2.reshape(s2.shape[0] // width, width, K9)
    wide = jax.lax.dot_general(
        r1, r2, (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)  # [R, K9, K9]
    out = wide[:, 0:9, 0:9]
    for k in range(1, K):
        out = out + wide[:, k * 9:(k + 1) * 9, k * 9:(k + 1) * 9]
    return out.reshape(out.shape[0], 81)


def csr_pair_outer_strips(strip_a, strip_b, buckets,
                          strips: PairStripsIndex) -> jnp.ndarray:
    """Strict-pair block-product reduction in the landmark-strip
    formulation (see bucketing.PairStrips): ONE small-table row gather
    per pair slot (two when strip_a is not strip_b), static column
    slices for the (i, j) sides, input-side canonical swap, width-run
    sums + per-pair idx2 gather. Semantics match csr_pair_outer:

        out[p, a*9+b] = sum over obs pairs of camera pair p of
                        sum_k strip_a[first, k, a] strip_b[second, k, b]

    with `first` the observation on the pair's lower-id camera.

    A PairStreamIndex routes through the structure-robust stream
    reducer (pair_outer_stream). Otherwise:
    strip_a/strip_b are flat [O, K, 9] arrays OR per-bucket tuples of
    [L_b, n_b*K*9] landmark-strip tables. PREFER the tuple form at
    scale: a flat narrow array that feeds the per-bucket table reshape
    gets materialized row-major with its minor dim lane-padded to 128
    (a [29M, 27] strip = 17.2 GB on final-13682, compile-time HBM OOM);
    per-bucket tables built straight from per-bucket slices bound every
    materialization to [L_b, n_b*K*9]. The tuple form has no per-obs
    leftover stream (build the index with min_group=0)."""
    if isinstance(strips, PairStreamIndex):
        same = strip_a is strip_b
        ta = split_flat_by_bucket(strip_a, buckets)
        tb = ta if same else split_flat_by_bucket(strip_b, buckets)
        return pair_outer_stream(ta, tb, buckets, strips)
    parts_mode = isinstance(strip_a, (tuple, list))
    same = strip_a is strip_b
    if parts_mode:
        K = strip_a[0].shape[1] // (9 * buckets[0].cam_idx.shape[1])
        fa = fb = None
    else:
        O, K, _ = strip_a.shape
        fa = strip_a.reshape(O, K * 9)
        fb = fa if same else strip_b.reshape(O, K * 9)

    offs = [0]
    for b in buckets:
        L, n = b.cam_idx.shape
        offs.append(offs[-1] + L * n)

    rows_parts = []
    for g in range(len(strips.group_bucket)):
        bi = strips.group_bucket[g]
        i, j = strips.group_i[g], strips.group_j[g]
        L, n = buckets[bi].cam_idx.shape
        lm = strips.lm_idx[g]
        sw = strips.swap[g]
        if parts_mode:
            ta = strip_a[bi]
            tb = ta if same else strip_b[bi]
        else:
            ta = jax.lax.slice_in_dim(fa, offs[bi], offs[bi + 1],
                                      axis=0).reshape(L, n * K * 9)
            tb = ta if same else jax.lax.slice_in_dim(
                fb, offs[bi], offs[bi + 1], axis=0).reshape(L, n * K * 9)

        # chunk big groups (bounds the [chunk, n*K*9] gather + the
        # [chunk, K, 81] product transients)
        gsz = lm.shape[0]
        chunk = max(PAIR_WIDTH,
                    min(gsz, _PAIR_CHUNK_BYTES // (n * K * 9 * 4)))
        chunk = chunk // PAIR_WIDTH * PAIR_WIDTH
        npad = -(-gsz // chunk) * chunk
        if npad != gsz:
            lm = jnp.concatenate(
                [lm, jnp.full((npad - gsz,), L, jnp.int32)])
            sw = jnp.concatenate(
                [sw, jnp.zeros((npad - gsz,), bool)])

        def one(args, i=i, j=j, K=K, ta=ta, tb=tb):
            lm_c, sw_c = args
            ga = jnp.take(ta, lm_c, axis=0, mode="fill",
                          fill_value=0.0)
            gb_ = ga if same else jnp.take(
                tb, lm_c, axis=0, mode="fill", fill_value=0.0)
            ai = ga[:, i * K * 9:(i + 1) * K * 9]
            aj = ga[:, j * K * 9:(j + 1) * K * 9]
            bi_ = gb_[:, i * K * 9:(i + 1) * K * 9]
            bj = gb_[:, j * K * 9:(j + 1) * K * 9]
            # canonical order: first side on the lower camera id
            s1 = jnp.where(sw_c[:, None], aj, ai)  # [chunk, K*9]
            s2 = jnp.where(sw_c[:, None], bi_, bj)
            return _outer81_fold(s1, s2, PAIR_WIDTH)

        nch = npad // chunk
        if nch == 1:
            rows_g = one((lm, sw))
        else:
            rows_g = jax.lax.map(
                one, (lm.reshape(nch, chunk),
                      sw.reshape(nch, chunk))
            ).reshape(npad // PAIR_WIDTH, 81)
        # drop the chunk-padding tail rows: the host's idx2 numbering
        # counts exactly gsz/width rows for this group
        rows_parts.append(rows_g[:gsz // PAIR_WIDTH])

    # leftover per-observation stream (small patterns; see PairStrips)
    Rl, Wl = strips.wi_idx.shape
    if Rl:
        if parts_mode:
            raise ValueError(
                "per-bucket strip tables require an index built with "
                "min_group=0 (no per-obs leftover stream)")
        # both sides always differ here (two observations of one
        # landmark); fb is fa for symmetric strips
        si = jnp.take(fa, strips.wi_idx.reshape(-1), axis=0,
                      mode="fill", fill_value=0.0)
        sj = jnp.take(fb, strips.wj_idx.reshape(-1), axis=0,
                      mode="fill", fill_value=0.0)
        rows_parts.append(_outer81_fold(si, sj, Wl))

    rows = (rows_parts[0] if len(rows_parts) == 1
            else jnp.concatenate(rows_parts, axis=0))
    rows = jnp.concatenate(
        [rows, jnp.zeros((1, 81), rows.dtype)], axis=0)
    return _level2_reduce(rows, strips.idx2)  # [P, 81]


@jax.tree_util.register_pytree_node_class
class CamStripsIndex:
    """Device copy of bucketing.CamStrips (see its docstring). Like
    PairStripsIndex, (group_bucket, group_i) is static aux data driving
    Python-level slicing in the reducers below."""

    def __init__(self, group_bucket, group_i, lm_idx, wi_idx, idx2):
        self.group_bucket = group_bucket
        self.group_i = group_i
        self.lm_idx = lm_idx
        self.wi_idx = wi_idx
        self.idx2 = idx2

    def tree_flatten(self):
        return ((self.lm_idx, self.wi_idx, self.idx2),
                (self.group_bucket, self.group_i))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @staticmethod
    def from_host(cs) -> "CamStripsIndex":
        return CamStripsIndex(
            group_bucket=tuple(cs.group_bucket),
            group_i=tuple(cs.group_i),
            lm_idx=tuple(jnp.asarray(x) for x in cs.lm_idx),
            wi_idx=jnp.asarray(cs.wi_idx),
            idx2=jnp.asarray(cs.idx2))


def _strip_run_rows(buckets, strips: CamStripsIndex, flat_tables,
                    row_fn, out_width, row_fn_runs=None):
    """Shared two-level skeleton of the camera-strip reducers: for each
    strip group, gather each table's [L_b, n*K] landmark strips by the
    group's lm rows (chunked under lax.map), hand the slot's static
    column slice of every table to row_fn -> [rows, out_width] run
    sums; the leftover per-obs stream gathers flat rows directly.
    Returns the [N, out_width] per-camera totals via idx2.

    Each flat_tables entry is a flat [O, K] array OR a per-bucket tuple
    of [L_b, n_b*K] tables (see csr_pair_outer_strips on why the tuple
    form is required at final-13682 scale; tuple tables need a
    min_group=0 index -- no leftover stream).

    row_fn_runs(slices, width), when given, replaces row_fn AND the
    run sum in one shot (-> [rows//width, out_width]); gram consumers
    use it to fold the run sum into an MXU pass (_outer81_fold)."""
    offs = [0]
    for b in buckets:
        L, n = b.cam_idx.shape
        offs.append(offs[-1] + L * n)

    parts_mode = any(isinstance(f, (tuple, list)) for f in flat_tables)
    rows_parts = []
    for g in range(len(strips.group_bucket)):
        bi = strips.group_bucket[g]
        i = strips.group_i[g]
        L, n = buckets[bi].cam_idx.shape
        lm = strips.lm_idx[g]
        tabs = [f[bi] if isinstance(f, (tuple, list))
                else jax.lax.slice_in_dim(f, offs[bi], offs[bi + 1],
                                          axis=0).reshape(L, -1)
                for f in flat_tables]
        Ks = [t.shape[1] // n for t in tabs]  # per-table slot width

        gsz = lm.shape[0]
        width_bytes = sum(t.shape[1] for t in tabs) * 4
        chunk = max(PAIR_WIDTH,
                    min(gsz, _PAIR_CHUNK_BYTES // max(width_bytes, 1)))
        chunk = chunk // PAIR_WIDTH * PAIR_WIDTH
        npad = -(-gsz // chunk) * chunk
        if npad != gsz:
            lm = jnp.concatenate(
                [lm, jnp.full((npad - gsz,), L, jnp.int32)])

        def one(lm_c, i=i, Ks=Ks, tabs=tabs):
            slices = []
            for t, K in zip(tabs, Ks):
                gr = jnp.take(t, lm_c, axis=0, mode="fill",
                              fill_value=0.0)
                slices.append(gr[:, i * K:(i + 1) * K])
            if row_fn_runs is not None:
                return row_fn_runs(slices, PAIR_WIDTH)
            rows = row_fn(slices)  # [chunk, out_width]
            return jnp.sum(
                rows.reshape(-1, PAIR_WIDTH, out_width), axis=1)

        nch = npad // chunk
        if nch == 1:
            rows_g = one(lm)
        else:
            rows_g = jax.lax.map(
                one, lm.reshape(nch, chunk)
            ).reshape(npad // PAIR_WIDTH, out_width)
        rows_parts.append(rows_g[:gsz // PAIR_WIDTH])

    Rl, Wl = strips.wi_idx.shape
    if Rl:
        if parts_mode:
            raise ValueError(
                "per-bucket strip tables require an index built with "
                "min_group=0 (no per-obs leftover stream)")
        slices = [jnp.take(f, strips.wi_idx.reshape(-1), axis=0,
                           mode="fill", fill_value=0.0)
                  for f in flat_tables]
        if row_fn_runs is not None:
            rows_parts.append(row_fn_runs(slices, Wl))
        else:
            rows = row_fn(slices)
            rows_parts.append(
                jnp.sum(rows.reshape(Rl, Wl, out_width), axis=1))

    rows = (rows_parts[0] if len(rows_parts) == 1
            else jnp.concatenate(rows_parts, axis=0))
    rows = jnp.concatenate(
        [rows, jnp.zeros((1, out_width), rows.dtype)], axis=0)
    return _level2_reduce(rows, strips.idx2)  # [N, out_width]


def cam_reduce_strips(flat, buckets, strips) -> jnp.ndarray:
    """Per-camera sum of per-obs-slot [O, F] contribution rows in the
    landmark-strip formulation (semantics of csr_cam_reduce; see
    bucketing.CamStrips for why this gathers faster at scale). `flat`
    is an [O, F] array or a per-bucket tuple of [L_b, n_b*F] tables
    (see _strip_run_rows). A CamStreamIndex routes through the
    structure-robust stream reducer."""
    if isinstance(strips, CamStreamIndex):
        return cam_reduce_stream(split_flat_by_bucket(flat, buckets),
                                 buckets, strips, strips.num_cameras)
    if isinstance(flat, (tuple, list)):
        F = flat[0].shape[1] // buckets[0].cam_idx.shape[1]
    else:
        F = flat.shape[1]
    return _strip_run_rows(buckets, strips, [flat],
                           lambda s: s[0], F)


def cam_gram_strips(terms, buckets, strips: CamStripsIndex) -> jnp.ndarray:
    """Per-camera gram blocks sum_obs sum_k A[o,k,a] B[o,k,b] as [N,81]
    rows, fused into the strip gather-reduce (no [O,81]
    materialization). terms = [(A [O,K,9], B, sign)] -- each side an
    array or a per-bucket tuple of [L_b, n_b*K*9] tables; tables shared
    between terms/sides are gathered once. A CamStreamIndex routes
    through the structure-robust stream reducer."""
    if isinstance(strips, CamStreamIndex):
        seen = {}

        def as_parts(M):
            if id(M) not in seen:
                seen[id(M)] = split_flat_by_bucket(M, buckets)
            return seen[id(M)]

        tterms = [(as_parts(A), as_parts(B), sign)
                  for A, B, sign in terms]
        return cam_gram_stream(tterms, buckets, strips,
                               strips.num_cameras)
    n0 = buckets[0].cam_idx.shape[1]
    tabs = []
    ids = {}
    term_ix = []
    for A, B, sign in terms:
        for M in (A, B):
            if id(M) not in ids:
                ids[id(M)] = len(tabs)
                tabs.append(M if isinstance(M, (tuple, list))
                            else M.reshape(M.shape[0], -1))
        K = (A[0].shape[1] // (9 * n0)
             if isinstance(A, (tuple, list)) else A.shape[1])
        term_ix.append((ids[id(A)], ids[id(B)], sign, K))

    def row_fn_runs(slices, width):
        out = None
        for ia, ib, sign, K in term_ix:
            prod = _outer81_fold(slices[ia], slices[ib], width)
            prod = prod if sign == 1.0 else sign * prod
            out = prod if out is None else out + prod
        return out

    return _strip_run_rows(buckets, strips, tabs, None, 81,
                           row_fn_runs=row_fn_runs)




def _ww_sandwich_U(q1, q2, p1):
    """Per-slot U = (q1 q2')' p1 for the W'W sandwich (see
    sqrt_ww_pair_strips): q1/q2 [rows, 6] Q1h slot strips (2 residual
    rows x 3 landmark cols, r-major), p1 [rows, 18] Jp strips (2 rows
    x 9, r-major). Returns [rows, 18] slot-major U with
    u_s = sum_r M[r, s] p1_r,  M = q1 q2' (2x2). All 2-D elementwise."""
    m00 = jnp.sum(q1[:, :3] * q2[:, :3], axis=1)[:, None]
    m01 = jnp.sum(q1[:, :3] * q2[:, 3:], axis=1)[:, None]
    m10 = jnp.sum(q1[:, 3:] * q2[:, :3], axis=1)[:, None]
    m11 = jnp.sum(q1[:, 3:] * q2[:, 3:], axis=1)[:, None]
    u0 = m00 * p1[:, :9] + m10 * p1[:, 9:]
    u1 = m01 * p1[:, :9] + m11 * p1[:, 9:]
    return jnp.concatenate([u0, u1], axis=1)


def sqrt_ww_pair_strips(q_tabs, jp_tabs, buckets,
                        strips: PairStripsIndex) -> jnp.ndarray:
    """Pair blocks sum W_i' W_j of the sqrt RCS WITHOUT materializing
    W = Q1h'Jp: per pair slot,

        W_i' W_j = Jp_i' (Q1h_i Q1h_j') Jp_j

    -- a 2x2 sandwich M = Q1h_i Q1h_j' on the VPU, then one run-folded
    MXU pass (_outer81_fold) of U = M' Jp_i against Jp_j. This is the
    LARGE-problem assembly mode: it trades 2x the slot gathers (Q1h +
    Jp rows instead of one W row; measured 13% slower at venice) for
    never holding the [sum L, n*27] W tables -- 3.6 GB at final-13682,
    the difference between its assembly fitting 16 GB HBM and a
    runtime OOM (measured).

    q_tabs / jp_tabs: per-bucket [L, n*6] / [L, n*18] tables (the
    strips index must be leftover-free, i.e. built with min_group=0).
    Returns [P, 81] in the same pair order as csr_pair_outer_strips."""
    if strips.wi_idx.shape[0]:
        raise ValueError("sqrt_ww_pair_strips requires a leftover-free "
                         "strips index (min_group=0)")
    rows_parts = []
    for g in range(len(strips.group_bucket)):
        bi = strips.group_bucket[g]
        i, j = strips.group_i[g], strips.group_j[g]
        L, n = buckets[bi].cam_idx.shape
        lm = strips.lm_idx[g]
        sw = strips.swap[g]
        tq = q_tabs[bi]
        tj = jp_tabs[bi]

        gsz = lm.shape[0]
        chunk = max(PAIR_WIDTH,
                    min(gsz, _PAIR_CHUNK_BYTES // (n * 24 * 4)))
        chunk = chunk // PAIR_WIDTH * PAIR_WIDTH
        npad = -(-gsz // chunk) * chunk
        if npad != gsz:
            lm = jnp.concatenate(
                [lm, jnp.full((npad - gsz,), L, jnp.int32)])
            sw = jnp.concatenate(
                [sw, jnp.zeros((npad - gsz,), bool)])

        def one(args, i=i, j=j, tq=tq, tj=tj):
            lm_c, sw_c = args
            gq = jnp.take(tq, lm_c, axis=0, mode="fill",
                          fill_value=0.0)
            gj = jnp.take(tj, lm_c, axis=0, mode="fill",
                          fill_value=0.0)
            qi = gq[:, i * 6:(i + 1) * 6]
            qj = gq[:, j * 6:(j + 1) * 6]
            ji = gj[:, i * 18:(i + 1) * 18]
            jj = gj[:, j * 18:(j + 1) * 18]
            # canonical order: first side on the lower camera id
            q1 = jnp.where(sw_c[:, None], qj, qi)
            q2 = jnp.where(sw_c[:, None], qi, qj)
            p1 = jnp.where(sw_c[:, None], jj, ji)
            p2 = jnp.where(sw_c[:, None], ji, jj)
            U = _ww_sandwich_U(q1, q2, p1)
            return _outer81_fold(U, p2, PAIR_WIDTH)

        nch = npad // chunk
        if nch == 1:
            rows_g = one((lm, sw))
        else:
            rows_g = jax.lax.map(
                one, (lm.reshape(nch, chunk),
                      sw.reshape(nch, chunk))
            ).reshape(npad // PAIR_WIDTH, 81)
        rows_parts.append(rows_g[:gsz // PAIR_WIDTH])

    rows = (rows_parts[0] if len(rows_parts) == 1
            else jnp.concatenate(rows_parts, axis=0))
    rows = jnp.concatenate(
        [rows, jnp.zeros((1, 81), rows.dtype)], axis=0)
    return _level2_reduce(rows, strips.idx2)  # [P, 81]


def sqrt_ww_diag_strips(q_tabs, jp_tabs, buckets,
                        strips: CamStripsIndex) -> jnp.ndarray:
    """Per-camera diagonal blocks Jp'Jp - W'W of the sqrt RCS without
    materializing W (same sandwich as sqrt_ww_pair_strips with i = j):
    returns [N, 81]."""

    def row_fn_runs(slices, width):
        q, p = slices
        U = _ww_sandwich_U(q, q, p)
        return (_outer81_fold(p, p, width)
                - _outer81_fold(U, p, width))

    return _strip_run_rows(buckets, strips, [q_tabs, jp_tabs], None,
                           81, row_fn_runs=row_fn_runs)



@jax.tree_util.register_pytree_node_class
class BsrMatvecIndex:
    """Device copy of bucketing.BsrMatvec (see its docstring).

    blk_idx/col_idx are stored FLAT [R*width] (width static aux): a
    2-D [R, width<=16] i32 table tile-pads its minor dim to 128 --
    16x resident bytes, 2x 2.3 GB at final-13682's 36M matvec entries.
    Consumers reshape per chunk."""

    def __init__(self, blk_idx, col_idx, idx2, width):
        self.blk_idx = blk_idx  # [R*width] int32 flat (pad = 2P)
        self.col_idx = col_idx  # [R*width] int32 flat (pad = N)
        self.idx2 = idx2  # [N, vmax] int32 (pad = R)
        self.width = width

    def tree_flatten(self):
        return ((self.blk_idx, self.col_idx, self.idx2), (self.width,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    @property
    def shape2d(self):
        return (self.blk_idx.shape[0] // self.width, self.width)

    @staticmethod
    def from_host(bm) -> "BsrMatvecIndex":
        return BsrMatvecIndex(
            blk_idx=jnp.asarray(np.asarray(bm.blk_idx).reshape(-1)),
            col_idx=jnp.asarray(np.asarray(bm.col_idx).reshape(-1)),
            idx2=jnp.asarray(bm.idx2),
            width=int(np.asarray(bm.blk_idx).shape[1]))


def _table_dtype(t):
    if isinstance(t, StreamFactors):
        return t.dtype
    if isinstance(t, (tuple, list)):
        return t[0].dtype
    return t.dtype


def _scale_neg_chunked(Hup, pose_scale, pair_row, pair_col):
    """-S_i Hup S_j applied IN PLACE over the [P, 81] pair table via a
    chunked fori_loop on the aliased carry (one resident copy; the
    whole-table expression form doubles the peak by the table size --
    8.6 GB at final-13682's 18M clustered pairs)."""
    P9_ = POSE_SIZE
    P = Hup.shape[0]
    C = min(P, max(1, (1 << 23) // 81))

    def xform(rows, start, size):
        if pose_scale is not None:
            pr = jax.lax.dynamic_slice_in_dim(pair_row, start, size)
            pc = jax.lax.dynamic_slice_in_dim(pair_col, start, size)
            Sp = jnp.take(pose_scale, pr, axis=0)
            Sc = jnp.take(pose_scale, pc, axis=0)
            rows = rows * (jnp.repeat(Sp, P9_, axis=1)
                           * jnp.tile(Sc, (1, P9_)))
        return -rows

    nfull = P // C
    tail = P - nfull * C
    if tail:
        # static-size tail chunk first: the main loop reads from the
        # partially-transformed buffer, so chunks must never overlap
        rows = jax.lax.dynamic_slice_in_dim(Hup, nfull * C, tail,
                                            axis=0)
        Hup = jax.lax.dynamic_update_slice_in_dim(
            Hup, xform(rows, nfull * C, tail), nfull * C, axis=0)

    def step(i, buf):
        start = i * C
        rows = jax.lax.dynamic_slice_in_dim(buf, start, C, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            buf, xform(rows, start, C), start, axis=0)

    return jax.lax.fori_loop(0, nfull, step, Hup)


def assemble_rcs_bsr(strip_a, strip_b, diag_terms, cam_flat, csr,
                     pairs, lam, num_cameras, buckets=None,
                     cam_strips=None, pose_scale=None,
                     pair_rows=None, diag81=None, symmetric=False):
    """Block-sparse RCS assembly: the same per-pair / per-camera
    gather-reduces as assemble_rcs_dense, WITHOUT the densify -- for
    problems whose dense [9G, 9G] system exceeds HBM (60 GB at
    final-13682) but whose unique-camera-pair count is small (~179k
    there, 0.2% fill).

    Returns (blocks2, diag_blocks):
      blocks2 [2P+?, 81] = [-H_up; -H_up'] -- the off-diagonal block
        table the BSR matvec gathers (transpose = one static column
        permutation, done here once per stage2, not per CG iteration);
      diag_blocks [N, 9, 9] = per-camera diagonal + lam I (also the
        SCHUR_JACOBI preconditioner).
    """
    P9_ = POSE_SIZE
    dtype = _table_dtype(strip_a)
    N = num_cameras
    lam = lam.astype(dtype)

    if pair_rows is not None:
        Hup = pair_rows
    elif isinstance(pairs, (PairStripsIndex, PairStreamIndex)):
        Hup = csr_pair_outer_strips(strip_a, strip_b, buckets, pairs)
    else:
        Hup = csr_pair_outer(strip_a, strip_b, pairs)  # [P, 81]

    if diag81 is not None:
        pass
    elif cam_strips is not None:
        diag81 = cam_gram_strips(diag_terms, buckets, cam_strips)
    elif csr is not None:
        view = _SelfPairView.of(csr)
        diag81 = jnp.zeros((N, P9_ * P9_), dtype)
        for A, B, sign in diag_terms:
            g = csr_pair_outer(A, B, view)
            diag81 = diag81 + sign * g
    else:
        dcon = jnp.zeros((strip_a.shape[0], P9_ * P9_), dtype)
        for A, B, sign in diag_terms:
            prod = jnp.sum(A[:, :, :, None] * B[:, :, None, :], axis=1)
            dcon = dcon + sign * prod.reshape(-1, P9_ * P9_)
        diag81 = jax.ops.segment_sum(dcon, cam_flat, num_segments=N)

    if pose_scale is not None:
        diag81 = diag81 * (jnp.repeat(pose_scale, P9_, axis=1)
                           * jnp.tile(pose_scale, (1, P9_)))

    diag = diag81.reshape(N, P9_, P9_) + lam * jnp.eye(P9_, dtype=dtype)
    if symmetric:
        # half storage: [P, 81] strict-pair blocks only; the matvec
        # (bsr_matvec_sym) applies the transpose direction from the
        # same table. Halves the dominant HBM buffer -- final-13682's
        # clustered pair density makes the [2P, 81] form 11.7 GB.
        # Scale+negate run IN PLACE over the accumulator (chunked
        # fori_loop on the aliased carry): a whole-table
        # `Hup * scale_rows` expression doubles the peak by the full
        # 8.6 GB table at final-13682 (r5 OOM)
        return _scale_neg_chunked(Hup, pose_scale, pairs.pair_row,
                                  pairs.pair_col), diag
    # deferred jacobi pose scale (see sqrt_flat.FlatLin):
    # H_ij <- S_i H_u,ij S_j applied at the [P, 81] level, fused into
    # the chunked blocks2 fill (no scaled-Hup intermediate)
    perm_t = jnp.asarray(
        np.arange(81).reshape(P9_, P9_).T.reshape(-1), jnp.int32)
    P = Hup.shape[0]
    blocks2 = jnp.zeros((2 * P, 81), dtype)
    C = min(P, max(1, (1 << 23) // 81))

    def fill(start, buf):
        rows = jax.lax.dynamic_slice_in_dim(Hup, start, C, axis=0)
        if pose_scale is not None:
            pr = jax.lax.dynamic_slice_in_dim(pairs.pair_row, start, C)
            pc = jax.lax.dynamic_slice_in_dim(pairs.pair_col, start, C)
            Sp = jnp.take(pose_scale, pr, axis=0)
            Sc = jnp.take(pose_scale, pc, axis=0)
            rows = rows * (jnp.repeat(Sp, P9_, axis=1)
                           * jnp.tile(Sc, (1, P9_)))
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, -rows, start, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            buf, -jnp.take(rows, perm_t, axis=1), P + start, axis=0)

    nfull = P // C
    blocks2 = jax.lax.fori_loop(
        0, nfull, lambda i, b: fill(i * C, b), blocks2)
    if P % C:
        # tail chunk: dynamic_slice clamps the start so the last C
        # rows are re-read; re-writing them with the same values is
        # idempotent (no double-scale: fill always reads from the
        # unscaled Hup)
        blocks2 = fill(P - C, blocks2)
    return blocks2, diag


def bsr_matvec(blocks2: jnp.ndarray, diag: jnp.ndarray,
               bsr: BsrMatvecIndex, x: jnp.ndarray) -> jnp.ndarray:
    """y = H x against the block-sparse RCS (blocks2, diag) from
    assemble_rcs_bsr: per entry, gather the [81] off-diagonal block and
    the source camera's x row, multiply-reduce on the VPU, sum the
    fixed-width runs, idx2 per camera; plus the diagonal-block product.
    The role sc_matvec_dense plays in the dense mode, at any camera
    count (~2P gathered rows per application, no [9G, 9G] matrix)."""
    P9_ = POSE_SIZE
    N = x.shape[0]
    R, W = bsr.shape2d
    # row-chunked like csr_cam_reduce: one chunk's [cW, 81+9]
    # transients live at a time
    chunk = max(1, min(R, (512 << 10) // max(W, 1)))
    Rpad = -(-R // chunk) * chunk
    bidx, cidx = bsr.blk_idx, bsr.col_idx
    if Rpad != R:
        pad = (Rpad - R) * W
        bidx = jnp.concatenate(
            [bidx, jnp.full((pad,), blocks2.shape[0], jnp.int32)])
        cidx = jnp.concatenate(
            [cidx, jnp.full((pad,), N, jnp.int32)])

    def chunk_sum(ix):
        bi, ci = ix
        Hb = jnp.take(blocks2, bi, axis=0, mode="fill",
                      fill_value=0.0)  # [cW, 81]
        xg = jnp.take(x, ci, axis=0, mode="fill",
                      fill_value=0.0)  # [cW, 9]
        # y_e[a] = sum_b Hb[e, a*9+b] xg[e, b] (VPU mult-sum; the
        # einsum dot would route through the MXU at bf16 precision)
        prod = jnp.sum(Hb.reshape(-1, P9_, P9_) * xg[:, None, :],
                       axis=2)  # [cW, 9]
        return jnp.sum(prod.reshape(chunk, W, P9_), axis=1)

    nchunks = Rpad // chunk
    if nchunks == 1:
        rsum = chunk_sum((bidx, cidx))
    else:
        rsum = jax.lax.map(
            chunk_sum,
            (bidx.reshape(nchunks, chunk * W),
             cidx.reshape(nchunks, chunk * W))).reshape(Rpad, P9_)
    rsum = jnp.concatenate(
        [rsum[:R], jnp.zeros((1, P9_), rsum.dtype)], axis=0)
    y_off = _level2_reduce(rsum, bsr.idx2)  # [N, 9]
    y_diag = jnp.sum(diag * x[:, None, :], axis=2)
    return y_diag + y_off


def bsr_matvec_pack(blocks2: jnp.ndarray,
                    bsr: BsrMatvecIndex) -> jnp.ndarray:
    """Run-major packed block table [R*W, 81] for bsr_matvec_packed:
    gather the [R, W] block entries ONCE per stage2 (pad entries ->
    zero blocks).

    Why: bsr_matvec re-gathers the blocks on every application; inside
    a CG loop that measured 1.17 ms/matvec at venice (~30x the traffic
    roofline of its r4 block table). The packed form is loop-invariant
    (XLA hoists it out of the CG while-loop); each application then
    streams the table with row slices -- no gathers. Kept strictly
    2-D: an r5 venice run showed the old [R, W, 9, 9] form tile-pads
    (8,128) over the trailing 9x9 to 16x its bytes (545 MB -> 8.51 GB,
    HBM OOM at the clustered twin's 878k pairs)."""
    Hb = jnp.take(blocks2, bsr.blk_idx, axis=0,
                  mode="fill", fill_value=0.0)  # [R*W, 81]
    return Hb


def bsr_matvec_packed(packed: jnp.ndarray, diag: jnp.ndarray,
                      bsr: BsrMatvecIndex, x: jnp.ndarray) -> jnp.ndarray:
    """y = H x with the packed run-major block table: one x-row gather
    (tiny fast source), chunked VPU block-row products over table row
    SLICES (gather-free, fused through the [*, 81] -> [*, 9, 9]
    reshape), width-run sums, the camera-level idx2 reduce, plus the
    diagonal product. Numerically equal to bsr_matvec up to f32
    reassociation."""
    P9_ = POSE_SIZE
    R, W = bsr.shape2d
    chunk = max(1, min(R, (512 << 10) // max(W, 1)))
    nfull = R // chunk
    tail = R - nfull * chunk

    def chunk_sum(Hb, ci, nruns):
        # per-chunk x gather (x is a tiny fast source): a whole-table
        # [R*W, 9] gather lane-pads 14x -- 4.45 GB inside the CG loop
        # at final-4585's 9.3M entries (r5 OOM)
        xc = jnp.take(x, ci, axis=0, mode="fill", fill_value=0.0)
        prod = jnp.sum(Hb.reshape(-1, P9_, P9_) * xc[:, None, :],
                       axis=2)  # [cW, 9]
        return jnp.sum(prod.reshape(nruns, W, P9_), axis=1)

    parts = []
    if nfull:
        # fori_loop + dynamic slices, NOT lax.map over a reshaped
        # table: scan xs materialize a full reshaped copy of the
        # packed table (and double-buffer it) -- ~6 GB of the CG
        # program's temps at final-4585's 3.0 GB table. The loop body
        # reads the table arg in place, one [chunk*W, 81] transient at
        # a time.
        def body(i, acc):
            start = i * (chunk * W)
            Hb = jax.lax.dynamic_slice_in_dim(
                packed, start, chunk * W, axis=0)
            ci = jax.lax.dynamic_slice_in_dim(
                bsr.col_idx, start, chunk * W)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, chunk_sum(Hb, ci, chunk), i * chunk, axis=0)

        main = jax.lax.fori_loop(
            0, nfull, body,
            jnp.zeros((nfull * chunk, P9_), packed.dtype))
        parts.append(main)
    if tail:
        parts.append(chunk_sum(
            jax.lax.slice_in_dim(packed, nfull * chunk * W, R * W,
                                 axis=0),
            jax.lax.slice_in_dim(bsr.col_idx, nfull * chunk * W,
                                 R * W), tail))
    parts.append(jnp.zeros((1, P9_), packed.dtype))
    rsum = jnp.concatenate(parts, axis=0)
    y_off = _level2_reduce(rsum, bsr.idx2)  # [N, 9]
    y_diag = jnp.sum(diag * x[:, None, :], axis=2)
    return y_diag + y_off


def bsr_pack_from_half(half: jnp.ndarray,
                       bsr: BsrMatvecIndex) -> jnp.ndarray:
    """Run-major packed [R*W, 81] table built directly from the
    strict-pair HALF table [P, 81] (assemble_rcs_bsr symmetric=True):
    entries with blk_idx >= P gather the same strict-pair row and
    apply the 9x9 block transpose as a static column permutation; pad
    entries (blk_idx >= 2P) land out of range of the half table and
    fill 0.

    Replaces the stage2 [2P, 81] both-direction intermediate + the
    lsolve-side bsr_matvec_pack re-gather: at final-4585's 4.65M
    clustered pairs those were 3.0 GB of blocks2 plus ~8.9 GB of
    packed-copy temps inside the CG program (the r5 runtime OOM --
    XLA holds the pack result and its layout copy across the while
    loop). Chunked fills into one preallocated output keep the peak
    at the output + one [C, 81] transient."""
    P = half.shape[0]
    E = bsr.blk_idx.shape[0]
    perm_t = jnp.asarray(
        np.arange(81).reshape(POSE_SIZE, POSE_SIZE).T.reshape(-1),
        jnp.int32)
    out = jnp.zeros((E, 81), half.dtype)
    C = min(E, max(1, (1 << 23) // 81))

    def fill(start, buf):
        bi = jax.lax.dynamic_slice_in_dim(bsr.blk_idx, start, C)
        tr = bi >= P
        idx = jnp.where(tr, bi - P, bi)
        rows = jnp.take(half, idx, axis=0, mode="fill", fill_value=0.0)
        rows = jnp.where(tr[:, None],
                         jnp.take(rows, perm_t, axis=1), rows)
        return jax.lax.dynamic_update_slice_in_dim(
            buf, rows, start, axis=0)

    nfull = E // C
    out = jax.lax.fori_loop(0, nfull, lambda i, b: fill(i * C, b), out)
    if E % C:
        # tail chunk re-reads the last C entries; fill reads only from
        # half/blk_idx, so the rewrite is idempotent
        out = fill(E - C, out)
    return out


def bsr_build_table(half: jnp.ndarray, bsr: BsrMatvecIndex,
                    symmetric: bool) -> jnp.ndarray:
    """stage2-side BSR table finalization: the half table itself in
    the symmetric regime, the packed run-major expansion otherwise
    (packing here -- once per stage2, chunked -- instead of inside the
    CG program keeps the [2P, 81] form out of existence entirely)."""
    return half if symmetric else bsr_pack_from_half(half, bsr)


def bsr_table_matvec(table: jnp.ndarray, diag: jnp.ndarray,
                     bsr: BsrMatvecIndex, symmetric: bool):
    """Matvec closure over a bsr_build_table result (the lsolve-side
    counterpart; both regimes are gather-bounded per application:
    sym gathers [P,81] rows, packed streams row slices)."""
    if symmetric:
        return lambda x: bsr_matvec_sym(table, diag, bsr, x)
    return lambda x: bsr_matvec_packed(table, diag, bsr, x)


def bsr_symmetric_fits(bsr: BsrMatvecIndex, itemsize: int,
                       max_pack_bytes: int) -> bool:
    """True when the packed run-major table would exceed the byte
    budget, i.e. the stage2 assembly should emit the symmetric-half
    [P, 81] block table and the matvec should run bsr_matvec_sym.
    Static decision (index shapes known at build time)."""
    return bsr.blk_idx.shape[0] * 81 * itemsize > max_pack_bytes


def bsr_matvec_sym(blocks: jnp.ndarray, diag: jnp.ndarray,
                   bsr: BsrMatvecIndex, x: jnp.ndarray) -> jnp.ndarray:
    """y = H x against the HALF-stored BSR table [P, 81] (strict pairs
    only, assemble_rcs_bsr(symmetric=True)): entries with
    blk_idx >= P are the transpose direction and contract the gathered
    block transposed -- same gathered bytes as bsr_matvec, 2x the (VPU,
    cheap) flops, half the resident block table. The reference stores
    both directions (BlockSparseMatrix add(i,j)+add(j,i)); the half
    table is the HBM-bound TPU equivalent."""
    P9_ = POSE_SIZE
    N = x.shape[0]
    R, W = bsr.shape2d
    P = blocks.shape[0]
    chunk = max(1, min(R, (512 << 10) // max(W, 1)))
    Rpad = -(-R // chunk) * chunk
    bidx, cidx = bsr.blk_idx, bsr.col_idx
    if Rpad != R:
        pad = (Rpad - R) * W
        bidx = jnp.concatenate(
            [bidx, jnp.full((pad,), 2 * P, jnp.int32)])
        cidx = jnp.concatenate(
            [cidx, jnp.full((pad,), N, jnp.int32)])

    def chunk_sum(ix):
        flat_b, ci = ix
        tr = flat_b >= P
        idx = jnp.where(tr, flat_b - P, flat_b)
        Hb = jnp.take(blocks, idx, axis=0, mode="fill",
                      fill_value=0.0)  # [cW, 81]
        xg = jnp.take(x, ci, axis=0, mode="fill",
                      fill_value=0.0)  # [cW, 9]
        Hm = Hb.reshape(-1, P9_, P9_)
        prod_s = jnp.sum(Hm * xg[:, None, :], axis=2)       # H x
        prod_t = jnp.sum(Hm * xg[:, :, None], axis=1)       # H' x
        prod = jnp.where(tr[:, None], prod_t, prod_s)
        return jnp.sum(prod.reshape(chunk, W, P9_), axis=1)

    nchunks = Rpad // chunk
    if nchunks == 1:
        rsum = chunk_sum((bidx, cidx))
    else:
        rsum = jax.lax.map(
            chunk_sum,
            (bidx.reshape(nchunks, chunk * W),
             cidx.reshape(nchunks, chunk * W))).reshape(Rpad, P9_)
    rsum = jnp.concatenate(
        [rsum[:R], jnp.zeros((1, P9_), rsum.dtype)], axis=0)
    y_off = _level2_reduce(rsum, bsr.idx2)  # [N, 9]
    y_diag = jnp.sum(diag * x[:, None, :], axis=2)
    return y_diag + y_off


def make_bsr_matvec(blocks, diag, bsr: BsrMatvecIndex,
                    max_pack_bytes: int):
    """Matvec closure over the BSR system. Two regimes by a static
    byte budget: under it, the full [2P, 81] table is packed run-major
    (a second full copy; 3.5x faster CG iterations at venice scale,
    569 MB packed); over it, stage2 emitted the symmetric-half [P, 81]
    table (assemble_rcs_bsr(symmetric=True)) and each application
    contracts both directions from it (final-13682's clustered pair
    density puts the [2P, 81] form at 11.7 GB -- packing would double
    that past the 16 GB chip)."""
    if bsr_symmetric_fits(bsr, blocks.dtype.itemsize, max_pack_bytes):
        return lambda x: bsr_matvec_sym(blocks, diag, bsr, x)
    packed = bsr_matvec_pack(blocks, bsr)
    return lambda x: bsr_matvec_packed(packed, diag, bsr, x)


class _SelfPairView(NamedTuple):
    """Adapter presenting a CamCsrIndex as a pair index whose two sides
    are the same observation (for per-camera gram reductions through
    csr_pair_outer, which then gathers each strip row once and fuses
    the 81-wide products into the reduce -- no [O,81] materialization)."""

    wi_idx: jnp.ndarray
    wj_idx: jnp.ndarray
    idx2: jnp.ndarray

    @staticmethod
    def of(csr: CamCsrIndex) -> "_SelfPairView":
        return _SelfPairView(wi_idx=csr.idx, wj_idx=csr.idx,
                             idx2=csr.idx2)


def assemble_rcs_dense(strip_a, strip_b, diag_terms, cam_flat, csr,
                       pairs, lam, num_cameras, buckets=None,
                       cam_strips=None, pose_scale=None,
                       pair_rows=None, diag81=None):
    """Dense [9N, 9N] reduced camera system from per-obs factors:

        H = sum over a camera's obs of (sum_terms sign * A_i' B_i)
                                                on the block diagonal
            - strip_a_i' strip_b_j  at off-diagonal camera pairs
            + lam I

    diag_terms is a list of (A [O,K,9], B [O,K,9], sign); the upper
    camera triangle is assembled once via csr_pair_outer and the lower
    mirrored by block transpose. Returns (H_dense, diag_blocks) with
    diag_blocks = the per-camera [N,9,9] diagonal (the SCHUR_JACOBI
    preconditioner, free).

    TPU replacement for both the reference's implicit QR operator
    (linearization_qr.hpp:823-825) and the block-sparse SC hash map
    (cg/block_sparse_matrix.hpp:150-310): one assembly per stage2 buys
    gather-free HBM/MXU GEMV CG iterations.
    """
    P9_ = POSE_SIZE
    dtype = _table_dtype(strip_a)
    N = num_cameras
    lam = lam.astype(dtype)

    if pair_rows is not None:
        Hup = pair_rows
    elif isinstance(pairs, (PairStripsIndex, PairStreamIndex)):
        Hup = csr_pair_outer_strips(strip_a, strip_b, buckets, pairs)
    else:
        Hup = csr_pair_outer(strip_a, strip_b, pairs)  # [P, 81]

    if diag81 is not None:
        pass
    elif cam_strips is not None:
        diag81 = cam_gram_strips(diag_terms, buckets, cam_strips)
    elif csr is not None:
        view = _SelfPairView.of(csr)
        diag81 = jnp.zeros((N, P9_ * P9_), dtype)
        for A, B, sign in diag_terms:
            g = csr_pair_outer(A, B, view)
            diag81 = diag81 + sign * g
    else:
        dcon = jnp.zeros((strip_a.shape[0], P9_ * P9_), dtype)
        for A, B, sign in diag_terms:
            prod = jnp.sum(A[:, :, :, None] * B[:, :, None, :], axis=1)
            dcon = dcon + sign * prod.reshape(-1, P9_ * P9_)
        diag81 = jax.ops.segment_sum(dcon, cam_flat, num_segments=N)

    if pose_scale is not None:
        # deferred jacobi pose scale (see sqrt_flat.FlatLin):
        # H_ij <- S_i H_u,ij S_j applied at the [P, 81]/[N, 81] level
        Sp = jnp.take(pose_scale, pairs.pair_row, axis=0)
        Sc = jnp.take(pose_scale, pairs.pair_col, axis=0)
        Hup = Hup * (jnp.repeat(Sp, P9_, axis=1)
                     * jnp.tile(Sc, (1, P9_)))
        diag81 = diag81 * (jnp.repeat(pose_scale, P9_, axis=1)
                           * jnp.tile(pose_scale, (1, P9_)))

    # Everything below stays in 2-D [rows, 81] / [9N, 9N] shapes: any
    # materialized [..., 9, 9] tensor tile-pads (8,128) on the minor
    # dims, a ~25x memory blowup (26 GB for the [N,N,9,9] densify
    # transpose at venice scale).
    zero = jnp.zeros((1, P9_ * P9_), dtype)
    up = jnp.concatenate([-Hup, zero], axis=0)
    # block transpose as a static column permutation of [P, 81]
    perm_t = jnp.asarray(
        np.arange(81).reshape(P9_, P9_).T.reshape(-1), jnp.int32)
    Hup_t = jnp.take(Hup, perm_t, axis=1)
    lo = jnp.concatenate([-Hup_t, zero], axis=0)
    # the dense block tables may live on a padded [G, G] camera grid
    # (G = lane-padded camera count for the VMEM CG kernel)
    G = int(np.sqrt(pairs.up_idx.shape[0]))
    dense81 = up[pairs.up_idx] + lo[pairs.lo_idx]  # [G*G, 81]
    diag_ids = jnp.arange(N, dtype=jnp.int32) * (G + 1)
    dense81 = dense81.at[diag_ids].add(diag81)
    # feature-major ("z-space") dense matrix: Hz[a*G+i, b*G+j] =
    # block(i,j)[a,b]. The transpose chain touches only 2-D or
    # (G,G)-minor shapes; sc_matvec_dense reorders x accordingly.
    Hz = dense81.T.reshape(P9_, P9_, G, G)
    Hz = Hz.transpose(0, 2, 1, 3).reshape(G * P9_, G * P9_)
    Hz = Hz + lam * jnp.eye(G * P9_, dtype=dtype)

    diag = diag81.reshape(N, P9_, P9_) + lam * jnp.eye(P9_, dtype=dtype)
    return Hz, diag


def packed_cam_table(cams: CamState) -> jnp.ndarray:
    """Pack per-camera parameters into one gather-friendly [N, 16]
    table (cols: q[4], t[3], intr[3], zero pad). One 16-wide row gather
    per bucket replaces ~10 separate 1-D parameter gathers, which XLA
    lowers to individually latency-bound gathers."""
    N = cams.q.shape[0]
    pad = jnp.zeros((N, 6), cams.q.dtype)
    return jnp.concatenate([cams.q, cams.t, cams.intr, pad], axis=1)


def gather_cam_planes(table: jnp.ndarray, idx_flat: jnp.ndarray):
    """Gather packed camera rows for flat obs slots -> 10 [O] planes
    (qw,qx,qy,qz, tx,ty,tz, f,k1,k2)."""
    rows = table[idx_flat]  # [O,16]
    return tuple(rows[:, i] for i in range(10))


class LinBucket(NamedTuple):
    """Linearized (stage-1) data of one bucket."""

    Jp: jnp.ndarray  # [L,n,2,9] sqrt-weighted, masked, maybe pose-scaled
    Jl: jnp.ndarray  # [L,n,2,3] sqrt-weighted, masked, Jl-col-scaled
    r: jnp.ndarray  # [L,n,2]
    Jl_scale: jnp.ndarray  # [L,3] (1/(eps+||col||))


def linearize_bucket(
    cams: CamState,
    lm_p: jnp.ndarray,
    bucket: BucketIndex,
    robust_norm: int,
    huber_parameter: float,
    use_valid_projections_only: bool,
    jacobi_scaling_eps: float,
):
    """Linearize one bucket. Returns (LinBucket-without-Jl-scaling
    applied yet, num_valid_failures).

    Implemented over flat [O = L*n] component vectors (the scalarized
    planes of ops.planar.snavely_planes): intermediates with small
    trailing dims like [L,n,2,3] inflate ~20-50x under TPU (8,128)
    tiling when materialized; flat [O] planes pad negligibly. Only the
    final Jacobian tensors are assembled into the [L,n,2,9] layout.
    """
    from rootba_tpu.ops.planar import robust_sqrt_weight, snavely_planes

    L, n = bucket.cam_idx.shape
    idx = bucket.cam_idx.reshape(-1)  # [O]
    cam_planes = gather_cam_planes(packed_cam_table(cams), idx)
    X = jnp.broadcast_to(lm_p[:, 0:1], (L, n)).reshape(-1)
    Y = jnp.broadcast_to(lm_p[:, 1:2], (L, n)).reshape(-1)
    Z = jnp.broadcast_to(lm_p[:, 2:3], (L, n)).reshape(-1)

    res_u, res_v, valid, Jp_planes, Jl_planes = snavely_planes(
        *cam_planes,
        X, Y, Z,
        bucket.obs_uv[..., 0].reshape(-1),
        bucket.obs_uv[..., 1].reshape(-1))
    sw, use_mask = robust_sqrt_weight(
        res_u, res_v, valid, bucket.mask.reshape(-1), robust_norm,
        huber_parameter, use_valid_projections_only)

    # numerical validity over used slots (reference
    # landmark_block_base.ipp:120-125): any non-finite J/res is failure
    finite = jnp.isfinite(res_u) & jnp.isfinite(res_v)
    for v in Jp_planes + Jl_planes:
        finite = finite & jnp.isfinite(v)
    num_failures = jnp.sum(jnp.where(use_mask & ~finite, 1, 0))

    # assemble outputs (planes stacked on the last axis -> XLA output
    # layout assignment keeps these efficient)
    Jp = jnp.stack([sw * v for v in Jp_planes],
                   axis=-1).reshape(L, n, 2, POSE_SIZE)
    Jl = jnp.stack([sw * v for v in Jl_planes],
                   axis=-1).reshape(L, n, 2, 3)
    r = jnp.stack([sw * res_u, sw * res_v], axis=-1).reshape(L, n, 2)

    return LinBucket(Jp=Jp, Jl=Jl, r=r, Jl_scale=jnp.zeros(())), num_failures


def scale_jl_cols(lin: LinBucket, jacobi_scaling_eps: float) -> LinBucket:
    """Landmark-Jacobian column scaling 1/(eps + ||col||)
    (reference landmark_block_base.ipp:572-587), per landmark over all
    its (2n) rows."""
    L, n = lin.Jl.shape[0], lin.Jl.shape[1]
    cols = lin.Jl.reshape(L, 2 * n, 3)
    norms = jnp.linalg.norm(cols, axis=1)  # [L,3]
    scale = 1.0 / (jacobi_scaling_eps + norms)
    Jl = (cols * scale[:, None, :]).reshape(lin.Jl.shape)
    return lin._replace(Jl=Jl, Jl_scale=scale)


def jp_diag2(lin: LinBucket, cam_idx: jnp.ndarray, num_cameras: int):
    """Per-camera column squared norms of Jp (add_Jp_diag2,
    landmark_block_base.ipp: add_Jp_diag2), as a segment-sum."""
    contrib = jnp.sum(lin.Jp * lin.Jp, axis=-2)  # [L,n,9]
    return jax.ops.segment_sum(
        contrib.reshape(-1, POSE_SIZE),
        cam_idx.reshape(-1),
        num_segments=num_cameras,
    )


def jp_t_jp_blockdiag(lin: LinBucket, cam_idx: jnp.ndarray,
                      num_cameras: int):
    """Per-camera 9x9 Gram blocks of Jp (add_Jp_T_Jp_blockdiag), used
    by the JACOBI preconditioner of the QR solver."""
    blocks = jnp.einsum("lnri,lnrj->lnij", lin.Jp, lin.Jp)
    return jax.ops.segment_sum(
        blocks.reshape(-1, POSE_SIZE, POSE_SIZE),
        cam_idx.reshape(-1),
        num_segments=num_cameras,
    )


def scale_jp_cols(lin: LinBucket, cam_idx: jnp.ndarray,
                  pose_scale: jnp.ndarray) -> LinBucket:
    """Apply the per-camera 9-vector jacobi scaling to Jp columns
    (scale_Jp_cols, landmark_block_base.ipp:589-614)."""
    s = pose_scale[cam_idx]  # [L,n,9]
    return lin._replace(Jp=lin.Jp * s[..., None, :])


def compute_error_buckets(
    cams: CamState,
    lm_ps: Sequence[jnp.ndarray],
    buckets: Sequence[BucketIndex],
    robust_norm: int,
    huber_parameter: float,
) -> ResidualInfo:
    """Whole-problem cost evaluation (reference
    bal_bundle_adjustment_helper.cpp:67-109 compute_error), over flat
    [O] planes (see linearize_bucket for the layout rationale)."""
    from rootba_tpu.ops.planar import snavely_planes

    info = empty_residual_info()
    table = packed_cam_table(cams)
    for lm_p, bucket in zip(lm_ps, buckets):
        L, n = bucket.cam_idx.shape

        # row-chunked like every other 33.6M-slot chain (the ~10
        # residual-plane transients of all buckets otherwise coexist;
        # part of the final-13682 HBM envelope)
        def err_chunk(ts, n=n):
            lmp_c, cam_c, uv_c, mask_c = ts
            Lc = cam_c.shape[0]
            idx = cam_c.reshape(-1)
            X = jnp.broadcast_to(lmp_c[:, 0:1], (Lc, n)).reshape(-1)
            Y = jnp.broadcast_to(lmp_c[:, 1:2], (Lc, n)).reshape(-1)
            Z = jnp.broadcast_to(lmp_c[:, 2:3], (Lc, n)).reshape(-1)
            res_u, res_v, valid, _, _ = snavely_planes(
                *gather_cam_planes(table, idx), X, Y, Z,
                uv_c[..., 0].reshape(-1), uv_c[..., 1].reshape(-1),
                with_jacobians=False)
            res = jnp.stack([res_u, res_v], axis=-1)
            return accumulate_residual_info(
                res, valid, mask_c.reshape(-1), robust_norm,
                huber_parameter)

        tables = [lm_p, bucket.cam_idx, bucket.obs_uv, bucket.mask]
        budget_rows = max(8, (_ROW_CHUNK_SLOTS // max(n, 1)) // 8 * 8)
        if L <= budget_rows:
            info = join_residual_info(info, err_chunk(tables))
            continue
        C0 = L // budget_rows
        main = C0 * budget_rows
        stacked = tuple(
            t[:main].reshape((C0, budget_rows) + t.shape[1:])
            for t in tables)
        accs = jax.lax.map(lambda ts: err_chunk(list(ts)), stacked)
        from rootba_tpu.core.residuals import ResidualItem

        def sum_item(it):
            return ResidualItem(
                num_obs=jnp.sum(it.num_obs, axis=0),
                error=jnp.sum(it.error, axis=0),
                residual_sum=jnp.sum(it.residual_sum, axis=0))

        info = join_residual_info(info, ResidualInfo(
            all=sum_item(accs.all), valid=sum_item(accs.valid),
            is_numerically_valid=jnp.all(accs.is_numerically_valid)))
        if main != L:
            info = join_residual_info(
                info, err_chunk([t[main:] for t in tables]))
    return info


@jax.tree_util.register_pytree_node_class
class PairStreamIndex:
    """Device copy of bucketing.PairStream (see its docstring).
    (widths, stream_bucket, rows_sub) are STATIC aux data."""

    def __init__(self, widths, stream_bucket, rows_sub, wi_idx, wj_idx,
                 run_pair, pair_row, pair_col, up_idx, lo_idx):
        self.widths = widths
        self.stream_bucket = stream_bucket
        self.rows_sub = rows_sub
        self.wi_idx = wi_idx
        self.wj_idx = wj_idx
        self.run_pair = run_pair
        self.pair_row = pair_row
        self.pair_col = pair_col
        self.up_idx = up_idx
        self.lo_idx = lo_idx

    def tree_flatten(self):
        children = (self.wi_idx, self.wj_idx, self.run_pair,
                    self.pair_row, self.pair_col, self.up_idx,
                    self.lo_idx)
        aux = (self.widths, self.stream_bucket, self.rows_sub)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def num_pairs(self) -> int:
        return self.pair_row.shape[0]

    @staticmethod
    def from_host(ps) -> "PairStreamIndex":
        return PairStreamIndex(
            widths=tuple(ps.widths),
            stream_bucket=tuple(ps.stream_bucket),
            rows_sub=tuple(ps.rows_sub),
            wi_idx=tuple(jnp.asarray(x) for x in ps.wi_idx),
            wj_idx=tuple(jnp.asarray(x) for x in ps.wj_idx),
            run_pair=tuple(jnp.asarray(x) for x in ps.run_pair),
            pair_row=jnp.asarray(ps.pair_row),
            pair_col=jnp.asarray(ps.pair_col),
            up_idx=jnp.asarray(ps.up_idx),
            lo_idx=jnp.asarray(ps.lo_idx))


def _outer81_fold_chunked(s1, s2, width, max_runs=16384):
    """_outer81_fold with the run axis chunked under lax.map: the MXU
    fold's [R, K9, K9] wide intermediate tile-pads (27,27) -> (32,128)
    5.6x, so an unchunked 806k-run stream materializes 12.3 GB
    (final-4585 HBM OOM, r5). Chunks bound it to ~250 MB.

    On TPU/f32 the whole fold runs as a Pallas kernel instead: the
    wide intermediate never leaves VMEM, cutting per-run HBM traffic
    from ~16 KB (write+read the padded [R, 27, 27]) to the [R, 81]
    output row (see ops/pallas_fold.outer81_fold_pallas)."""
    from rootba_tpu.ops.pallas_fold import (
        outer81_fold_available,
        outer81_fold_pallas,
    )

    if outer81_fold_available(s1.dtype):
        return outer81_fold_pallas(s1, s2, width)
    R = s1.shape[0] // width
    if R <= max_runs:
        return _outer81_fold(s1, s2, width)
    K9 = s1.shape[1]
    Rpad = -(-R // max_runs) * max_runs
    if Rpad != R:
        pad = jnp.zeros(((Rpad - R) * width, K9), s1.dtype)
        s1 = jnp.concatenate([s1, pad], axis=0)
        s2 = jnp.concatenate([s2, pad], axis=0)
    nch = Rpad // max_runs
    out = jax.lax.map(
        lambda ab: _outer81_fold(ab[0], ab[1], width),
        (s1.reshape(nch, max_runs * width, K9),
         s2.reshape(nch, max_runs * width, K9)))
    return out.reshape(Rpad, 81)[:R]


class StreamFactors(NamedTuple):
    """Lazy W = Q1h x Jp factor tables for the stream reducers: the
    slot rows W27[o, c*9+a] = sum_r q[o, r*3+c] jp[o, r*9+a] are built
    AFTER the slot gather (24 gathered floats instead of 27) so the
    [O, 27] W table (3.1 GB at final-13682) never exists in HBM. Per
    bucket: q [L, n*6], jp [L, n*18]."""

    q: tuple
    jp: tuple

    @property
    def dtype(self):
        return self.q[0].dtype


def _stream_sub_tables(tables, bucket, rows_sub, start):
    """Dynamic-slice each [Lpad, n*K] table to [rows_sub, n*K] and
    reshape to the [rows_sub*n, K] slot table behind an optimization
    barrier: the barrier materializes the small sub-table so the slot
    gathers get XLA's fast small-source plan (the whole point of the
    stream tiling; gathering straight from the big table keeps the
    ~5x slower large-source plan)."""
    outs = []
    for t in tables:
        n = bucket.cam_idx.shape[1]
        if isinstance(t, tuple):
            outs.append(tuple(_stream_sub_tables(list(t), bucket,
                                                 rows_sub, start)))
            continue
        K = t.shape[1] // n
        sub = jax.lax.dynamic_slice_in_dim(t, start, rows_sub, axis=0)
        outs.append(jax.lax.optimization_barrier(
            sub.reshape(rows_sub * n, K)))
    return outs


def _gather_slot_rows(sub, idx):
    """Gather slot rows from a sub-table (or build fused-W rows from a
    (q, jp) sub-table pair; see StreamFactors)."""
    if isinstance(sub, tuple):
        q6, jp18 = sub
        g6 = jnp.take(q6, idx, axis=0, mode="fill", fill_value=0.0)
        g18 = jnp.take(jp18, idx, axis=0, mode="fill", fill_value=0.0)
        return (jnp.repeat(g6[:, :3], 9, axis=1)
                * jnp.tile(g18[:, :9], (1, 3))
                + jnp.repeat(g6[:, 3:], 9, axis=1)
                * jnp.tile(g18[:, 9:], (1, 3)))
    return jnp.take(sub, idx, axis=0, mode="fill", fill_value=0.0)


def _pad_stack_rows(t, Lpad):
    if isinstance(t, tuple):
        return tuple(_pad_stack_rows(x, Lpad) for x in t)
    L = t.shape[0]
    if L == Lpad:
        return t
    return jnp.concatenate(
        [t, jnp.zeros((Lpad - L,) + t.shape[1:], t.dtype)], axis=0)


def pair_outer_stream(strip_a, strip_b, buckets,
                      ps: PairStreamIndex) -> jnp.ndarray:
    """Strict-pair block-product reduction over the PairStream index:

        out[p, a*9+b] = sum over slots of pair p of
                        sum_k strip_a[first, k*9+a] strip_b[second, k*9+b]

    strip_a/strip_b are per-bucket tuples of [L_b, n_b*K*9] landmark
    tables (the tuple form of csr_pair_outer_strips). Structure-robust
    replacement for the pattern-grouped strips reduction: cost is
    O(slots) narrow fast-regime gathers regardless of covisibility
    regularity (see bucketing.PairStream)."""
    if isinstance(strip_a, StreamFactors):
        strip_a = tuple(zip(strip_a.q, strip_a.jp))
        strip_b = strip_a
        same = True
    else:
        same = strip_a is strip_b
        if isinstance(strip_b, StreamFactors):
            strip_b = tuple(zip(strip_b.q, strip_b.jp))
    dtype = (strip_a[0][0] if isinstance(strip_a[0], tuple)
             else strip_a[0]).dtype
    P = ps.num_pairs
    out = jnp.zeros((P + 1, 81), dtype)
    for t, bi in enumerate(ps.stream_bucket):
        W = ps.widths[t]
        ta, tb = strip_a[bi], strip_b[bi]
        rs = ps.rows_sub[t]
        wi, wj, rp = ps.wi_idx[t], ps.wj_idx[t], ps.run_pair[t]
        S, R, _ = wi.shape
        Lpad = S * rs
        ta_p = _pad_stack_rows(ta, Lpad)
        tb_p = ta_p if same else _pad_stack_rows(tb, Lpad)
        bucket = buckets[bi]
        starts = jnp.arange(S, dtype=jnp.int32) * rs

        def one(out_c, args, ta_p=ta_p, tb_p=tb_p, rs=rs,
                bucket=bucket, W=W):
            start, wi_s, wj_s, rp_s = args
            if same:
                (fa,) = _stream_sub_tables([ta_p], bucket, rs, start)
                fb = fa
            else:
                fa, fb = _stream_sub_tables([ta_p, tb_p], bucket, rs,
                                            start)
            # u16 index tables (giant pair graphs) widen per sub-stream
            si = _gather_slot_rows(fa, wi_s.reshape(-1).astype(jnp.int32))
            sj = _gather_slot_rows(fb, wj_s.reshape(-1).astype(jnp.int32))
            rows = _outer81_fold_chunked(si, sj, W)  # [R, 81]
            # accumulate THIS sub-stream's runs straight into the
            # [P+1, 81] table: materializing all S*R run rows for one
            # big segment-sum costs 19 GB of HLO temps at final-13682
            # (23.9M run rows + the remat copy, r5 OOM dump) -- the
            # scatter-add count is identical either way
            return out_c.at[rp_s].add(rows), None

        if S == 1:
            out, _ = one(out, (starts[0], wi[0], wj[0], rp[0]))
        else:
            out, _ = jax.lax.scan(one, out, (starts, wi, wj, rp))
    return out[:P]


@jax.tree_util.register_pytree_node_class
class CamStreamIndex:
    """Device copy of bucketing.CamStream."""

    def __init__(self, width, num_cameras, stream_bucket, rows_sub,
                 w_idx, run_cam):
        self.width = width
        self.num_cameras = num_cameras
        self.stream_bucket = stream_bucket
        self.rows_sub = rows_sub
        self.w_idx = w_idx
        self.run_cam = run_cam

    def tree_flatten(self):
        return ((self.w_idx, self.run_cam),
                (self.width, self.num_cameras, self.stream_bucket,
                 self.rows_sub))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], aux[3], *children)

    @staticmethod
    def from_host(cs) -> "CamStreamIndex":
        return CamStreamIndex(
            width=cs.width,
            num_cameras=cs.num_cameras,
            stream_bucket=tuple(cs.stream_bucket),
            rows_sub=tuple(cs.rows_sub),
            w_idx=tuple(jnp.asarray(x) for x in cs.w_idx),
            run_cam=tuple(jnp.asarray(x) for x in cs.run_cam))


def cam_gram_stream(terms, buckets, cs: CamStreamIndex,
                    num_cameras: int) -> jnp.ndarray:
    """Per-camera 81-wide gram sums over the CamStream index:
    out[c] = sum over obs slots of camera c of
             sum_terms sign * A_slot' B_slot. Terms are per-bucket
    tuples of [L, n*K*9] tables."""
    N = num_cameras
    terms = [(tuple(zip(A.q, A.jp)) if isinstance(A, StreamFactors)
              else A,
              tuple(zip(B.q, B.jp)) if isinstance(B, StreamFactors)
              else B,
              sign, A is B) for A, B, sign in terms]
    t00 = terms[0][0][0]
    dtype = (t00[0] if isinstance(t00, tuple) else t00).dtype
    W = cs.width
    out = jnp.zeros((N + 1, 81), dtype)
    for t, bi in enumerate(cs.stream_bucket):
        rs = cs.rows_sub[t]
        w, rc = cs.w_idx[t], cs.run_cam[t]
        S, R, _ = w.shape
        Lpad = S * rs
        bucket = buckets[bi]
        tabs = []
        for A, B, sign, same_t in terms:
            ta_p = _pad_stack_rows(A[bi], Lpad)
            tb_p = ta_p if same_t else _pad_stack_rows(B[bi], Lpad)
            tabs.append((ta_p, tb_p, sign, same_t))
        starts = jnp.arange(S, dtype=jnp.int32) * rs

        def one(out_c, args, tabs=tabs, rs=rs, bucket=bucket):
            start, w_s, rc_s = args
            acc = None
            for ta_p, tb_p, sign, same_t in tabs:
                if same_t:
                    (fa,) = _stream_sub_tables([ta_p], bucket, rs,
                                               start)
                    fb = fa
                else:
                    fa, fb = _stream_sub_tables([ta_p, tb_p], bucket,
                                                rs, start)
                si = _gather_slot_rows(fa, w_s.reshape(-1))
                sj = si if same_t else _gather_slot_rows(
                    fb, w_s.reshape(-1))
                g = _outer81_fold_chunked(si, sj, W) * sign
                acc = g if acc is None else acc + g
            # scatter this sub-stream's runs in place (see
            # pair_outer_stream: no S*R materialization)
            return out_c.at[rc_s].add(acc), None

        if S == 1:
            out, _ = one(out, (starts[0], w[0], rc[0]))
        else:
            out, _ = jax.lax.scan(one, out, (starts, w, rc))
    return out[:N]


def cam_reduce_stream(tables, buckets, cs: CamStreamIndex,
                      num_cameras: int) -> jnp.ndarray:
    """Per-camera F-wide row sums over the CamStream index: tables is
    a per-bucket tuple of [L, n*F] contribution rows."""
    N = num_cameras
    dtype = tables[0].dtype
    W = cs.width
    out = None
    for t, bi in enumerate(cs.stream_bucket):
        rs = cs.rows_sub[t]
        w, rc = cs.w_idx[t], cs.run_cam[t]
        S, R, _ = w.shape
        Lpad = S * rs
        bucket = buckets[bi]
        ta_p = _pad_stack_rows(tables[bi], Lpad)
        n = bucket.cam_idx.shape[1]
        F = ta_p.shape[1] // n
        starts = jnp.arange(S, dtype=jnp.int32) * rs

        if out is None:
            out = jnp.zeros((N + 1, F), dtype)

        def one(out_c, args, ta_p=ta_p, rs=rs, bucket=bucket, F=F):
            start, w_s, rc_s = args
            (fa,) = _stream_sub_tables([ta_p], bucket, rs, start)
            g = jnp.take(fa, w_s.reshape(-1), axis=0, mode="fill",
                         fill_value=0.0)
            rows = jnp.sum(g.reshape(-1, W, F), axis=1)  # [R, F]
            return out_c.at[rc_s].add(rows), None

        if S == 1:
            out, _ = one(out, (starts[0], w[0], rc[0]))
        else:
            out, _ = jax.lax.scan(one, out, (starts, w, rc))
    if out is None:
        return jnp.zeros((N, tables[0].shape[1]), dtype)
    return out[:N]


def cam_parts_mode(cam_strips) -> bool:
    """True when the per-camera reducers take per-bucket tuple tables
    (leftover-free CamStrips, or a CamStream index)."""
    if cam_strips is None:
        return False
    if isinstance(cam_strips, CamStreamIndex):
        return True
    return cam_strips.wi_idx.shape[0] == 0


def pair_parts_mode(pairs) -> bool:
    """True when the pair reducer takes per-bucket tuple tables."""
    if isinstance(pairs, PairStreamIndex):
        return True
    return (isinstance(pairs, PairStripsIndex)
            and pairs.wi_idx.shape[0] == 0)


def split_flat_by_bucket(flat, buckets):
    """[O, ...] flat per-obs array -> per-bucket tuple of [L, n*F]
    tables (contiguous reshape; no copy beyond layout)."""
    if isinstance(flat, (tuple, list)):
        return flat
    f2 = flat.reshape(flat.shape[0], -1)
    F = f2.shape[1]
    outs = []
    off = 0
    for b in buckets:
        L, n = b.cam_idx.shape
        outs.append(jax.lax.slice_in_dim(
            f2, off, off + L * n, axis=0).reshape(L, n * F))
        off += L * n
    return tuple(outs)
