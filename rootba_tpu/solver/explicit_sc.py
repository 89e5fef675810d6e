"""Explicit Schur complement and Power-SC (PoBA) solvers, TPU-native.

Re-design of the reference sc module (sc/landmark_block.hpp,
sc/linearization_sc.hpp, sc/linearization_power_sc.hpp):

* The reduced camera system H_pp is stored as a flat array of unique
  9x9 camera-pair blocks [P, 9, 9] with (row, col) index vectors -- the
  TPU replacement for the tbb::concurrent_unordered_map keyed block
  storage (cg/block_sparse_matrix.hpp:150-310). Assembly is one
  segment-sum over all (obs_i, obs_j) pair contributions per bucket,
  replacing the num_cams^2 mutex scatter (sc/landmark_block.hpp:282-338).
* Hll^-1 is a batched closed-form 3x3 cofactor inverse (the reference
  uses Eigen's 3x3 .inverse(), sc/landmark_block.hpp:228-232).
* PoBA evaluates x = sum_i (Hpp^-1 E0)^i Hpp^-1 (-b) with the implicit
  e0 sweep Jp^T (Jl (Hll^-1 (Jl^T (Jp x)))) and the zeta = i |tmp|/|acc|
  convergence test (sc/linearization_power_sc.hpp:127-154, :250-272).
"""

from __future__ import annotations

import time
from typing import NamedTuple, Tuple

import jax
from rootba_tpu.ops.block9 import chol9, chol9_solve
from rootba_tpu.utils.jax_setup import sync
import jax.numpy as jnp
import numpy as np

from rootba_tpu.config.options import PreconditionerType, SolverOptions
from rootba_tpu.core import lie
from rootba_tpu.log.summary import IterationSummary
from rootba_tpu.solver.cg import pcg
from rootba_tpu.solver.linearization import POSE_SIZE, CamState
from rootba_tpu.solver.sqrt_qr import precond_apply

P9 = POSE_SIZE


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (cofactor expansion)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / det
    M = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1),
    ], axis=-2)
    return M * inv_det[..., None, None]


def damped_hll_inv(lin, bucket, lam) -> jnp.ndarray:
    """(Jl_s' Jl_s + lam I)^-1 per landmark, zeroed for padded landmark
    rows (whose Jl is all-zero and would otherwise produce NaN at
    lam = 0; the reference has no padded rows)."""
    dtype = lin.Jl.dtype
    L, n = lin.Jl.shape[0], lin.Jl.shape[1]
    Jl2 = lin.Jl.reshape(L, 2 * n, 3)
    Hll = jnp.einsum("lrc,lrd->lcd", Jl2, Jl2) + \
        lam.astype(dtype) * jnp.eye(3, dtype=dtype)
    inv = inv3x3(Hll)
    return jnp.where(bucket.lm_mask[:, None, None], inv, 0.0)


class PairStructure(NamedTuple):
    """Static sparsity of the RCS (computed once on host). All fields
    are arrays so the structure can be passed as a jit argument; the
    pair count is recovered statically as pair_row.shape[0]."""

    pair_row: jnp.ndarray  # [P] int32
    pair_col: jnp.ndarray  # [P] int32
    pair_ids: Tuple[jnp.ndarray, ...]  # per bucket [L,n,n] int32 (P = dummy)
    diag_pid: jnp.ndarray  # [N] int32 (P = camera unobserved)
    dense_idx: jnp.ndarray  # [N*N] int32 block->pair id (P = absent);
    # empty [0] when the dense RCS mode is off

    @property
    def num_pairs(self) -> int:
        return self.pair_row.shape[0]


def build_pair_structure(bp, num_cameras: int) -> PairStructure:
    N = num_cameras
    codes_list = []
    for b in bp.buckets:
        rows = b.cam_idx[:, :, None].astype(np.int64)
        cols = b.cam_idx[:, None, :].astype(np.int64)
        valid = b.mask[:, :, None] & b.mask[:, None, :]
        code = np.where(valid, rows * N + cols, N * N)
        codes_list.append(code)
    valid_codes = np.concatenate(
        [c[c < N * N].ravel() for c in codes_list]) if codes_list else \
        np.zeros(0, np.int64)
    unique = np.unique(valid_codes)
    P = unique.size
    pair_ids = tuple(
        jnp.asarray(np.searchsorted(unique, c).astype(np.int32))
        for c in codes_list)
    diag_codes = np.arange(N, dtype=np.int64) * (N + 1)
    pos = np.searchsorted(unique, diag_codes)
    pos_clipped = np.minimum(pos, max(P - 1, 0))
    exists = (P > 0) & (unique[pos_clipped] == diag_codes)
    diag_pid = np.where(exists, pos, P).astype(np.int32)
    dense_idx = np.zeros(0, dtype=np.int32)
    return PairStructure(
        pair_row=jnp.asarray((unique // N).astype(np.int32)),
        pair_col=jnp.asarray((unique % N).astype(np.int32)),
        pair_ids=pair_ids,
        diag_pid=jnp.asarray(diag_pid),
        dense_idx=jnp.asarray(dense_idx),
    )


class SCStage2(NamedTuple):
    H: jnp.ndarray  # [P, 9, 9] RCS blocks (pose damping included)
    b: jnp.ndarray  # [N, 9]
    Hll_inv: Tuple[jnp.ndarray, ...]  # per bucket [L,3,3] (damped)
    lam: jnp.ndarray


def sc_rhs_and_hll(lins, buckets, lam, num_cameras, cam_csr=None,
                   cam_strips=None):
    """Per-bucket damped Hll^-1 and the RCS right-hand side
    b = Jp'(r - Jl Hll^-1 Jl' r) (landmark_block stage(),
    sc/landmark_block.hpp:342-364). Returns (b, Hll_invs)."""
    from rootba_tpu.solver.linearization import (
        cam_reduce_strips,
        csr_cam_reduce,
    )

    dtype = lins[0].Jp.dtype
    from rootba_tpu.solver.linearization import cam_parts_mode

    strip_parts = (cam_strips is not None
                   and cam_parts_mode(cam_strips))
    b = jnp.zeros((num_cameras, P9), dtype)
    b_parts = []
    Hll_invs = []
    for lin, bucket in zip(lins, buckets):
        L, n = lin.Jp.shape[0], lin.Jp.shape[1]
        Jl2 = lin.Jl.reshape(L, 2 * n, 3)
        r2 = lin.r.reshape(L, 2 * n)
        Hll_inv = damped_hll_inv(lin, bucket, lam)
        Hll_invs.append(Hll_inv)
        bl = jnp.einsum("lrc,lr->lc", Jl2, r2)
        hbl = jnp.einsum("lcd,ld->lc", Hll_inv, bl)
        rr = lin.r - jnp.einsum("lnrc,lc->lnr", lin.Jl, hbl)
        yb = jnp.einsum("lnrj,lnr->lnj", lin.Jp, rr)
        if strip_parts:
            # per-bucket [L, n*9] landmark-strip table (a flat [O, 9]
            # row-major concat lane-pads 9 -> 128; see
            # linearization.csr_pair_outer_strips)
            b_parts.append(yb.reshape(L, n * P9))
        elif cam_strips is not None or cam_csr is not None:
            b_parts.append(yb.reshape(-1, P9))
        else:
            b = b + jax.ops.segment_sum(
                yb.reshape(-1, P9), bucket.cam_idx.reshape(-1),
                num_segments=num_cameras)
    if strip_parts:
        b = cam_reduce_strips(tuple(b_parts), buckets, cam_strips)
    elif cam_strips is not None:
        b = cam_reduce_strips(jnp.concatenate(b_parts, axis=0), buckets,
                              cam_strips)
    elif cam_csr is not None:
        b = csr_cam_reduce(b_parts, cam_csr, num_cameras)
    return b, tuple(Hll_invs)


def sc_assemble(lins, buckets, pairs: PairStructure, lam, num_cameras,
                cam_csr=None):
    """get_Hb (sc/linearization_sc.hpp:232-348 + landmark_block
    add_Hb), block-sparse form: unique-pair blocks via segment-sum
    (used for sharded meshes, where GSPMD lowers the scatter to local
    scatters + psum, and as the fallback when the dense RCS is off --
    see sc_assemble_dense for the single-device fast path)."""
    dtype = lins[0].Jp.dtype
    P = pairs.num_pairs
    H = jnp.zeros((P + 1, P9 * P9), dtype)
    b, Hll_invs = sc_rhs_and_hll(lins, buckets, lam, num_cameras,
                                 cam_csr=cam_csr)
    for lin, bucket, pid, Hll_inv in zip(lins, buckets, pairs.pair_ids,
                                         Hll_invs):
        # diagonal Jp_i' Jp_i at (c_i, c_i); SC coupling
        # -Jp_i' Jl_i Hll^-1 Jl_j' Jp_j at (c_i, c_j). Operands are
        # flattened to [*, 81]: materialized [...,9,9] buffers get
        # (8,128) minor-dim tiling on TPU (~25x memory inflation).
        n = lin.Jp.shape[1]
        D = jnp.einsum("lnri,lnrj->lnij", lin.Jp, lin.Jp)
        T = jnp.einsum("lnrc,lnrj->lncj", lin.Jl, lin.Jp)  # [L,n,3,9]
        HT = jnp.einsum("lcd,lndj->lncj", Hll_inv, T)
        M = -jnp.einsum("lnci,lmcj->lnmij", T, HT)  # [L,n,n,9,9]
        diag_pid_b = pid[:, jnp.arange(n), jnp.arange(n)]  # [L,n]
        H = H + jax.ops.segment_sum(
            D.reshape(-1, P9 * P9), diag_pid_b.reshape(-1),
            num_segments=P + 1)
        H = H + jax.ops.segment_sum(
            M.reshape(-1, P9 * P9), pid.reshape(-1),
            num_segments=P + 1)

    # pose damping on the diagonal blocks (linearization_sc.hpp:317-320)
    eye9 = jnp.eye(P9, dtype=dtype).reshape(P9 * P9)
    H = H.at[pairs.diag_pid].add(
        jnp.broadcast_to(lam.astype(dtype) * eye9,
                         (num_cameras, P9 * P9)))
    return SCStage2(H=H[:P].reshape(P, P9, P9), b=b,
                    Hll_inv=tuple(Hll_invs), lam=jnp.asarray(lam, dtype))


def _sc_strip_factors(lins, Hll_invs, pair_idx, cam_strips,
                      with_jp=True):
    """(HT, T, Jp) factors for the SC/E0 assemblies: flat [O, K, 9]
    arrays, or per-bucket [L, n*K*9] landmark-strip tables when the
    strips indices have no leftover stream (a flat [O, 27] row-major
    concat lane-pads 27 -> 128 = 17.2 GB at final-13682; see
    linearization.csr_pair_outer_strips)."""
    from rootba_tpu.solver.linearization import PairStripsIndex

    from rootba_tpu.solver.linearization import (
        cam_parts_mode,
        pair_parts_mode,
    )

    parts = (cam_strips is not None and cam_parts_mode(cam_strips)
             and pair_parts_mode(pair_idx))
    T_parts, HT_parts, Jp_parts = [], [], []
    for lin, Hll_inv in zip(lins, Hll_invs):
        L, n = lin.Jp.shape[0], lin.Jp.shape[1]
        if parts:
            # T and HT in flat [*, 27] form (col c*9+j), strictly 2-D
            # (rank-3 [*, 3, 9] values get (4,128)-tile-padded 19x
            # when materialized, see sqrt_flat._rcs_factors) and
            # row-chunked under lax.map: unchunked, the [L*n, 3]
            # slice temps alone are 430 MB each at a venice bucket
            # (42.7x lane padding; compile-time HBM OOM, measured)
            from rootba_tpu.solver.sqrt_flat import _map_rows

            def th_chunk(ts, n=n):
                jl_c, jp_c, h_c = ts
                Lc = jl_c.shape[0]
                jl_f = jl_c.reshape(Lc * n, 2, 3)
                jp_f = jp_c.reshape(Lc * n, 2, P9)
                T27 = (jnp.repeat(jl_f[:, 0, :], P9, axis=1)
                       * jnp.tile(jp_f[:, 0, :], (1, 3))
                       + jnp.repeat(jl_f[:, 1, :], P9, axis=1)
                       * jnp.tile(jp_f[:, 1, :], (1, 3)))  # col c*9+j
                # HT[., d*9+j] = sum_c Hinv[l,d,c] T27[., c*9+j], c
                # unrolled so no [*, 3, 9]-shaped reduce output exists
                Hf = h_c.reshape(Lc, 9)  # col d*3+c
                HT27 = jnp.zeros_like(T27)
                for c in range(3):
                    hc = Hf[:, c::3]  # [Lc,3] cols d
                    hce = jnp.broadcast_to(
                        jnp.repeat(hc, P9, axis=1)[:, None, :],
                        (Lc, n, 3 * P9)).reshape(Lc * n, 3 * P9)
                    tc = jnp.tile(T27[:, c * P9:(c + 1) * P9], (1, 3))
                    HT27 = HT27 + hce * tc
                return (T27.reshape(Lc, n * 3 * P9),
                        HT27.reshape(Lc, n * 3 * P9))

            T_b, HT_b = _map_rows(th_chunk,
                                  [lin.Jl, lin.Jp, Hll_inv], L, n)
            T_parts.append(T_b)
            HT_parts.append(HT_b)
            Jp_parts.append(lin.Jp.reshape(L, n * 2 * P9))
        else:
            # T[l,n,c,j] = sum_r Jl[l,n,r,c] Jp[l,n,r,j] (VPU
            # mult-sum; see csr_pair_outer on why not einsum-dots)
            T = jnp.sum(lin.Jl[..., :, None] * lin.Jp[..., None, :],
                        axis=2)
            HT = jnp.sum(
                Hll_inv[:, None, :, :, None] * T[:, :, None, :, :],
                axis=3)  # [L,n,3,9]
            T_parts.append(T.reshape(L * n, 3, P9))
            HT_parts.append(HT.reshape(L * n, 3, P9))
            Jp_parts.append(lin.Jp.reshape(L * n, 2, P9))
    if parts:
        return (tuple(HT_parts), tuple(T_parts),
                tuple(Jp_parts) if with_jp else None)
    return (jnp.concatenate(HT_parts, axis=0),
            jnp.concatenate(T_parts, axis=0),
            jnp.concatenate(Jp_parts, axis=0) if with_jp else None)


def sc_assemble_dense(lins, buckets, pair_csr, cam_flat, cam_csr, lam,
                      num_cameras, cam_strips=None):
    """Dense-RCS SC assembly on the strict-pair CSR (see
    linearization.assemble_rcs_dense): pair block (c_i, c_j) =
    -T_i' Hll^-1 T_j with T = Jl'Jp factored as the two per-obs strips
    (Hll^-1 T, T). Returns (H_dense, diag_blocks, b, Hll_invs)."""
    from rootba_tpu.solver.linearization import assemble_rcs_dense

    b, Hll_invs = sc_rhs_and_hll(lins, buckets, lam, num_cameras,
                                 cam_csr=cam_csr, cam_strips=cam_strips)
    HT, T, Jp = _sc_strip_factors(lins, Hll_invs, pair_csr, cam_strips)
    # diagonal: Jp_i'Jp_i - (Hll^-1 T)_i' T_i per camera, computed
    # inside the gather-reduce (no [O,81] materialization)
    Hd, diag = assemble_rcs_dense(
        HT, T, [(Jp, Jp, 1.0), (HT, T, -1.0)],
        cam_flat, cam_csr, pair_csr, lam, num_cameras,
        buckets=buckets, cam_strips=cam_strips)
    return Hd, diag, b, Hll_invs


def sc_assemble_bsr(lins, buckets, pair_idx, cam_flat, cam_csr, lam,
                    num_cameras, cam_strips=None, symmetric=False):
    """Block-sparse SC assembly (same H as sc_assemble_dense, no
    densify): pair block (c_i, c_j) = -T_i' Hll^-1 T_j with
    T = Jl'Jp. For camera counts whose dense [9G, 9G] system exceeds
    HBM (final-13682). Returns (blocks2, diag, b, Hll_invs) with
    blocks2/diag as in linearization.assemble_rcs_bsr (strict-pair
    half table with symmetric=True)."""
    from rootba_tpu.solver.linearization import assemble_rcs_bsr

    b, Hll_invs = sc_rhs_and_hll(lins, buckets, lam, num_cameras,
                                 cam_csr=cam_csr, cam_strips=cam_strips)
    HT, T, Jp = _sc_strip_factors(lins, Hll_invs, pair_idx, cam_strips)
    blocks2, diag = assemble_rcs_bsr(
        HT, T, [(Jp, Jp, 1.0), (HT, T, -1.0)],
        cam_flat, cam_csr, pair_idx, lam, num_cameras,
        buckets=buckets, cam_strips=cam_strips, symmetric=symmetric)
    return blocks2, diag, b, Hll_invs


def sc_matvec(stage2: SCStage2, pairs: PairStructure, num_cameras, x):
    """Block-sparse matvec (cg/block_sparse_matrix.hpp:223-249)."""
    xg = x[pairs.pair_col]  # [P,9]
    y = jnp.einsum("pij,pj->pi", stage2.H, xg)
    return jax.ops.segment_sum(y, pairs.pair_row, num_segments=num_cameras)


def sc_matvec_dense(Hz: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """GEMV against the feature-major ("z-space") dense RCS produced by
    assemble_rcs_dense: Hz[a*N+i, b*N+j] = block(i,j)[a,b], so x [N,9]
    is reordered to z[a*N+i] = x[i,a] around the product (the z-space
    layout is what keeps the densify free of ~25x tile-padded
    [N,N,9,9] intermediates).

    HIGHEST precision: the default routes the f32 GEMV through the MXU
    as a single bf16 pass (~3-digit operator accuracy costs CG
    iterations); the multi-pass f32 GEMV is HBM-bound all the same."""
    N = x.shape[0]
    G = Hz.shape[0] // P9  # camera grid (possibly lane-padded)
    z2 = jnp.zeros((P9, G), x.dtype).at[:, :N].set(x.T)
    y = jnp.dot(Hz, z2.reshape(-1),
                precision=jax.lax.Precision.HIGHEST)
    return y.reshape(P9, G)[:, :N].T


def sc_diag_blocks(stage2: SCStage2, pairs: PairStructure, num_cameras):
    """Per-camera diagonal 9x9 blocks of the assembled RCS."""
    dtype = stage2.H.dtype
    padded = jnp.concatenate(
        [stage2.H,
         jnp.zeros((1, P9, P9), dtype)], axis=0)
    blocks = padded[pairs.diag_pid]
    # unobserved cameras: fall back to lam * I
    missing = pairs.diag_pid >= stage2.H.shape[0]
    fallback = stage2.lam.astype(dtype) * jnp.eye(P9, dtype=dtype)
    return jnp.where(missing[:, None, None], fallback, blocks)


def jp_gram_blockdiag(lins, buckets, lam, num_cameras):
    """Damped Jp'Jp block diagonal = get_jacobi
    (sc/linearization_sc.hpp:244-268)."""
    dtype = lins[0].Jp.dtype
    blocks = jnp.zeros((num_cameras, P9, P9), dtype)
    for lin, bucket in zip(lins, buckets):
        blk = jnp.einsum("lnri,lnrj->lnij", lin.Jp, lin.Jp)
        blocks = blocks + jax.ops.segment_sum(
            blk.reshape(-1, P9, P9), bucket.cam_idx.reshape(-1),
            num_segments=num_cameras)
    return blocks + lam.astype(dtype) * jnp.eye(P9, dtype=dtype)


def e0_matvec(lins, buckets, Hll_invs, num_cameras, x, csr=None):
    """E0 x = Jp' Jl Hll^-1 Jl' Jp x (sc/linearization_power_sc.hpp:250-272)."""
    from rootba_tpu.solver.linearization import csr_cam_reduce

    y = jnp.zeros_like(x)
    yb_rows = []
    for lin, bucket, Hll_inv in zip(lins, buckets, Hll_invs):
        xg = x[bucket.cam_idx]
        w = jnp.einsum("lnrj,lnj->lnr", lin.Jp, xg)  # Jp x
        t = jnp.einsum("lnrc,lnr->lc", lin.Jl, w)  # Jl' (Jp x)
        t = jnp.einsum("lcd,ld->lc", Hll_inv, t)
        w = jnp.einsum("lnrc,lc->lnr", lin.Jl, t)  # Jl Hll^-1 ...
        yb = jnp.einsum("lnrj,lnr->lnj", lin.Jp, w)
        if csr is not None:
            yb_rows.append(yb.reshape(-1, P9))
        else:
            y = y + jax.ops.segment_sum(
                yb.reshape(-1, P9), bucket.cam_idx.reshape(-1),
                num_segments=num_cameras)
    if csr is not None:
        y = y + csr_cam_reduce(yb_rows, csr, num_cameras)
    return y


def power_series_solve(apply_hpp_inv, apply_e0, b, order: int,
                       q_tolerance: float):
    """x = sum_{i=0..order} (Hpp^-1 E0)^i Hpp^-1 (-b), zeta-terminated
    (sc/linearization_power_sc.hpp:127-154). Returns (x, iters)."""
    x0 = apply_hpp_inv(-b)

    def cond(state):
        i, tmp, acc, done = state
        return (~done) & (i < order)

    def body(state):
        i, tmp, acc, done = state
        i = i + 1
        tmp = apply_hpp_inv(apply_e0(tmp))
        acc = acc + tmp
        zeta = i.astype(b.dtype) * jnp.linalg.norm(tmp.ravel()) / \
            jnp.linalg.norm(acc.ravel())
        return (i, tmp, acc, done | (zeta < q_tolerance))

    i0 = jnp.asarray(0, jnp.int32)
    i, tmp, acc, done = jax.lax.while_loop(
        cond, body, (i0, x0, x0, jnp.asarray(False)))
    return acc, i


def sc_back_substitute(lins, buckets, Hll_invs, lm_ps, pose_inc,
                       compensated: bool = False):
    """Reference sc/landmark_block.hpp:409-446 back_substitute:
    dl = -Hll_lam^-1 Jl'(r + Jp dp); l_diff -= v'(0.5 v + r).

    compensated=True accumulates l_diff with error-free transforms
    (see ops.compensated; the sum cancels under f32 near convergence)."""
    acc_dtype = jnp.result_type(pose_inc.dtype, jnp.float32)
    l_hi = jnp.zeros((), acc_dtype)
    l_lo = jnp.zeros((), acc_dtype)
    new_lm_ps = []
    for lin, bucket, Hll_inv, lm_p in zip(lins, buckets, Hll_invs, lm_ps):
        xg = pose_inc[bucket.cam_idx]
        w = jnp.einsum("lnrj,lnj->lnr", lin.Jp, xg)
        u = lin.r + w
        t = jnp.einsum("lnrc,lnr->lc", lin.Jl, u)
        dl_s = -jnp.einsum("lcd,ld->lc", Hll_inv, t)
        dl_s = jnp.where(bucket.lm_mask[:, None], dl_s, 0.0)

        v = w + jnp.einsum("lnrc,lc->lnr", lin.Jl, dl_s)
        parts = (v * (0.5 * v + lin.r)).astype(acc_dtype)
        if compensated:
            from rootba_tpu.ops.compensated import comp_sum2, two_sum

            bhi, blo = comp_sum2(parts)
            l_hi, e = two_sum(l_hi, -bhi)
            l_lo = l_lo + e - blo
        else:
            l_hi = l_hi - jnp.sum(parts)

        dl = dl_s * lin.Jl_scale
        new_lm_ps.append(lm_p + dl.astype(lm_p.dtype))
    return tuple(new_lm_ps), l_hi + l_lo


# ---------------------------------------------------------------------------
# Linearizer facades
# ---------------------------------------------------------------------------

from rootba_tpu.solver.lm import BAState, LinearizerBase  # noqa: E402


def _build_pair_index(bp, num_cameras, pair_gather, dense_grid=True,
                      min_group=16384):
    """Strict-pair index for the explicit-RCS paths, in the configured
    gather formulation (see SolverOptions.pair_gather). Returns
    (device_index, host_index); dense_grid=False skips the [G*G] block
    maps (BSR mode)."""
    if pair_gather == "stream":
        from rootba_tpu.bal.bucketing import build_pair_stream
        from rootba_tpu.solver.linearization import PairStreamIndex

        host = build_pair_stream(bp.buckets, num_cameras,
                                 dense_grid=dense_grid)
        return PairStreamIndex.from_host(host), host
    if pair_gather == "strips":
        from rootba_tpu.bal.bucketing import build_pair_strips
        from rootba_tpu.solver.linearization import PairStripsIndex

        host = build_pair_strips(bp.buckets, num_cameras,
                                 dense_grid=dense_grid,
                                 min_group=min_group)
        return PairStripsIndex.from_host(host), host
    from rootba_tpu.bal.bucketing import build_pair_csr
    from rootba_tpu.solver.linearization import PairCsrIndex

    host = build_pair_csr(bp.buckets, num_cameras,
                          dense_grid=dense_grid)
    return PairCsrIndex.from_host(host), host


class SCLinearizer(LinearizerBase):
    """SCHUR_COMPLEMENT solver (reference solver/linearizor_sc.cpp)."""

    linear_solver_type = "bal_sc"
    # the reference logs the SC assembly as prepare_time
    # (linearizor_sc.cpp get_Hb span)
    prepare_field = "prepare_time_in_seconds"

    def _bsr_symmetric(self, bsr) -> bool:
        """Static half-storage decision (see
        linearization.make_bsr_matvec)."""
        if bsr is None:
            return False
        import jax.numpy as _jnp

        from rootba_tpu.solver.linearization import bsr_symmetric_fits

        return bsr_symmetric_fits(
            bsr, _jnp.dtype(self.dtype).itemsize,
            int(self.options.bsr_pack_max_gb * (1 << 30)))

    def _build(self):
        opts = self.options
        self.dense_rcs = (self.mesh is None and 0 < self.num_cameras
                          <= opts.dense_rcs_max_cameras)
        # above the dense-HBM camera limit on a single device, assemble
        # block-sparsely instead of falling back to the segment-sum
        # scatter path (which materializes [L,n,n,81] pair tensors --
        # tens of GB at final-13682 scale); the scatter path remains
        # the mesh path (GSPMD lowers it to local scatters + psum).
        # dense_rcs_max_cameras=0 keeps its historical meaning --
        # explicit RCS disabled entirely (scatter/implicit paths)
        self.bsr_rcs = (self.mesh is None and not self.dense_rcs
                        and opts.dense_rcs_max_cameras > 0)
        self.pair_csr = None
        bsr = None
        cstrips = None
        if self.dense_rcs or self.bsr_rcs:
            self.pairs = None
            self.pair_csr, pairs_host = _build_pair_index(
                self.bp, self.num_cameras, opts.pair_gather,
                dense_grid=self.dense_rcs,
                min_group=opts.effective_strip_min_group(self.bp.num_observations))
            if self.bsr_rcs:
                from rootba_tpu.bal.bucketing import build_bsr_matvec
                from rootba_tpu.solver.linearization import (
                    BsrMatvecIndex,
                )

                bsr = BsrMatvecIndex.from_host(build_bsr_matvec(
                    pairs_host.pair_row, pairs_host.pair_col,
                    self.num_cameras))
            if opts.pair_gather == "stream":
                from rootba_tpu.bal.bucketing import build_cam_stream
                from rootba_tpu.solver.linearization import (
                    CamStreamIndex,
                )

                cstrips = CamStreamIndex.from_host(build_cam_stream(
                    self.bp.buckets, self.num_cameras))
            elif opts.pair_gather == "strips":
                from rootba_tpu.bal.bucketing import build_cam_strips
                from rootba_tpu.solver.linearization import (
                    CamStripsIndex,
                )

                cstrips = CamStripsIndex.from_host(build_cam_strips(
                    self.bp.buckets, self.num_cameras,
                    min_group=opts.effective_strip_min_group(self.bp.num_observations)))
        else:
            self.pairs = build_pair_structure(self.bp, self.num_cameras)
        cam_flat = jnp.concatenate(
            [b.cam_idx.reshape(-1) for b in self.buckets])
        self.bsr_sym = self._bsr_symmetric(bsr)
        # buckets + RCS sparsity structure + camera-CSR as runtime args
        # (see LinearizerBase.consts: avoids giant embedded HLO constants)
        self.consts = (self.buckets, self.pairs, self.cam_csr,
                       self.pair_csr, cam_flat, cstrips, bsr)
        precond_type = opts.preconditioner_type
        if precond_type not in (PreconditionerType.SCHUR_JACOBI,
                                PreconditionerType.DIAGONAL,
                                PreconditionerType.POWER_SCHUR_COMPLEMENT):
            raise ValueError(
                f"preconditioner {precond_type} not implemented for the "
                f"SCHUR_COMPLEMENT solver")
        # scalar DIAGONAL = diag of the SCHUR_JACOBI blocks (reference
        # preconditioner.hpp:48-69)
        precond_diag = precond_type == PreconditionerType.DIAGONAL

        from rootba_tpu.solver.linearization import compute_error_buckets

        def error_fn(consts, cams, lm_ps):
            return compute_error_buckets(
                cams, lm_ps, consts[0], self.robust_norm, self.huber)

        def stage1_fn(consts, cams, lm_ps):
            return self._stage1_common(consts[0], cams, lm_ps,
                                       csr=consts[2])

        use_power_precond = (
            precond_type == PreconditionerType.POWER_SCHUR_COMPLEMENT)

        def stage2_fn(consts, lins, lam):
            """Assembly + preconditioner materials (reference get_Hb +
            preconditioner construction, linearizor_sc.cpp:112-177)."""
            (buckets, pairs, csr, pair_csr, cam_flat, cstrips_,
             bsr_) = consts
            dtype = lins[0].Jp.dtype
            H_dense = None
            if self.dense_rcs:
                H_dense, diag, b, Hll_invs = sc_assemble_dense(
                    lins, buckets, pair_csr, cam_flat, csr, lam,
                    self.num_cameras, cam_strips=cstrips_)
                stage2 = SCStage2(
                    H=jnp.zeros((0, P9, P9), dtype), b=b,
                    Hll_inv=Hll_invs, lam=jnp.asarray(lam, dtype))
            elif self.bsr_rcs:
                from rootba_tpu.solver.linearization import (
                    bsr_build_table,
                )

                half, diag, b, Hll_invs = sc_assemble_bsr(
                    lins, buckets, pair_csr, cam_flat, csr, lam,
                    self.num_cameras, cam_strips=cstrips_,
                    symmetric=True)
                H_dense = (bsr_build_table(half, bsr_, self.bsr_sym),
                           diag)
                stage2 = SCStage2(
                    H=jnp.zeros((0, P9, P9), dtype), b=b,
                    Hll_inv=Hll_invs, lam=jnp.asarray(lam, dtype))
            else:
                stage2 = sc_assemble(lins, buckets, pairs, lam,
                                     self.num_cameras, cam_csr=csr)
                diag = None

            chol = hpp_chol = E0 = None
            if not use_power_precond:
                if diag is None:
                    diag = sc_diag_blocks(stage2, pairs,
                                          self.num_cameras)
                if precond_diag:
                    # scalar DIAGONAL: keep the matrix diagonal only
                    diag = diag * jnp.eye(P9, dtype=diag.dtype)
                chol = chol9(diag)
            else:
                jacobi = jp_gram_blockdiag(lins, buckets, lam,
                                           self.num_cameras)
                # SPD -> Cholesky solves (reference uses llt().solve(I),
                # preconditioner.hpp:169-174; solves are equivalent)
                hpp_chol = chol9(jacobi)
                if self.dense_rcs:
                    # E0 = diag_embed(Jp'Jp) - H + lam I: derive the
                    # dense power-series operator from the already-
                    # assembled H (one elementwise pass, no 2nd
                    # assembly); Jp'Jp diag = jacobi - lam I
                    N_ = self.num_cameras
                    G = H_dense.shape[0] // P9
                    Dz = jnp.zeros_like(H_dense)
                    gi = jnp.arange(N_)
                    for a_ in range(P9):
                        for b_ in range(P9):
                            Dz = Dz.at[a_ * G + gi, b_ * G + gi].set(
                                jacobi[:, a_, b_]
                                - (lam.astype(jacobi.dtype)
                                   if a_ == b_ else 0.0))
                    E0 = Dz - H_dense + lam.astype(H_dense.dtype) * \
                        jnp.eye(H_dense.shape[0], dtype=H_dense.dtype)
            return stage2, H_dense, chol, hpp_chol, E0

        def lsolve_fn(consts, lins, aux):
            (buckets, pairs, csr, pair_csr, cam_flat, cstrips_,
             bsr_) = consts
            stage2, H_dense, chol, hpp_chol, E0 = aux
            if self.dense_rcs:
                def matvec(x):
                    return sc_matvec_dense(H_dense, x)
            elif self.bsr_rcs:
                from rootba_tpu.solver.linearization import (
                    bsr_table_matvec,
                )

                table, diag_b = H_dense
                matvec = bsr_table_matvec(table, diag_b, bsr_,
                                          self.bsr_sym)
            else:
                def matvec(x):
                    return sc_matvec(stage2, pairs, self.num_cameras, x)

            from rootba_tpu.ops.block9 import chol9_inv, inv9_apply

            if not use_power_precond:
                pinv = chol9_inv(chol)

                def precond(r):
                    return inv9_apply(pinv, r)
            else:
                hpp_inv = chol9_inv(hpp_chol)

                def apply_hpp_inv(v):
                    return inv9_apply(hpp_inv, v)

                if self.dense_rcs:
                    def apply_e0(v):
                        return sc_matvec_dense(E0, v)
                else:
                    def apply_e0(v):
                        return e0_matvec(lins, buckets, stage2.Hll_inv,
                                         self.num_cameras, v, csr=csr)

                def precond(r):
                    # power_series_solve(v) = sum_i (Hpp^-1 E0)^i Hpp^-1 (-v);
                    # the preconditioner applies the series to +r
                    # (PowerSCPreconditioner::solve_assign, fixed order,
                    # no tolerance) -> pass -r.
                    x, _ = power_series_solve(
                        apply_hpp_inv, apply_e0, -r, opts.power_order,
                        q_tolerance=-1.0)
                    return x

            res = pcg(
                matvec, precond, stage2.b,
                min_num_iterations=opts.min_linear_solver_iterations,
                max_num_iterations=opts.max_linear_solver_iterations,
                q_tolerance=opts.eta,
                r_tolerance=-1.0,
                compensated=self.compensated,
            )
            return (-res.x, stage2, res.num_iterations,
                    res.termination_type)

        def apply_fn(consts, cams, lm_ps, lins, stage2, pose_scale, inc):
            new_lm_ps, l_diff = sc_back_substitute(
                lins, consts[0], stage2.Hll_inv, lm_ps, inc,
                compensated=self.compensated)
            inc_scaled = inc * pose_scale
            q, t = lie.apply_inc_pose(cams.q, cams.t, inc_scaled[:, :6])
            intr = cams.intr + inc_scaled[:, 6:9]
            return CamState(q=q, t=t, intr=intr), new_lm_ps, l_diff

        # pure (untraced) stages; LinearizerBase._finalize_build
        # composes solve_pure and jits, the base drives the host loop
        self.error_pure = error_fn
        self.stage1_pure = stage1_fn
        self.stage2_pure = stage2_fn
        self.lsolve_pure = lsolve_fn
        self.apply_pure = apply_fn


def e0_assemble_dense(lins, buckets, Hll_invs, pair_csr, cam_flat,
                      cam_csr, lam, num_cameras, cam_strips=None):
    """Assemble E0 = Jp' Jl Hll^-1 Jl' Jp as a z-space dense matrix.

    The reference never materializes E0 (PoBA's selling point is the
    memory-light implicit sweep, sc/linearization_power_sc.hpp:250-272);
    on TPU the implicit sweep pays two large-table row gathers per
    power iteration (~23 ns/row at venice scale), while E0 is exactly
    the SC pair-product matrix, so one assembly makes every power
    iteration (and every PowerSC-preconditioner application inside CG)
    a dense GEMV."""
    from rootba_tpu.solver.linearization import assemble_rcs_dense

    HT, T, _ = _sc_strip_factors(lins, Hll_invs, pair_csr, cam_strips,
                                 with_jp=False)
    zero_lam = jnp.zeros((), lins[0].Jp.dtype)
    # assemble returns diag(terms) - pairs + 0*I = -E0; negate
    negE0, _ = assemble_rcs_dense(
        HT, T, [(HT, T, -1.0)], cam_flat, cam_csr,
        pair_csr, zero_lam, num_cameras, buckets=buckets,
        cam_strips=cam_strips)
    return -negE0


def e0_assemble_bsr(lins, buckets, Hll_invs, pair_idx, cam_flat,
                    cam_csr, num_cameras, cam_strips=None,
                    symmetric=False):
    """Block-sparse E0 (same matrix as e0_assemble_dense, no densify):
    for camera counts whose dense E0 exceeds HBM. Returns the NEGATED
    (blocks2, diag) pair -- apply as e0(v) = -bsr_matvec(blocks2,
    diag, bsr, v)."""
    from rootba_tpu.solver.linearization import assemble_rcs_bsr

    HT, T, _ = _sc_strip_factors(lins, Hll_invs, pair_idx, cam_strips,
                                 with_jp=False)
    zero_lam = jnp.zeros((), lins[0].Jp.dtype)
    return assemble_rcs_bsr(
        HT, T, [(HT, T, -1.0)], cam_flat, cam_csr,
        pair_idx, zero_lam, num_cameras, buckets=buckets,
        cam_strips=cam_strips, symmetric=symmetric)


class PowerSCLinearizer(SCLinearizer):
    """POWER_SCHUR_COMPLEMENT solver (reference
    solver/linearizor_power_sc.cpp): power-series solve, no CG. With
    the dense RCS enabled, E0 is assembled once per solve and each
    power iteration is a dense GEMV (see e0_assemble_dense); otherwise
    the implicit per-obs sweep is used, like the reference."""

    linear_solver_type = "bal_power_sc"

    def _build(self):
        opts = self.options
        self.dense_rcs = (self.mesh is None and 0 < self.num_cameras
                          <= opts.dense_rcs_max_cameras)
        # above the dense limit on a single device, assemble E0
        # block-sparsely (see e0_assemble_bsr) instead of the implicit
        # per-obs sweep (two O-sized row gathers per power iteration);
        # dense_rcs_max_cameras=0 disables explicit modes entirely
        self.bsr_rcs = (self.mesh is None and not self.dense_rcs
                        and opts.dense_rcs_max_cameras > 0)
        self.pair_csr = None
        bsr = None
        cstrips = None
        if self.dense_rcs or self.bsr_rcs:
            self.pair_csr, pairs_host = _build_pair_index(
                self.bp, self.num_cameras, opts.pair_gather,
                dense_grid=self.dense_rcs,
                min_group=opts.effective_strip_min_group(self.bp.num_observations))
            if self.bsr_rcs:
                from rootba_tpu.bal.bucketing import build_bsr_matvec
                from rootba_tpu.solver.linearization import (
                    BsrMatvecIndex,
                )

                bsr = BsrMatvecIndex.from_host(build_bsr_matvec(
                    pairs_host.pair_row, pairs_host.pair_col,
                    self.num_cameras))
            if opts.pair_gather == "stream":
                from rootba_tpu.bal.bucketing import build_cam_stream
                from rootba_tpu.solver.linearization import (
                    CamStreamIndex,
                )

                cstrips = CamStreamIndex.from_host(build_cam_stream(
                    self.bp.buckets, self.num_cameras))
            elif opts.pair_gather == "strips":
                from rootba_tpu.bal.bucketing import build_cam_strips
                from rootba_tpu.solver.linearization import (
                    CamStripsIndex,
                )

                cstrips = CamStripsIndex.from_host(build_cam_strips(
                    self.bp.buckets, self.num_cameras,
                    min_group=opts.effective_strip_min_group(self.bp.num_observations)))
        cam_flat = jnp.concatenate(
            [b.cam_idx.reshape(-1) for b in self.buckets])
        self.bsr_sym = self._bsr_symmetric(bsr)
        self.consts = (self.buckets, self.cam_csr, self.pair_csr,
                       cam_flat, cstrips, bsr)

        from rootba_tpu.solver.linearization import compute_error_buckets

        def error_fn(consts, cams, lm_ps):
            return compute_error_buckets(
                cams, lm_ps, consts[0], self.robust_norm, self.huber)

        def stage1_fn(consts, cams, lm_ps):
            return self._stage1_common(consts[0], cams, lm_ps,
                                       csr=consts[1])

        def stage2_fn(consts, lins, lam):
            """prepare_Hb (reference sc/linearization_power_sc.hpp:93-125):
            RHS + cached Hll^-1 + damped per-camera Hpp Cholesky."""
            buckets, csr, pair_csr, cam_flat, cstrips_, bsr_ = consts
            dtype = lins[0].Jp.dtype
            # per-bucket damped Hll^-1 + RHS b (landmark_block stage())
            b, Hll_invs = sc_rhs_and_hll(lins, buckets, lam,
                                         self.num_cameras, cam_csr=csr,
                                         cam_strips=cstrips_)

            hpp = jp_gram_blockdiag(lins, buckets, lam,
                                    self.num_cameras)
            # SPD -> Cholesky solves (reference llt(),
            # sc/linearization_power_sc.hpp:111-124)
            hpp_chol = chol9(hpp)

            E0 = None
            if self.dense_rcs:
                E0 = e0_assemble_dense(lins, buckets, Hll_invs,
                                       pair_csr, cam_flat, csr, lam,
                                       self.num_cameras,
                                       cam_strips=cstrips_)
            elif self.bsr_rcs:
                from rootba_tpu.solver.linearization import (
                    bsr_build_table,
                )

                neg_half, neg_diag = e0_assemble_bsr(
                    lins, buckets, Hll_invs, pair_csr, cam_flat, csr,
                    self.num_cameras, cam_strips=cstrips_,
                    symmetric=True)
                E0 = (bsr_build_table(neg_half, bsr_, self.bsr_sym),
                      neg_diag)
            stage2 = SCStage2(H=jnp.zeros((0, P9, P9), dtype), b=b,
                              Hll_inv=Hll_invs,
                              lam=jnp.asarray(lam, dtype))
            return stage2, hpp_chol, E0

        def lsolve_fn(consts, lins, aux):
            """Power-series solve (sc/linearization_power_sc.hpp:127-154)."""
            buckets, csr, pair_csr, cam_flat, cstrips_, bsr_ = consts
            stage2, hpp_chol, E0 = aux

            from rootba_tpu.ops.block9 import chol9_inv, inv9_apply

            hpp_inv = chol9_inv(hpp_chol)

            def apply_hpp_inv(v):
                return inv9_apply(hpp_inv, v)

            if self.dense_rcs:
                def apply_e0(v):
                    return sc_matvec_dense(E0, v)
            elif self.bsr_rcs:
                from rootba_tpu.solver.linearization import (
                    bsr_table_matvec,
                )

                neg_table, neg_diag = E0
                neg_mv = bsr_table_matvec(neg_table, neg_diag, bsr_,
                                          self.bsr_sym)

                def apply_e0(v):
                    return -neg_mv(v)
            else:
                def apply_e0(v):
                    return e0_matvec(lins, buckets, stage2.Hll_inv,
                                     self.num_cameras, v, csr=csr)

            inc, iters = power_series_solve(
                apply_hpp_inv, apply_e0, stage2.b, opts.power_order,
                q_tolerance=opts.eta)
            return inc, stage2, iters, jnp.asarray(1, jnp.int32)

        def apply_fn(consts, cams, lm_ps, lins, stage2, pose_scale, inc):
            new_lm_ps, l_diff = sc_back_substitute(
                lins, consts[0], stage2.Hll_inv, lm_ps, inc,
                compensated=self.compensated)
            inc_scaled = inc * pose_scale
            q, t = lie.apply_inc_pose(cams.q, cams.t, inc_scaled[:, :6])
            intr = cams.intr + inc_scaled[:, 6:9]
            return CamState(q=q, t=t, intr=intr), new_lm_ps, l_diff

        # pure (untraced) stages; LinearizerBase._finalize_build
        # composes solve_pure and jits, the base drives the host loop
        self.error_pure = error_fn
        self.stage1_pure = stage1_fn
        self.stage2_pure = stage2_fn
        self.lsolve_pure = lsolve_fn
        self.apply_pure = apply_fn
