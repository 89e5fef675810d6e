"""Camera-major SQUARE_ROOT solver: gather-free camera reductions.

Profiling the flat layout on TPU v5e (benchmarks/flat_times.py,
trafalgar-257) shows the CG matvec and stage2 are bound not by HBM
bandwidth but by gather issue rate (~3 elements/cycle): the two
O-sized row gathers per matvec (camera-parameter gather x[cam_idx] and
the camera-CSR reduction of the 36-byte contribution rows) cost ~1.3 ms
of the 1.6 ms matvec, and stage2's [L,m,3] batched QR pays ~42x tile
padding on its minor dims.

Design (this module): TWO static observation orderings with cheap
8-byte permutes between them.

  * cam-order: all real observations sorted by camera into fixed-width
    virtual rows (bucketing.CamCsr; S = R*width slots). The pose
    Jacobian Jp lives ONLY here as [S,2,9]. Consequences:
      - camera-parameter access is a tiny [R]-level gather broadcast
        over width lanes (the reference gathers per obs,
        linearization_qr.hpp:406-429);
      - every per-camera reduction (matvec output, RHS b, Jp col
        norms, preconditioner blocks) is a reshape-sum over the width
        axis plus an [N,vmax] second level -- NO scatter, NO O-sized
        gather (the reference uses per-camera mutexes here);
      - jacobi pose-column scaling broadcasts for free.
  * lm-order: per-bucket planar [rows, L] tensors (landmarks on lanes)
    for everything grouped by landmark: Jl, residuals, the landmark QR
    (Q1h, R), back-substitution. Per-landmark reductions are sublane
    sums; nothing materializes with a small trailing dim.

The only O-sized gathers left per CG iteration are the two 8-byte
permutes of the intermediate w/wp rows (lm2cs / cs2lm index arrays),
~9x fewer gathered elements than the flat layout.

Math is identical to solver.sqrt_flat / solver.sqrt_qr (projection-form
sqrt marginalization; reference qr/linearization_qr.hpp,
qr/impl/landmark_block_base.ipp); equivalence is asserted in
tests/test_cm.py.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rootba_tpu.ops.block9 import chol9, chol9_solve
from rootba_tpu.config.options import PreconditionerType, SolverOptions
from rootba_tpu.core import lie
from rootba_tpu.ops import planar as pops
from rootba_tpu.solver.cg import pcg
from rootba_tpu.solver.linearization import POSE_SIZE, CamState
from rootba_tpu.solver.sqrt_qr import precond_apply
from rootba_tpu.utils.jax_setup import sync

P9 = POSE_SIZE


class CmIndex(NamedTuple):
    """Static index arrays of the camera-major layout (device)."""

    row_cam: jnp.ndarray  # [R] int32 camera of each virtual row
    idx2: jnp.ndarray  # [N, vmax] int32 virtual rows of each camera
    cs2lm: jnp.ndarray  # [S] int32 flat obs slot of each CSR slot (pad=O)
    lm2cs: jnp.ndarray  # [O] int32 CSR slot of each flat obs slot (pad=S)
    cs_lm: jnp.ndarray  # [S] int32 global landmark row (pad=Ltot)
    cs_obs_u: jnp.ndarray  # [S]
    cs_obs_v: jnp.ndarray  # [S]
    cs_mask: jnp.ndarray  # [S] bool (True = real observation)


class CmLin(NamedTuple):
    """Stage-1 output."""

    Jp: jnp.ndarray  # [S,2,9] cam-order, sqrt-weighted, pose-scaled
    Jl: Tuple[jnp.ndarray, ...]  # per bucket planar [6n, L] (i*6+r*3+c)
    r: Tuple[jnp.ndarray, ...]  # per bucket planar [2n, L] (i*2+r)
    Jl_scale: Tuple[jnp.ndarray, ...]  # per bucket [3, L]


class CmStage2(NamedTuple):
    """Per-lambda marginalization data."""

    Q1h: Tuple[jnp.ndarray, ...]  # per bucket [3, 2n, L] (c, i*2+r, l)
    R: Tuple[jnp.ndarray, ...]  # per bucket [9, L] (3x3 row-major rows)
    b: jnp.ndarray  # [N,9]
    precond_chol: jnp.ndarray  # [N,9,9]
    lam: jnp.ndarray


def gather_rows_ext(rows: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """rows [M, ...] gathered at idx with sentinel idx == M -> zeros."""
    ext = jnp.concatenate(
        [rows, jnp.zeros((1,) + rows.shape[1:], rows.dtype)], axis=0)
    return ext[idx]


def cm_reduce(vals: jnp.ndarray, cm: CmIndex, num_cameras: int,
              width: int) -> jnp.ndarray:
    """Per-camera sum of cam-order per-slot rows [S, F] -> [N, F].

    Level 1 is a pure reshape-sum (slots of one virtual row are
    contiguous and belong to one camera); level 2 gathers each camera's
    few virtual rows ([N, vmax] with vmax small)."""
    S = vals.shape[0]
    rsum = jnp.sum(vals.reshape(S // width, width, -1), axis=1)
    return jnp.sum(gather_rows_ext(rsum, cm.idx2), axis=1)


def cm_bcast(rows: jnp.ndarray, width: int) -> jnp.ndarray:
    """Per-virtual-row rows [R, F] -> per-slot [S, F] broadcast."""
    R, F = rows.shape
    return jnp.broadcast_to(rows[:, None, :], (R, width, F)).reshape(
        R * width, F)


def to_planar(v: jnp.ndarray, L: int, n: int) -> jnp.ndarray:
    """lm-order rows [L*n, F] -> planar [(n*F), L] (row = i*F + f)."""
    return v.reshape(L, n * v.shape[-1]).T


def from_planar(p: jnp.ndarray, L: int, n: int, F: int) -> jnp.ndarray:
    """planar [(n*F), L] -> lm-order rows [L*n, F]."""
    return p.T.reshape(L * n, F)


def build_cm_index(bp, dtype) -> Tuple[CmIndex, int]:
    """Host-side construction of the CmIndex from a BucketedProblem."""
    csr = bp.cam_csr
    width = csr.idx.shape[1]
    cs2lm = csr.idx.reshape(-1).astype(np.int64)
    obs_flat = np.concatenate(
        [b.obs_uv.reshape(-1, 2) for b in bp.buckets], axis=0)
    obs_ext = np.concatenate([obs_flat, np.zeros((1, 2))], axis=0)
    cs_obs = obs_ext[cs2lm]
    cs_mask = cs2lm < csr.total_slots
    return CmIndex(
        row_cam=jnp.asarray(csr.row_cam),
        idx2=jnp.asarray(csr.idx2),
        cs2lm=jnp.asarray(cs2lm.astype(np.int32)),
        lm2cs=jnp.asarray(csr.lm2cs),
        cs_lm=jnp.asarray(csr.cs_lm),
        cs_obs_u=jnp.asarray(cs_obs[:, 0], dtype),
        cs_obs_v=jnp.asarray(cs_obs[:, 1], dtype),
        cs_mask=jnp.asarray(cs_mask),
    ), width


def cm_cam_planes(cams: CamState, cm: CmIndex, width: int):
    """Camera-parameter planes per CSR slot: one [R]-level gather of
    the 10 parameters, broadcast over the width lanes."""
    table = jnp.concatenate([cams.q, cams.t, cams.intr], axis=1)  # [N,10]
    rows = table[cm.row_cam]  # [R,10]
    slot = cm_bcast(rows, width)  # [S,10]
    return tuple(slot[:, i] for i in range(10))


def cm_linearize(cams, lm_ps, cm: CmIndex, width, bucket_shapes,
                 robust_norm, huber_parameter, use_valid_only,
                 jacobi_eps, jacobi_scaling, num_cameras):
    """Stage 1 (reference get_stage1 fusion, linearization_qr.hpp:
    634-712): one cam-order linearization pass; Jl/r permuted to
    lm-order planar buckets; pose jacobi scaling via reshape-reduce."""
    dtype = lm_ps[0].dtype

    lm_all = jnp.concatenate([p for p in lm_ps], axis=0)  # [Ltot,3]
    pXYZ = gather_rows_ext(lm_all, cm.cs_lm)  # [S,3]

    res_u, res_v, valid, Jp_pl, Jl_pl = pops.snavely_planes(
        *cm_cam_planes(cams, cm, width),
        pXYZ[:, 0], pXYZ[:, 1], pXYZ[:, 2],
        cm.cs_obs_u, cm.cs_obs_v)
    sw, use_mask = pops.robust_sqrt_weight(
        res_u, res_v, valid, cm.cs_mask, robust_norm, huber_parameter,
        use_valid_only)

    finite = jnp.isfinite(res_u) & jnp.isfinite(res_v)
    for v in Jp_pl + Jl_pl:
        finite = finite & jnp.isfinite(v)
    failures = jnp.sum(jnp.where(use_mask & ~finite, 1, 0))

    Jp = jnp.stack([sw * v for v in Jp_pl], axis=-1).reshape(-1, 2, P9)

    # pose jacobi scaling: per-camera column norms via reshape-reduce
    d2 = jnp.sum(Jp * Jp, axis=1)  # [S,9]
    diag2 = cm_reduce(d2, cm, num_cameras, width)
    if jacobi_scaling:
        pose_scale = 1.0 / (jacobi_eps + jnp.sqrt(diag2))
    else:
        pose_scale = jnp.ones_like(diag2)
    ps_slot = cm_bcast(pose_scale[cm.row_cam], width)  # [S,9]
    Jp = Jp * ps_slot[:, None, :]

    # Jl + r to lm-order planar buckets (one 8-plane 32-byte permute)
    lm_rows = jnp.stack(
        [sw * v for v in Jl_pl] + [sw * res_u, sw * res_v],
        axis=-1)  # [S,8]
    lm_rows = gather_rows_ext(lm_rows, cm.lm2cs)  # [O,8]

    Jls, rs, scales = [], [], []
    a = 0
    for (L, n) in bucket_shapes:
        pl8 = to_planar(lm_rows[a:a + L * n], L, n)  # [8n, L]
        rows8 = pl8.reshape(n, 8, L)
        Jl = rows8[:, :6, :].reshape(6 * n, L)  # row i*6 + r*3 + c
        r = rows8[:, 6:, :].reshape(2 * n, L)  # row i*2 + r
        # landmark-Jacobian column scaling (landmark_block_base.ipp:
        # 572-587): norm over the 2n rows of each column c
        col2 = jnp.sum(
            (Jl * Jl).reshape(n, 2, 3, L), axis=(0, 1))  # [3, L]
        scale = 1.0 / (jacobi_eps + jnp.sqrt(col2))
        Jl = (Jl.reshape(n, 2, 3, L) * scale[None, None, :, :]).reshape(
            6 * n, L)
        Jls.append(Jl)
        rs.append(r)
        scales.append(scale)
        a += L * n

    return (CmLin(Jp=Jp, Jl=tuple(Jls), r=tuple(rs),
                  Jl_scale=tuple(scales)),
            pose_scale, failures)


def lm_to_cs(parts, cm: CmIndex, bucket_shapes, F: int) -> jnp.ndarray:
    """Per-bucket planar [(n*F), L] tensors -> cam-order rows [S, F]
    (one F*4-byte permute)."""
    rows = jnp.concatenate(
        [from_planar(p, L, n, F)
         for p, (L, n) in zip(parts, bucket_shapes)], axis=0)
    return gather_rows_ext(rows, cm.cs2lm)


def cs_to_lm_planar(rows: jnp.ndarray, cm: CmIndex, bucket_shapes):
    """Cam-order per-slot rows [S, F] -> per-bucket planar [(n*F), L]."""
    lm_rows = gather_rows_ext(rows, cm.lm2cs)  # [O, F]
    out = []
    a = 0
    for (L, n) in bucket_shapes:
        out.append(to_planar(lm_rows[a:a + L * n], L, n))
        a += L * n
    return tuple(out)


def project_out_q1(Q1h: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """wp = (I - Q1h Q1h^T) w per landmark: Q1h [3, 2n, L], w [2n, L]."""
    t = jnp.einsum("crl,rl->cl", Q1h, w)  # [3, L]
    return w - jnp.einsum("crl,cl->rl", Q1h, t)


def cm_stage2(lin: CmLin, cm: CmIndex, width, bucket_shapes, lam,
              num_cameras, *, precond_jacobi=False) -> CmStage2:
    """Stage 2 (reference get_stage2, linearization_qr.hpp:716-815):
    landmark damping via augmented planar thin-QR, RHS, preconditioner."""
    dtype = lin.Jp.dtype
    sqrt_lam = jnp.sqrt(lam).astype(dtype)

    Q1hs, Rs, wps = [], [], []
    for Jl, r, (L, n) in zip(lin.Jl, lin.r, bucket_shapes):
        m = 2 * n + 3
        cols = []
        for c in range(3):
            col = jnp.zeros((m, L), dtype)
            col = col.at[:2 * n].set(
                Jl.reshape(n, 2, 3, L)[:, :, c, :].reshape(2 * n, L))
            col = col.at[2 * n + c].set(sqrt_lam)
            cols.append(col)
        Rcols, Q1 = pops.planar_qr3(cols, m)
        R9 = jnp.stack([Rcols[k][c] for k in range(3) for c in range(3)])
        Q1h = jnp.stack([Q1[c][:2 * n] for c in range(3)])  # [3,2n,L]
        Q1hs.append(Q1h)
        Rs.append(R9)
        wps.append(project_out_q1(Q1h, r))

    # RHS b = sum_o Jp_o^T wp_o via the cam-order reduce
    wp_cs = lm_to_cs(wps, cm, bucket_shapes, 2)  # [S,2]
    yb = jnp.einsum("srj,sr->sj", lin.Jp, wp_cs)
    b = cm_reduce(yb, cm, num_cameras, width)

    # preconditioner blocks: JACOBI = sum Jp_o^T Jp_o; SCHUR_JACOBI
    # subtracts W^T W, W = Q1h_o^T Jp_o (cross-obs terms vanish on the
    # diagonal blocks). 81-wide rows reduced by reshape-sum.
    S = lin.Jp.shape[0]

    def gram81(M):  # [S, rows, 9] -> [S, 81]
        A = jnp.repeat(M, P9, axis=2)
        B = jnp.tile(M, (1, 1, P9))
        return jnp.sum(A * B, axis=1)

    blk = gram81(lin.Jp)
    if not precond_jacobi:
        # Q1h [3,2n,L] -> planar rows i*6 + r*3 + c -> cam-order [S,2,3]
        q1h_cs = lm_to_cs(
            [q.reshape(3, n, 2, L).transpose(1, 2, 0, 3).reshape(6 * n, L)
             for q, (L, n) in zip(Q1hs, bucket_shapes)],
            cm, bucket_shapes, 6).reshape(S, 2, 3)
        A = jnp.repeat(q1h_cs, P9, axis=2)  # [S,2,27]
        B = jnp.tile(lin.Jp, (1, 1, 3))  # [S,2,27]
        W27 = jnp.sum(A * B, axis=1)  # [S,27] (c*9+j)
        blk = blk - gram81(W27.reshape(S, 3, P9))
    blocks = cm_reduce(blk, cm, num_cameras, width).reshape(
        num_cameras, P9, P9)
    blocks = blocks + lam.astype(dtype) * jnp.eye(P9, dtype=dtype)
    chol = chol9(blocks)

    return CmStage2(Q1h=tuple(Q1hs), R=tuple(Rs), b=b,
                    precond_chol=chol, lam=jnp.asarray(lam, dtype))


def cm_matvec(lin: CmLin, stage2: CmStage2, cm: CmIndex, width,
              bucket_shapes, num_cameras, x):
    """y = [(Q2^T Jp)^T (Q2^T Jp) + lam I] x (right_multiply,
    linearization_qr.hpp:823-825) with gather-free camera access."""
    xg = cm_bcast(x[cm.row_cam], width)  # [S,9]
    w_cs = jnp.einsum("srj,sj->sr", lin.Jp, xg)  # [S,2]
    w_pl = cs_to_lm_planar(w_cs, cm, bucket_shapes)
    wps = [project_out_q1(Q1h, w)
           for Q1h, w in zip(stage2.Q1h, w_pl)]
    wp_cs = lm_to_cs(wps, cm, bucket_shapes, 2)
    yb = jnp.einsum("srj,sr->sj", lin.Jp, wp_cs)
    red = cm_reduce(yb, cm, num_cameras, width)
    return stage2.lam.astype(x.dtype) * x + red


def cm_back_substitute(lin: CmLin, stage2: CmStage2, cm: CmIndex, width,
                       bucket_shapes, lm_ps, lm_masks, pose_inc):
    """Landmark back-substitution + model cost decrease
    (landmark_block_base.ipp:213-284)."""
    xg = cm_bcast(pose_inc[cm.row_cam], width)
    w_cs = jnp.einsum("srj,sj->sr", lin.Jp, xg)
    w_pl = cs_to_lm_planar(w_cs, cm, bucket_shapes)

    acc = jnp.result_type(pose_inc.dtype, jnp.float32)
    l_diff = jnp.zeros((), acc)
    new_lm_ps = []
    for Jl, r, Q1h, R9, scale, w, lm_p, lm_mask, (L, n) in zip(
            lin.Jl, lin.r, stage2.Q1h, stage2.R, lin.Jl_scale, w_pl,
            lm_ps, lm_masks, bucket_shapes):
        u = r + w  # [2n, L]
        rhs3 = jnp.einsum("crl,rl->cl", Q1h, u)  # [3, L]
        R = [[R9[k * 3 + c] for c in range(3)] for k in range(3)]
        dl = pops.solve_upper_rows(R, [-rhs3[0], -rhs3[1], -rhs3[2]])
        dl = [jnp.where(lm_mask, d, 0.0) for d in dl]
        dl3 = jnp.stack(dl)  # [3, L]

        v = w + jnp.einsum(
            "ircl,cl->irl",
            Jl.reshape(n, 2, 3, L), dl3).reshape(2 * n, L)
        l_diff = l_diff - jnp.sum((v * (0.5 * v + r)).astype(acc))
        new_lm_ps.append(lm_p + (dl3 * scale).T.astype(lm_p.dtype))

    return tuple(new_lm_ps), l_diff


def cm_compute_error(cams, lm_ps, cm: CmIndex, width, robust_norm,
                     huber_parameter):
    """Whole-problem cost (reference compute_error,
    bal_bundle_adjustment_helper.cpp:67-109), entirely cam-order: no
    per-landmark grouping is needed for a global sum."""
    from rootba_tpu.core.residuals import (
        ResidualInfo,
        ResidualItem,
        compute_error_weight,
        default_acc_dtype,
    )

    lm_all = jnp.concatenate([p for p in lm_ps], axis=0)
    pXYZ = gather_rows_ext(lm_all, cm.cs_lm)
    res_u, res_v, valid, _, _ = pops.snavely_planes(
        *cm_cam_planes(cams, cm, width),
        pXYZ[:, 0], pXYZ[:, 1], pXYZ[:, 2],
        cm.cs_obs_u, cm.cs_obs_v, with_jacobians=False)

    acc = default_acc_dtype()
    m = cm.cs_mask
    res_sq = res_u * res_u + res_v * res_v
    err, _ = compute_error_weight(res_sq, robust_norm, huber_parameter)
    rn = jnp.sqrt(jnp.maximum(res_sq, 0.0))
    # mask via where (padded slots hold garbage that may be inf/nan;
    # multiplying by 0 would still poison the sums)
    err_m = jnp.where(m, err.astype(acc), 0.0)
    rn_m = jnp.where(m, rn.astype(acc), 0.0)
    mv = m & valid
    finite = jnp.all(jnp.where(m, jnp.isfinite(res_u)
                               & jnp.isfinite(res_v), True))
    return ResidualInfo(
        all=ResidualItem(num_obs=jnp.sum(m).astype(jnp.int32),
                         error=jnp.sum(err_m),
                         residual_sum=jnp.sum(rn_m)),
        valid=ResidualItem(num_obs=jnp.sum(mv).astype(jnp.int32),
                           error=jnp.sum(jnp.where(mv, err_m, 0.0)),
                           residual_sum=jnp.sum(jnp.where(mv, rn_m, 0.0))),
        is_numerically_valid=finite,
    )


# ---------------------------------------------------------------------------

from rootba_tpu.solver.lm import BAState, LinearizerBase  # noqa: E402


class CmSqrtLinearizer(LinearizerBase):
    """SQUARE_ROOT solver in the camera-major layout."""

    linear_solver_type = "bal_qr"

    def _build(self):
        opts = self.options
        precond_jacobi = (opts.preconditioner_type
                          == PreconditionerType.JACOBI)
        if opts.preconditioner_type not in (
                PreconditionerType.JACOBI, PreconditionerType.SCHUR_JACOBI):
            raise ValueError(
                f"preconditioner {opts.preconditioner_type} not implemented "
                f"for the SQUARE_ROOT solver")
        self._bp_shapes = tuple(
            (b.cam_idx.shape[0], b.cam_idx.shape[1]) for b in self.buckets)
        cmi, width = build_cm_index(self._bp, self.dtype)
        self._width = width
        lm_masks = tuple(b.lm_mask for b in self.buckets)
        self.consts = (cmi, lm_masks)
        N = self.num_cameras
        shapes = self._bp_shapes
        use_valid = opts.use_projection_validity_check()

        def error_fn(consts, cams, lm_ps):
            return cm_compute_error(cams, lm_ps, consts[0], width,
                                    self.robust_norm, self.huber)

        def stage1_fn(consts, cams, lm_ps):
            return cm_linearize(
                cams, lm_ps, consts[0], width, shapes, self.robust_norm,
                self.huber, use_valid, self.jacobi_eps,
                opts.jacobi_scaling, N)

        def solve_fn(consts, lins, lam):
            stage2 = cm_stage2(lins, consts[0], width, shapes, lam, N,
                               precond_jacobi=precond_jacobi)
            res = pcg(
                lambda x: cm_matvec(lins, stage2, consts[0], width,
                                    shapes, N, x),
                lambda r: precond_apply(stage2.precond_chol, r),
                stage2.b,
                min_num_iterations=opts.min_linear_solver_iterations,
                max_num_iterations=opts.max_linear_solver_iterations,
                q_tolerance=opts.eta,
                r_tolerance=-1.0,
            )
            # we solve H(-x) = b -> negate (linearizor_base.cpp:99-101)
            return (-res.x, stage2, res.num_iterations,
                    res.termination_type)

        def apply_fn(consts, cams, lm_ps, lins, stage2, pose_scale, inc):
            new_lm_ps, l_diff = cm_back_substitute(
                lins, stage2, consts[0], width, shapes, lm_ps,
                consts[1], inc)
            inc_scaled = inc * pose_scale
            q, t = lie.apply_inc_pose(cams.q, cams.t, inc_scaled[:, :6])
            intr = cams.intr + inc_scaled[:, 6:9]
            return CamState(q=q, t=t, intr=intr), new_lm_ps, l_diff

        self.error_pure = error_fn
        self.stage1_pure = stage1_fn
        self.solve_pure = solve_fn
        self.apply_pure = apply_fn
        self._error_fn = jax.jit(error_fn)
        self._stage1_fn = jax.jit(stage1_fn)
        self._solve_fn = jax.jit(solve_fn)
        self._apply_fn = jax.jit(apply_fn)

    def __init__(self, bp, options, dtype, mesh=None):
        if mesh is not None:
            raise ValueError("kernel_layout='cm' is single-device; "
                             "meshes use the einsum layout")
        self._bp = bp
        super().__init__(bp, options, dtype, mesh)

    # host-loop driver interface (mirrors FlatSqrtLinearizer)
    def linearize(self):
        t0 = time.monotonic()
        lins, pose_scale, failures = sync(
            self._stage1_fn(self.consts, self.state.cams,
                            self.state.lm_ps))
        if int(failures) > 0:
            raise FloatingPointError(
                f"numerical failure during linearization "
                f"({int(failures)} observations)")
        self._lins = lins
        self._pose_scale = pose_scale
        if self.it_summary is not None:
            self.it_summary.stage1_time_in_seconds = time.monotonic() - t0
            self.it_summary.jacobian_evaluation_time_in_seconds = (
                self.it_summary.stage1_time_in_seconds)
        if self.summary is not None:
            self.summary.num_jacobian_evaluations += 1

    def solve(self, lam):
        t0 = time.monotonic()
        lam_arr = jnp.asarray(lam, self.dtype)
        inc, stage2, cg_iters, cg_term = sync(
            self._solve_fn(self.consts, self._lins, lam_arr))
        self._stage2 = stage2
        if self.it_summary is not None:
            dt = time.monotonic() - t0
            self.it_summary.stage2_time_in_seconds = dt * 0.2
            self.it_summary.solve_reduced_system_time_in_seconds = dt * 0.8
            self.it_summary.linear_solver_iterations = int(cg_iters)
            self.it_summary.linear_solver_message = (
                f"cg_term={int(cg_term)} iters={int(cg_iters)}")
            self.it_summary.linear_solver_type = self.linear_solver_type
        if self.summary is not None:
            self.summary.num_linear_solves += 1
        return inc

    def apply(self, inc):
        t0 = time.monotonic()
        cams, lm_ps, l_diff = sync(self._apply_fn(
            self.consts, self.state.cams, self.state.lm_ps, self._lins,
            self._stage2, self._pose_scale, inc))
        if self.it_summary is not None:
            self.it_summary.back_substitution_time_in_seconds = (
                time.monotonic() - t0)
        return BAState(cams=cams, lm_ps=lm_ps), float(l_diff)
