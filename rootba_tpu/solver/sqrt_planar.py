"""Planar-layout SQUARE_ROOT linearizer (TPU hot path).

Same math as solver.sqrt_qr (projection-form sqrt marginalization; see
that module's docstring for the derivation and reference citations) but
every tensor is in the planar [features, L] layout of ops.planar, so
nothing materializes with small trailing dims. This is the default
sqrt-BA implementation; sqrt_qr remains as the readable einsum
formulation and as the cross-check in tests/test_planar.py.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Tuple

import jax
from rootba_tpu.ops.block9 import chol9, chol9_solve
from rootba_tpu.utils.jax_setup import sync
import jax.numpy as jnp

from rootba_tpu.config.options import PreconditionerType, SolverOptions
from rootba_tpu.core import lie
from rootba_tpu.ops import planar as pl
from rootba_tpu.solver.cg import pcg
from rootba_tpu.solver.linearization import POSE_SIZE, CamState
from rootba_tpu.solver.sqrt_qr import precond_apply

P9 = POSE_SIZE


class PlanarStage2(NamedTuple):
    Q1h: Tuple[jnp.ndarray, ...]  # per bucket [3*2n, L] (c*2n + row)
    R: Tuple[jnp.ndarray, ...]  # per bucket [9, L] (3x3 row-major)
    b: jnp.ndarray  # [N, 9]
    precond_chol: jnp.ndarray  # [N, 9, 9]
    lam: jnp.ndarray


from rootba_tpu.solver.lm import BAState, LinearizerBase  # noqa: E402


def _jp_row(lin, i, r, j):
    return lin.Jp[i * 18 + r * 9 + j]


def _jl_row(lin, i, r, c):
    return lin.Jl[i * 6 + r * 3 + c]


class PlanarSqrtLinearizer(LinearizerBase):
    """SQUARE_ROOT solver in planar layout (default on TPU)."""

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
        self.pbuckets = tuple(pl.to_planar_bucket(b) for b in self.buckets)
        # planar buckets as runtime args (see LinearizerBase.consts)
        self.consts = self.pbuckets
        N = self.num_cameras
        use_valid = self.options.use_projection_validity_check()

        # ---- error ----------------------------------------------------
        def error_fn(pbuckets, cams, lm_ps):
            from rootba_tpu.core.residuals import (
                ResidualInfo,
                ResidualItem,
                default_acc_dtype,
            )

            acc = default_acc_dtype()
            za = jnp.zeros((), acc)
            zi = jnp.zeros((), jnp.int32)
            tots = dict(ae=za, ar=za, an=zi, ve=za, vr=za, vn=zi,
                        finite=jnp.asarray(True))
            for lm_pl, bucket in zip(lm_ps, pbuckets):
                X, Y, Z = lm_pl[0], lm_pl[1], lm_pl[2]
                for i in range(bucket.cam_idx.shape[0]):
                    res_u, res_v, valid, _, _, _, _ = pl.linearize_slot(
                        cams, X, Y, Z, bucket, i, self.robust_norm,
                        self.huber, use_valid, with_jacobians=False)
                    m = bucket.mask[i]
                    res_sq = res_u * res_u + res_v * res_v
                    from rootba_tpu.core.residuals import (
                        compute_error_weight,
                    )

                    err, _ = compute_error_weight(
                        res_sq, self.robust_norm, self.huber)
                    rn = jnp.sqrt(res_sq)
                    mf = m.astype(acc)
                    vf = (m & valid).astype(acc)
                    tots["ae"] += jnp.sum(err.astype(acc) * mf)
                    tots["ar"] += jnp.sum(rn.astype(acc) * mf)
                    tots["an"] += jnp.sum(m).astype(jnp.int32)
                    tots["ve"] += jnp.sum(err.astype(acc) * vf)
                    tots["vr"] += jnp.sum(rn.astype(acc) * vf)
                    tots["vn"] += jnp.sum(m & valid).astype(jnp.int32)
                    tots["finite"] &= jnp.all(
                        jnp.where(m, jnp.isfinite(res_u)
                                  & jnp.isfinite(res_v), True))
            return ResidualInfo(
                all=ResidualItem(num_obs=tots["an"], error=tots["ae"],
                                 residual_sum=tots["ar"]),
                valid=ResidualItem(num_obs=tots["vn"], error=tots["ve"],
                                   residual_sum=tots["vr"]),
                is_numerically_valid=tots["finite"],
            )

        # ---- stage 1 --------------------------------------------------
        def stage1_fn(pbuckets, cams, lm_ps):
            raw = []
            diag2 = jnp.zeros((N, P9), self.dtype)
            failures = jnp.zeros((), jnp.int32)
            for lm_pl, bucket in zip(lm_ps, pbuckets):
                n, L = bucket.cam_idx.shape
                X, Y, Z = lm_pl[0], lm_pl[1], lm_pl[2]
                Jp_rows_all = []
                Jl_rows_all = []
                r_rows_all = []
                d2_rows = []
                for i in range(n):
                    res_u, res_v, valid, um, sw, Jp_rows, Jl_rows = \
                        pl.linearize_slot(
                            cams, X, Y, Z, bucket, i, self.robust_norm,
                            self.huber, use_valid)
                    Jp_rows_all.extend(Jp_rows)
                    Jl_rows_all.extend(Jl_rows)
                    r_rows_all.extend([sw * res_u, sw * res_v])
                    # per-camera column squared norms (add_Jp_diag2)
                    for j in range(P9):
                        d2_rows.append(Jp_rows[j] ** 2
                                       + Jp_rows[9 + j] ** 2)
                    finite = jnp.isfinite(res_u) & jnp.isfinite(res_v)
                    for v in Jp_rows + Jl_rows:
                        finite = finite & jnp.isfinite(v)
                    failures = failures + jnp.sum(
                        jnp.where(um & ~finite, 1, 0))
                diag2 = diag2 + pl.flat_cam_scatter(
                    d2_rows, bucket.cam_idx, N, P9)
                raw.append((Jp_rows_all, Jl_rows_all, r_rows_all,
                            bucket))
            if self.options.jacobi_scaling:
                pose_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(diag2))
            else:
                pose_scale = jnp.ones_like(diag2)
            psT = pose_scale.T  # [9, N]

            lins = []
            for Jp_rows_all, Jl_rows_all, r_rows_all, bucket in raw:
                n, L = bucket.cam_idx.shape
                # landmark-Jacobian column scaling (scale_Jl_cols)
                scale_rows = []
                for c in range(3):
                    s = jnp.zeros((L,), self.dtype)
                    for i in range(n):
                        for r in range(2):
                            v = Jl_rows_all[i * 6 + r * 3 + c]
                            s = s + v * v
                    scale_rows.append(
                        1.0 / (self.jacobi_eps + jnp.sqrt(s)))
                Jl_scaled = []
                for i in range(n):
                    for r in range(2):
                        for c in range(3):
                            Jl_scaled.append(
                                Jl_rows_all[i * 6 + r * 3 + c]
                                * scale_rows[c])
                # pose-Jacobian column scaling (scale_Jp_cols)
                Jp_scaled = []
                for i in range(n):
                    idx = bucket.cam_idx[i]
                    ps = [psT[j][idx] for j in range(P9)]
                    for r in range(2):
                        for j in range(P9):
                            Jp_scaled.append(
                                Jp_rows_all[i * 18 + r * 9 + j] * ps[j])
                lins.append(pl.PlanarLin(
                    Jp=jnp.stack(Jp_scaled),
                    Jl=jnp.stack(Jl_scaled),
                    r=jnp.stack(r_rows_all),
                    Jl_scale=jnp.stack(scale_rows),
                ))
            return tuple(lins), pose_scale, failures

        # ---- stage 2 + CG --------------------------------------------
        def stage2(pbuckets, lins, lam):
            dtype = self.dtype
            sqrt_lam = jnp.sqrt(lam).astype(dtype)
            b_accum = jnp.zeros((N, P9), dtype)
            blocks = jnp.zeros((N, P9 * P9), dtype)
            Q1hs = []
            Rs = []
            for lin, bucket in zip(lins, pbuckets):
                n, L = bucket.cam_idx.shape
                m = 2 * n + 3
                cols = []
                for c in range(3):
                    col = jnp.zeros((m, L), dtype)
                    rows = [lin.Jl[i * 6 + r * 3 + c]
                            for i in range(n) for r in range(2)]
                    col = col.at[:2 * n].set(jnp.stack(rows))
                    col = col.at[2 * n + c].set(sqrt_lam)
                    cols.append(col)
                R, Q1 = pl.planar_qr3(cols, m)
                Q1h = [Q1[c][:2 * n] for c in range(3)]  # [2n, L] x3
                Q1hs.append(jnp.concatenate(Q1h, axis=0))
                Rs.append(jnp.stack([R[k][c] for k in range(3)
                                     for c in range(3)]))

                # RHS: Jp' (r - Q1h Q1h' r)
                w = lin.r  # [2n, L]
                t = [jnp.sum(Q1h[c] * w, axis=0) for c in range(3)]
                wp = w - sum(Q1h[c] * t[c][None, :] for c in range(3))
                y_rows = []
                for i in range(n):
                    for j in range(P9):
                        y_rows.append(
                            _jp_row(lin, i, 0, j) * wp[2 * i]
                            + _jp_row(lin, i, 1, j) * wp[2 * i + 1])
                b_accum = b_accum + pl.flat_cam_scatter(
                    y_rows, bucket.cam_idx, N, P9)

                # preconditioner blocks
                blk_rows = []
                for i in range(n):
                    Jpi = [[_jp_row(lin, i, r, j) for j in range(P9)]
                           for r in range(2)]
                    if precond_jacobi:
                        for j in range(P9):
                            for k in range(P9):
                                blk_rows.append(
                                    Jpi[0][j] * Jpi[0][k]
                                    + Jpi[1][j] * Jpi[1][k])
                    else:
                        W = [[Q1h[c][2 * i] * Jpi[0][j]
                              + Q1h[c][2 * i + 1] * Jpi[1][j]
                              for j in range(P9)] for c in range(3)]
                        for j in range(P9):
                            for k in range(P9):
                                v = (Jpi[0][j] * Jpi[0][k]
                                     + Jpi[1][j] * Jpi[1][k])
                                for c in range(3):
                                    v = v - W[c][j] * W[c][k]
                                blk_rows.append(v)
                blocks = blocks + pl.flat_cam_scatter(
                    blk_rows, bucket.cam_idx, N, P9 * P9)

            blocks = blocks.reshape(N, P9, P9) + \
                lam.astype(dtype) * jnp.eye(P9, dtype=dtype)
            chol = chol9(blocks)
            return PlanarStage2(Q1h=tuple(Q1hs), R=tuple(Rs), b=b_accum,
                                precond_chol=chol,
                                lam=jnp.asarray(lam, dtype))

        def matvec(pbuckets, lins, stage2_data, x):
            y = stage2_data.lam.astype(x.dtype) * x
            xT = x.T  # [9, N]
            for lin, bucket, Q1h_arr in zip(lins, pbuckets,
                                            stage2_data.Q1h):
                n, L = bucket.cam_idx.shape
                Q1h = [Q1h_arr[c * 2 * n:(c + 1) * 2 * n]
                       for c in range(3)]
                w_rows = []
                for i in range(n):
                    idx = bucket.cam_idx[i]
                    xg = [xT[j][idx] for j in range(P9)]
                    for r in range(2):
                        acc = jnp.zeros((L,), x.dtype)
                        for j in range(P9):
                            acc = acc + _jp_row(lin, i, r, j) * xg[j]
                        w_rows.append(acc)
                w = jnp.stack(w_rows)  # [2n, L]
                t = [jnp.sum(Q1h[c] * w, axis=0) for c in range(3)]
                wp = w - sum(Q1h[c] * t[c][None, :] for c in range(3))
                y_rows = []
                for i in range(n):
                    for j in range(P9):
                        y_rows.append(
                            _jp_row(lin, i, 0, j) * wp[2 * i]
                            + _jp_row(lin, i, 1, j) * wp[2 * i + 1])
                y = y + pl.flat_cam_scatter(y_rows, bucket.cam_idx, N,
                                            P9)
            return y

        def solve_fn(pbuckets, lins, lam):
            s2 = stage2(pbuckets, lins, lam)

            res = pcg(
                lambda x: matvec(pbuckets, lins, s2, x),
                lambda r: precond_apply(s2.precond_chol, r),
                s2.b,
                min_num_iterations=opts.min_linear_solver_iterations,
                max_num_iterations=opts.max_linear_solver_iterations,
                q_tolerance=opts.eta,
                r_tolerance=-1.0,
            )
            return (-res.x, s2, res.num_iterations, res.termination_type)

        # ---- apply ----------------------------------------------------
        def apply_fn(pbuckets, cams, lm_ps, lins, s2, pose_scale, inc):
            l_diff = jnp.zeros((), jnp.result_type(inc.dtype, jnp.float32))
            new_lm_ps = []
            incT = inc.T
            for lin, bucket, Q1h_arr, R_arr, lm_pl in zip(
                    lins, pbuckets, s2.Q1h, s2.R, lm_ps):
                n, L = bucket.cam_idx.shape
                Q1h = [Q1h_arr[c * 2 * n:(c + 1) * 2 * n]
                       for c in range(3)]
                R = [[R_arr[k * 3 + c] for c in range(3)]
                     for k in range(3)]
                w_rows = []
                for i in range(n):
                    idx = bucket.cam_idx[i]
                    xg = [incT[j][idx] for j in range(P9)]
                    for r in range(2):
                        acc = jnp.zeros((L,), inc.dtype)
                        for j in range(P9):
                            acc = acc + _jp_row(lin, i, r, j) * xg[j]
                        w_rows.append(acc)
                w = jnp.stack(w_rows)
                u = lin.r + w
                rhs3 = [jnp.sum(Q1h[c] * u, axis=0) for c in range(3)]
                dl = pl.solve_upper_rows(R, [-rhs3[0], -rhs3[1],
                                             -rhs3[2]])
                dl = [jnp.where(bucket.lm_mask, d, 0.0) for d in dl]

                v = w + jnp.stack([
                    sum(_jl_row(lin, i, r, c) * dl[c] for c in range(3))
                    for i in range(n) for r in range(2)])
                l_diff = l_diff - jnp.sum(v * (0.5 * v + lin.r))

                new_lm = jnp.stack([
                    lm_pl[c] + dl[c] * lin.Jl_scale[c]
                    for c in range(3)])
                new_lm_ps.append(new_lm)

            inc_scaled = inc * pose_scale
            q, t = lie.apply_inc_pose(cams.q, cams.t, inc_scaled[:, :6])
            intr = cams.intr + inc_scaled[:, 6:9]
            return CamState(q=q, t=t, intr=intr), tuple(new_lm_ps), l_diff

        self.error_pure = error_fn
        self.stage1_pure = stage1_fn
        self.solve_pure = solve_fn
        self.apply_pure = apply_fn
        self._error_fn = jax.jit(error_fn)
        self._stage1_fn = jax.jit(stage1_fn)
        self._solve_fn = jax.jit(solve_fn)
        self._apply_fn = jax.jit(apply_fn)

    # -- planar state conversion ---------------------------------------
    def prepare_state(self, state: BAState) -> BAState:
        """Transpose landmark positions to planar [3, L]."""
        return BAState(cams=state.cams,
                       lm_ps=tuple(p.T if p.ndim == 2 and p.shape[1] == 3
                                   else p for p in state.lm_ps))

    def export_lm_ps(self, lm_ps):
        """Back to [L, 3] for scatter_landmarks."""
        return tuple(p.T for p in lm_ps)

    # host-loop interface reuses SqrtLinearizer's pattern
    def linearize(self):
        lins, pose_scale, failures = sync(
            self._stage1_fn(self.consts, self.state.cams, self.state.lm_ps))
        if int(failures) > 0:
            raise FloatingPointError("numerical failure during linearization")
        self._lins = lins
        self._pose_scale = pose_scale

    def solve(self, lam):
        inc, s2, iters, term = sync(
            self._solve_fn(self.consts, self._lins,
                           jnp.asarray(lam, self.dtype)))
        self._stage2 = s2
        if self.it_summary is not None:
            self.it_summary.linear_solver_iterations = int(iters)
            self.it_summary.linear_solver_type = self.linear_solver_type
        return inc

    def apply(self, inc):
        cams, lm_ps, l_diff = sync(self._apply_fn(
            self.consts, self.state.cams, self.state.lm_ps, self._lins,
            self._stage2, self._pose_scale, inc))
        return BAState(cams=cams, lm_ps=lm_ps), float(l_diff)
