"""Cross-solver equivalence tests -- the TPU analog of the reference's
solver/bal_bundle_adjustment.test.cpp:54-140 (QR vs SC reduced systems
must match) and qr/linearization_qr.test.cpp (implicit operator vs dense
ground truth), plus sc/linearization_power_sc.test.cpp (power series vs
dense inverse).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rootba_tpu.bal.bucketing import bucketize
from rootba_tpu.config.options import (
    PreconditionerType,
    SolverOptions,
    SolverType,
)
from rootba_tpu.solver import explicit_sc, sqrt_qr
from rootba_tpu.solver.lm import SqrtLinearizer, initial_state
from rootba_tpu.solver.explicit_sc import SCLinearizer, build_pair_structure


@pytest.fixture(scope="module")
def lin_setup(synthetic_problem):
    bp = bucketize(synthetic_problem, pow2_from=9)
    opts = SolverOptions()
    lin = SqrtLinearizer(bp, opts, np.float64)
    state = initial_state(bp, jnp.float64)
    lin.set_state(state)
    lin.linearize()
    return bp, lin


def dense_system(lin):
    """Assemble the dense scaled Jacobian [Jp | Jl-blockdiag] and r from
    the lin buckets (ground truth, mirrors get_Q2TJp-style debug)."""
    N = lin.num_cameras
    Jp_rows, Jl_rows, r_rows, lm_col = [], [], [], []
    lm_offset = 0
    for lb, bucket in zip(lin._lins, lin.buckets):
        L, n = lb.Jp.shape[0], lb.Jp.shape[1]
        Jp = np.asarray(lb.Jp)
        Jl = np.asarray(lb.Jl)
        r = np.asarray(lb.r)
        cam = np.asarray(bucket.cam_idx)
        lmm = np.asarray(bucket.lm_mask)
        for l in range(L):
            if not lmm[l]:
                continue
            for i in range(n):
                Jp_block = np.zeros((2, 9 * N))
                c = cam[l, i]
                Jp_block[:, 9 * c:9 * c + 9] = Jp[l, i]
                Jp_rows.append(Jp_block)
                Jl_rows.append((lm_offset, Jl[l, i]))
                r_rows.append(r[l, i])
            lm_offset += 1
    O2 = 2 * len(r_rows) // 2
    num_lms = lm_offset
    Jp_mat = np.concatenate(Jp_rows, axis=0)
    Jl_mat = np.zeros((Jp_mat.shape[0], 3 * num_lms))
    for row2, (lmi, block) in enumerate(Jl_rows):
        Jl_mat[2 * row2:2 * row2 + 2, 3 * lmi:3 * lmi + 3] = block
    r_vec = np.concatenate(r_rows)
    return Jp_mat, Jl_mat, r_vec, num_lms


@pytest.mark.parametrize("lam", [0.0, 1e-2])
def test_qr_operator_vs_dense(lin_setup, lam):
    """Implicit sqrt operator == dense Jp'(I-Q1Q1')Jp + lam I
    == dense Schur complement Hpp - Hpl (Hll+lam)^-1 Hlp + lam I."""
    bp, lin = lin_setup
    N = lin.num_cameras
    lam_arr = jnp.asarray(lam, jnp.float64)
    stage2 = sqrt_qr.sqrt_stage2(lin._lins, lin.buckets, lam_arr, N)

    Jp_mat, Jl_mat, r_vec, num_lms = dense_system(lin)
    Hpp = Jp_mat.T @ Jp_mat
    Hll = Jl_mat.T @ Jl_mat + lam * np.eye(3 * num_lms)
    Hpl = Jp_mat.T @ Jl_mat
    H_rcs = Hpp - Hpl @ np.linalg.solve(Hll, Hpl.T) + lam * np.eye(9 * N)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, 9))
    y_impl = np.asarray(
        sqrt_qr.sqrt_matvec(lin._lins, lin.buckets, stage2, N,
                            jnp.asarray(x)))
    y_dense = (H_rcs @ x.reshape(-1)).reshape(N, 9)
    np.testing.assert_allclose(y_impl, y_dense, rtol=1e-8, atol=1e-8)

    # RHS: b = Jp' (I - proj) r == Jp' r - Hpl Hll^-1 Jl' r
    b_dense = Jp_mat.T @ r_vec - Hpl @ np.linalg.solve(Hll, Jl_mat.T @ r_vec)
    np.testing.assert_allclose(
        np.asarray(stage2.b).reshape(-1), b_dense, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("lam", [0.0, 1e-2])
def test_qr_vs_sc_matvec_and_rhs(lin_setup, lam):
    """The two marginalization paths produce the same reduced system
    (reference bal_bundle_adjustment.test.cpp:54-140)."""
    bp, lin = lin_setup
    N = lin.num_cameras
    lam_arr = jnp.asarray(lam, jnp.float64)
    stage2_qr = sqrt_qr.sqrt_stage2(lin._lins, lin.buckets, lam_arr, N)

    pairs = build_pair_structure(bp, N)
    stage2_sc = explicit_sc.sc_assemble(lin._lins, lin.buckets, pairs,
                                        lam_arr, N)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, 9)))
    y_qr = np.asarray(
        sqrt_qr.sqrt_matvec(lin._lins, lin.buckets, stage2_qr, N, x))
    y_sc = np.asarray(explicit_sc.sc_matvec(stage2_sc, pairs, N, x))
    np.testing.assert_allclose(y_qr, y_sc, rtol=1e-8, atol=1e-8)

    np.testing.assert_allclose(np.asarray(stage2_qr.b),
                               np.asarray(stage2_sc.b), rtol=1e-8,
                               atol=1e-8)

    # SCHUR_JACOBI preconditioner blocks agree: QR-path blocks (with
    # +lam) == SC diagonal blocks (with +lam)
    blocks_sc = np.asarray(explicit_sc.sc_diag_blocks(stage2_sc, pairs, N))
    chol_qr = np.asarray(stage2_qr.precond_chol)
    blocks_qr = np.einsum("nij,nkj->nik", chol_qr, chol_qr)
    np.testing.assert_allclose(blocks_qr, blocks_sc, rtol=1e-7, atol=1e-7)


def test_power_series_vs_dense_inverse(lin_setup):
    """Power series sum (Hpp^-1 E0)^i Hpp^-1 approximates the inverse
    RCS (reference linearization_power_sc.test.cpp:214-295)."""
    bp, lin = lin_setup
    N = lin.num_cameras
    lam = 1e-2
    lam_arr = jnp.asarray(lam, jnp.float64)

    Jp_mat, Jl_mat, r_vec, num_lms = dense_system(lin)
    Hpp_full = Jp_mat.T @ Jp_mat + lam * np.eye(9 * N)
    Hll = Jl_mat.T @ Jl_mat + lam * np.eye(3 * num_lms)
    Hpl = Jp_mat.T @ Jl_mat
    H_rcs = Hpp_full - Hpl @ np.linalg.solve(Hll, Hpl.T)

    # build per-bucket Hll_inv like the PoBA solver
    Hll_invs = [explicit_sc.damped_hll_inv(lb, bucket, lam_arr)
                for lb, bucket in zip(lin._lins, lin.buckets)]
    hpp = explicit_sc.jp_gram_blockdiag(lin._lins, lin.buckets, lam_arr, N)
    chol = jnp.linalg.cholesky(hpp)

    def apply_hpp_inv(v):
        return sqrt_qr.precond_apply(chol, v)

    def apply_e0(v):
        return explicit_sc.e0_matvec(lin._lins, lin.buckets, Hll_invs, N, v)

    rng = np.random.default_rng(2)
    b = rng.normal(size=(N, 9))

    # (a) truncated implicit series == dense truncated expansion at the
    # same order (reference get_inverted_matrix(order) comparison,
    # linearization_power_sc.hpp:173-185)
    order = 20
    x_series, iters = explicit_sc.power_series_solve(
        apply_hpp_inv, apply_e0, jnp.asarray(b), order=order,
        q_tolerance=-1.0)
    Hpp_blockdiag = np.asarray(hpp)
    Hpp_inv_mat = np.zeros((9 * N, 9 * N))
    for c in range(N):
        Hpp_inv_mat[9 * c:9 * c + 9, 9 * c:9 * c + 9] = np.linalg.inv(
            Hpp_blockdiag[c])
    E0 = Hpl @ np.linalg.solve(Hll, Hpl.T)
    step = Hpp_inv_mat @ E0
    acc = Hpp_inv_mat.copy()
    tmp = Hpp_inv_mat.copy()
    for _ in range(order):
        tmp = step @ tmp
        acc += tmp
    x_trunc = (acc @ (-b.reshape(-1))).reshape(N, 9)
    np.testing.assert_allclose(np.asarray(x_series), x_trunc, rtol=1e-8,
                               atol=1e-10)

    # (b) at high order the series approaches the true inverse RCS
    x_hi, _ = explicit_sc.power_series_solve(
        apply_hpp_inv, apply_e0, jnp.asarray(b), order=300,
        q_tolerance=-1.0)
    x_dense = -np.linalg.solve(H_rcs, b.reshape(-1)).reshape(N, 9)
    err = np.linalg.norm(np.asarray(x_hi) - x_dense) / np.linalg.norm(x_dense)
    # convergence rate is problem-dependent (spectral radius of
    # Hpp^-1 E0 close to 1 for lightly damped systems); the exact
    # equivalence is asserted above, this only checks it approaches
    assert err < 5e-3, f"series rel err {err}"


def test_back_substitution_equivalence(lin_setup):
    """QR and SC back-substitution produce the same landmark update and
    the same model cost decrease."""
    bp, lin = lin_setup
    N = lin.num_cameras
    lam = 1e-3
    lam_arr = jnp.asarray(lam, jnp.float64)
    stage2_qr = sqrt_qr.sqrt_stage2(lin._lins, lin.buckets, lam_arr, N)

    rng = np.random.default_rng(3)
    inc = jnp.asarray(rng.normal(size=(N, 9)) * 1e-3)

    lm_ps = lin.state.lm_ps
    new_qr, ldiff_qr = sqrt_qr.sqrt_back_substitute(
        lin._lins, lin.buckets, stage2_qr, lm_ps, inc)

    Hll_invs = [explicit_sc.damped_hll_inv(lb, bucket, lam_arr)
                for lb, bucket in zip(lin._lins, lin.buckets)]
    new_sc, ldiff_sc = explicit_sc.sc_back_substitute(
        lin._lins, lin.buckets, Hll_invs, lm_ps, inc)

    np.testing.assert_allclose(float(ldiff_qr), float(ldiff_sc), rtol=1e-8)
    for a, b in zip(new_qr, new_sc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7,
                                   atol=1e-10)


# ---------------------------------------------------------------------------
# Flat-layout solver and dual-path reduction equivalence. The reference
# guards its two concurrency disciplines (tree-reduce vs mutex scatter,
# reduction_alg 0/1) by requiring identical results; here the analogs are
# segment_sum vs camera-CSR gather-reduce and the per-bucket einsum vs
# flat per-obs layouts.
# ---------------------------------------------------------------------------

def _one_solve(bp, layout, reduction_alg, dtype, **extra):
    from rootba_tpu.solver.lm import create_linearizer

    opts = SolverOptions(kernel_layout=layout, reduction_alg=reduction_alg,
                         use_double=(dtype == np.float64), **extra)
    lin = create_linearizer(bp, opts, dtype)
    state = initial_state(bp, dtype)
    lam = jnp.asarray(1e-3, dtype)
    lins, pose_scale, _ = lin._stage1_fn(lin.consts, state.cams,
                                         state.lm_ps)
    inc, s2, iters, _ = lin._lsolve_fn(
        lin.consts, lins, lin._stage2_fn(lin.consts, lins, lam))
    cams, lm_ps, l_diff = lin._apply_fn(
        lin.consts, state.cams, state.lm_ps, lins, s2, pose_scale, inc)
    return (np.asarray(pose_scale), np.asarray(s2.b), np.asarray(inc),
            float(l_diff), np.asarray(cams.q),
            np.concatenate([np.asarray(p).ravel() for p in lm_ps]))


@pytest.mark.parametrize("variant", [
    ("flat", 1), ("flat", 0), ("einsum", 0)])
def test_flat_and_reduction_paths_match(synthetic_problem, variant, dtype):
    """flat/einsum layouts x CSR/segment-sum reductions all produce the
    same stage1/stage2/solve/apply results (to dtype rounding)."""
    layout, reduction_alg = variant
    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "einsum", 1, dtype.type)
    got = _one_solve(bp, layout, reduction_alg, dtype.type,
                     sqrt_rcs_mode="implicit")
    rtol = 1e-4 if dtype.itemsize == 4 else 1e-10
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} ({layout}, alg={reduction_alg})")


def test_poba_dense_vs_implicit_e0(synthetic_problem, dtype):
    """The dense assembled E0 drives the power series to the same
    increment as the reference-style implicit per-obs sweep."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    common = dict(solver_type=SolverType.POWER_SCHUR_COMPLEMENT,
                  preconditioner_type=(
                      PreconditionerType.POWER_SCHUR_COMPLEMENT))
    ref = _one_solve(bp, "einsum", 1, dtype.type,
                     dense_rcs_max_cameras=0, **common)
    got = _one_solve(bp, "einsum", 1, dtype.type,
                     dense_rcs_max_cameras=2048, **common)
    rtol = 2e-4 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (poba dense vs implicit)")


def test_sc_power_precond_dense_vs_implicit(synthetic_problem, dtype):
    """SC solver with the PowerSC preconditioner: dense-E0 series ==
    implicit-sweep series."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    common = dict(solver_type=SolverType.SCHUR_COMPLEMENT,
                  preconditioner_type=(
                      PreconditionerType.POWER_SCHUR_COMPLEMENT),
                  power_order=5)
    ref = _one_solve(bp, "einsum", 1, dtype.type,
                     dense_rcs_max_cameras=0, **common)
    got = _one_solve(bp, "einsum", 1, dtype.type,
                     dense_rcs_max_cameras=2048, **common)
    # dense vs implicit assemble the same H in different summation
    # orders; f32 reassociation noise is amplified through the CG
    # solve (components >= 2), same split tolerance as
    # test_pair_gather_strips_vs_obs -- f64 stays tight, pinning
    # algebraic equivalence
    rtol = 2e-4 if dtype.itemsize == 4 else 1e-8
    rtol_cg = 2e-3 if dtype.itemsize == 4 else 1e-8
    for i, (a, b) in enumerate(zip(ref, got)):
        tol = rtol_cg if i >= 2 else rtol
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=tol, atol=tol,
            err_msg=f"component {i} (sc power precond)")


def test_pair_gather_strips_vs_obs(synthetic_problem, dtype):
    """The landmark-strip pair-product gather (one small-table index
    per slot, static pattern slices, input-side canonical swap)
    assembles the same dense RCS as the per-observation formulation."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pair_gather="obs", pallas_cg="off")
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pair_gather="strips", pallas_cg="off")
    # strips mode also reorders the per-camera RHS/diag reductions (the
    # camera-strip index); f32 reassociation noise is amplified through
    # the CG solve, so the solved components get a looser tolerance
    rtol = 1e-4 if dtype.itemsize == 4 else 1e-10
    rtol_cg = 2e-3 if dtype.itemsize == 4 else 1e-10
    for i, (a, b) in enumerate(zip(ref, got)):
        tol = rtol_cg if i >= 2 else rtol
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=tol, atol=tol,
            err_msg=f"component {i} (strips vs obs pair gather)")


def test_cam_strips_reduce_matches_segment_sum(synthetic_problem):
    """The camera-strip reducers (cam_reduce_strips / cam_gram_strips)
    match segment_sum for both the strip-group and leftover-stream
    regimes (min_group 0 and inf)."""
    from rootba_tpu.bal.bucketing import build_cam_strips
    from rootba_tpu.solver.linearization import (
        CamStripsIndex,
        cam_gram_strips,
        cam_reduce_strips,
    )

    bp = bucketize(synthetic_problem, pow2_from=9)
    N = bp.num_cameras
    buckets = [
        jax.tree.map(jnp.asarray, b._replace(
            obs_uv=b.obs_uv.astype(np.float64)))
        for b in bp.buckets]
    cam_flat = np.concatenate(
        [b.cam_idx.reshape(-1) for b in bp.buckets])
    mask_flat = np.concatenate(
        [b.mask.reshape(-1) for b in bp.buckets])
    O = cam_flat.size
    rng = np.random.default_rng(11)
    flat = (rng.normal(size=(O, 9)) * mask_flat[:, None])
    A = rng.normal(size=(O, 2, 9)) * mask_flat[:, None, None]
    B = rng.normal(size=(O, 3, 9)) * mask_flat[:, None, None]
    want = jax.ops.segment_sum(jnp.asarray(flat), jnp.asarray(cam_flat),
                               num_segments=N)
    gram = (np.einsum("oka,okb->oab", A, A)
            - np.einsum("oka,okb->oab", B, B)).reshape(O, 81)
    want_g = jax.ops.segment_sum(jnp.asarray(gram),
                                 jnp.asarray(cam_flat), num_segments=N)
    for min_group in (0, 1 << 30):
        cs = CamStripsIndex.from_host(
            build_cam_strips(bp.buckets, N, min_group=min_group))
        got = cam_reduce_strips(jnp.asarray(flat), buckets, cs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-10, atol=1e-10)
        Aj, Bj = jnp.asarray(A), jnp.asarray(B)
        got_g = cam_gram_strips([(Aj, Aj, 1.0), (Bj, Bj, -1.0)],
                                buckets, cs)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   rtol=1e-9, atol=1e-9)


def test_pair_strips_groups_match_obs_csr(synthetic_problem):
    """The landmark-strip GROUP path (min_group=1 forces every pattern
    through it, exercising static slicing + input-side swap) produces
    the same per-pair block sums as the per-observation CSR."""
    from rootba_tpu.bal.bucketing import build_pair_csr, build_pair_strips
    from rootba_tpu.solver.linearization import (
        PairCsrIndex,
        PairStripsIndex,
        csr_pair_outer,
        csr_pair_outer_strips,
    )
    from rootba_tpu.solver.lm import SqrtLinearizer, initial_state

    bp = bucketize(synthetic_problem, pow2_from=9)
    opts = SolverOptions()
    lin = SqrtLinearizer(bp, opts, np.float64)
    state = initial_state(bp, jnp.float64)
    lin.set_state(state)
    lin.linearize()
    N = lin.num_cameras

    # flat per-obs strips from the einsum-layout lins
    W_parts = []
    lam = jnp.asarray(1e-3, jnp.float64)
    s2 = sqrt_qr.sqrt_stage2(lin._lins, lin.buckets, lam, N)
    for lb, Q1h in zip(lin._lins, s2.Q1h):
        L, n = lb.Jp.shape[0], lb.Jp.shape[1]
        W = jnp.sum(Q1h[..., :, None] * lb.Jp[..., None, :], axis=2)
        W_parts.append(W.reshape(L * n, 3, 9))
    W = jnp.concatenate(W_parts, axis=0)

    obs = PairCsrIndex.from_host(build_pair_csr(bp.buckets, N))
    ref = np.asarray(csr_pair_outer(W, W, obs))

    for min_group in (1, 10**9):
        strips = PairStripsIndex.from_host(
            build_pair_strips(bp.buckets, N, min_group=min_group))
        got = np.asarray(
            csr_pair_outer_strips(W, W, lin.buckets, strips))
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12,
                                   err_msg=f"min_group={min_group}")

    # multi-chunk regression: chunk-padding tail rows must not shift
    # the idx2 row numbering (this bug only fired at >1-chunk scale)
    from rootba_tpu.solver import linearization as lz

    strips = PairStripsIndex.from_host(
        build_pair_strips(bp.buckets, N, min_group=1))
    def count_padded(budget):
        padded = 0
        for g, lm in enumerate(strips.lm_idx):
            bi_ = strips.group_bucket[g]
            n_ = lin.buckets[bi_].cam_idx.shape[1]
            gsz = lm.shape[0]
            chunk = max(64, min(gsz, budget // (n_ * 27 * 4)))
            chunk = chunk // 64 * 64
            if -(-gsz // chunk) * chunk != gsz:
                padded += 1
        return padded

    # find a chunk budget that actually produces a chunk-padded group
    # (else this regression test tests nothing)
    budget = next(b for b in (m * 64 * 27 * 4 for m in range(2, 65))
                  if count_padded(b) > 0)
    old = lz._PAIR_CHUNK_BYTES
    try:
        lz._PAIR_CHUNK_BYTES = budget
        got = np.asarray(
            csr_pair_outer_strips(W, W, lin.buckets, strips))
    finally:
        lz._PAIR_CHUNK_BYTES = old
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12,
                               err_msg="multi-chunk strips")


def test_sqrt_explicit_vs_implicit_rcs(synthetic_problem, dtype):
    """The explicit dense RCS assembled from the QR factors
    (flat_assemble_rcs) runs CG to the same increment as the implicit
    matrix-free operator (the reference's only mode)."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="implicit")
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense")
    # f32: the MXU-folded assembly sums in a different order than the
    # implicit operator's elementwise chain; ~1e-3 after CG
    rtol = 2e-3 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (explicit vs implicit rcs)")


def test_sqrt_bsr_vs_dense_rcs(synthetic_problem, dtype):
    """The block-sparse RCS (assemble_rcs_bsr + bsr_matvec CSR
    gather-reduce; the any-camera-count mode, final-13682's dense
    system would be 60 GB) solves to the same increment as the dense
    GEMV mode."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off")
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="bsr")
    rtol = 2e-4 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (sqrt bsr vs dense rcs)")


def test_sc_bsr_vs_dense_rcs(synthetic_problem, dtype):
    """SCHUR_COMPLEMENT: block-sparse assembly/matvec == dense mode
    (dense_rcs_max_cameras=1 forces BSR on a single device)."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    common = dict(solver_type=SolverType.SCHUR_COMPLEMENT)
    ref = _one_solve(bp, "einsum", 1, dtype.type,
                     dense_rcs_max_cameras=2048, **common)
    got = _one_solve(bp, "einsum", 1, dtype.type,
                     dense_rcs_max_cameras=1, **common)
    rtol = 2e-4 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (sc bsr vs dense rcs)")


def test_poba_bsr_vs_dense_e0(synthetic_problem, dtype):
    """POWER_SCHUR_COMPLEMENT: block-sparse E0 power series == dense-E0
    series (dense_rcs_max_cameras=1 forces BSR on a single device)."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    common = dict(solver_type=SolverType.POWER_SCHUR_COMPLEMENT,
                  preconditioner_type=(
                      PreconditionerType.POWER_SCHUR_COMPLEMENT))
    ref = _one_solve(bp, "einsum", 1, dtype.type,
                     dense_rcs_max_cameras=2048, **common)
    got = _one_solve(bp, "einsum", 1, dtype.type,
                     dense_rcs_max_cameras=1, **common)
    rtol = 2e-4 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (poba bsr vs dense e0)")


def test_strip_min_group_option(synthetic_problem, dtype):
    """strip_min_group only re-routes slots between the strip groups
    (per-bucket tables, default) and the per-obs leftover stream
    (legacy flat tables) -- results are identical (it is a
    performance/memory knob, see linearization.csr_pair_outer_strips)."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off", strip_min_group=16384)
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off", strip_min_group=0)
    # f32: leftover-stream vs per-bucket runs fold sums in different
    # orders on the MXU; ~1e-3 after CG
    rtol = 2e-3 if dtype.itemsize == 4 else 1e-10
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (strip_min_group=0)")


# ---------------------------------------------------------------------------
# scale-only code paths forced at toy size (VERDICT r2 item 5): the
# chunked/split/degraded paths that must be correct at final-13682 run
# in CI against their unchunked equivalents, mirroring the reference's
# dual-path reduction_alg equivalence discipline (solver_options.hpp:266)
# ---------------------------------------------------------------------------

def test_row_chunked_chains_equivalence(synthetic_problem, dtype,
                                        monkeypatch):
    """sqrt_flat._map_rows row-chunking (active only above 262k/n rows
    in production, i.e. final-scale) == the unchunked chains."""
    from rootba_tpu.solver import linearization as lz

    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off")
    monkeypatch.setattr(lz, "_ROW_CHUNK_SLOTS", 64)
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off")
    rtol = 1e-4 if dtype.itemsize == 4 else 1e-10
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (row-chunked chains)")


def test_level2_chunked_reduce_equivalence(synthetic_problem, dtype,
                                           monkeypatch):
    """linearization._level2_reduce lax.map chunking (active only above
    its byte budget, i.e. final-scale pair counts) == one-chunk path."""
    from rootba_tpu.solver import linearization as lz

    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off")
    monkeypatch.setattr(lz, "_LEVEL2_CHUNK_BYTES", 256)
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off")
    rtol = 1e-4 if dtype.itemsize == 4 else 1e-10
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (level-2 chunked reduce)")


def test_bucket_splitting_equivalence(synthetic_problem, dtype):
    """bucketize(max_bucket_obs=tiny) splits every obs-count class into
    many buckets (the final-13682 HBM bound); camera-side results and
    re-scattered landmarks match the unsplit bucketization."""
    from rootba_tpu.bal.bucketing import scatter_landmarks
    from rootba_tpu.solver.lm import create_linearizer

    def solve_scattered(bp):
        opts = SolverOptions(use_double=(dtype.type == np.float64),
                             sqrt_rcs_mode="dense", pallas_cg="off")
        lin = create_linearizer(bp, opts, dtype.type)
        state = initial_state(bp, dtype.type)
        lam = jnp.asarray(1e-3, dtype.type)
        lins, pose_scale, _ = lin._stage1_fn(lin.consts, state.cams,
                                             state.lm_ps)
        inc, s2, iters, _ = lin._lsolve_fn(
            lin.consts, lins, lin._stage2_fn(lin.consts, lins, lam))
        cams, lm_ps, l_diff = lin._apply_fn(
            lin.consts, state.cams, state.lm_ps, lins, s2, pose_scale,
            inc)
        lms = scatter_landmarks(
            bp, [np.asarray(p, np.float64) for p in lm_ps])
        return (np.asarray(pose_scale), np.asarray(s2.b),
                np.asarray(inc), float(l_diff), np.asarray(cams.q), lms)

    ref = solve_scattered(bucketize(synthetic_problem, pow2_from=9))
    split_bp = bucketize(synthetic_problem, pow2_from=9,
                         max_bucket_obs=64)
    assert len(split_bp.buckets) > len(
        bucketize(synthetic_problem, pow2_from=9).buckets)
    got = solve_scattered(split_bp)
    # f32: split buckets re-order the MXU-folded assembly sums; ~1e-3
    # after CG
    rtol = 2e-3 if dtype.itemsize == 4 else 1e-10
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (bucket splitting)")


def test_attempt_degradation_half_and_separate(synthetic_problem):
    """The fused-attempt full -> half -> separate runtime degradation
    (production trigger: compile-service OOM at final scale) preserves
    LM semantics: a solver whose full/half fused programs 'fail' lands
    on the same cost trajectory as the undegraded one."""
    from rootba_tpu.solver.lm import create_linearizer, optimize_lm

    bp = bucketize(synthetic_problem, pow2_from=9)
    opts = SolverOptions(use_double=False, max_num_iterations=6,
                         function_tolerance=0.0, verbosity_level=0,
                         lm_loop="host")

    from rootba_tpu.log.summary import SolverSummary

    s_ref = SolverSummary()
    optimize_lm(bp, opts, s_ref)
    costs_ref = [it.cost.all.error for it in s_ref.iterations]

    def fail(*a, **k):
        raise jax.errors.JaxRuntimeError(
            "RESOURCE_EXHAUSTED: simulated compile-service OOM (test)")

    # full -> half
    lin = create_linearizer(bp, opts, jnp.float32)
    lin._attempt_full = fail
    s_half = SolverSummary()
    optimize_lm(bp, opts, s_half, linearizer=lin)
    assert lin._attempt_mode == "half"
    costs_half = [it.cost.all.error for it in s_half.iterations]
    np.testing.assert_allclose(costs_half, costs_ref, rtol=1e-5)

    # full -> half -> separate
    lin2 = create_linearizer(bp, opts, jnp.float32)
    lin2._attempt_full = fail
    lin2._attempt_half = fail
    s_sep = SolverSummary()
    optimize_lm(bp, opts, s_sep, linearizer=lin2)
    assert lin2._attempt_mode == "separate"
    costs_sep = [it.cost.all.error for it in s_sep.iterations]
    np.testing.assert_allclose(costs_sep, costs_ref, rtol=1e-5)


def test_diagonal_preconditioner(synthetic_problem):
    """Scalar DIAGONAL preconditioner (reference DiagonalPreconditioner,
    cg/preconditioner.hpp:48-69): with CG run to tight tolerance, the
    increment matches the SCHUR_JACOBI-preconditioned solve (a
    preconditioner changes the iteration, not the solution)."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    # CG's q-criterion stops on the quadratic-model decrease, so two
    # different preconditioners land within ~1e-4 of each other (the
    # scalar diagonal needs ~3x the iterations, as expected)
    tol = dict(rtol=1e-3, atol=1e-3)
    tight = dict(eta=1e-10, max_linear_solver_iterations=3000)
    ref = _one_solve(bp, "flat", 1, np.float64, sqrt_rcs_mode="implicit",
                     **tight)
    got = _one_solve(bp, "flat", 1, np.float64, sqrt_rcs_mode="implicit",
                     preconditioner_type=PreconditionerType.DIAGONAL,
                     **tight)
    np.testing.assert_allclose(got[2], ref[2], **tol,
                               err_msg="increment (diagonal precond)")

    # einsum layout + SC solver accept it too
    got_e = _one_solve(bp, "einsum", 1, np.float64,
                       preconditioner_type=PreconditionerType.DIAGONAL,
                       **tight)
    np.testing.assert_allclose(got_e[2], ref[2], **tol,
                               err_msg="increment (einsum diagonal)")
    got_sc = _one_solve(bp, "einsum", 1, np.float64,
                        solver_type=SolverType.SCHUR_COMPLEMENT,
                        preconditioner_type=PreconditionerType.DIAGONAL,
                        **tight)
    ref_sc = _one_solve(bp, "einsum", 1, np.float64,
                        solver_type=SolverType.SCHUR_COMPLEMENT, **tight)
    np.testing.assert_allclose(got_sc[2], ref_sc[2], **tol,
                               err_msg="increment (sc diagonal)")


def test_sandwich_assembly_equivalence(synthetic_problem, dtype,
                                       monkeypatch):
    """The W-free sandwich assembly (sqrt_ww_pair_strips; the
    final-13682 HBM mode, forced at toy size) == the W-table path."""
    from rootba_tpu.solver import sqrt_flat as sf

    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off", strip_min_group=0)
    monkeypatch.setattr(sf, "_SANDWICH_MIN_SLOTS", 1)
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off", strip_min_group=0)
    rtol = 2e-3 if dtype.itemsize == 4 else 1e-10
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (sandwich assembly)")


def test_chunked_error_eval_equivalence(synthetic_problem, monkeypatch):
    """compute_error_buckets' row-chunked path (final-13682 HBM
    envelope) == the unchunked evaluation, bit-for-bit in f64."""
    from rootba_tpu.solver import linearization as lz
    from rootba_tpu.solver.lm import create_linearizer

    bp = bucketize(synthetic_problem, pow2_from=9)
    opts = SolverOptions(use_double=True)
    lin = create_linearizer(bp, opts, np.float64)
    st = initial_state(bp, jnp.float64)
    ref = lin._error_fn(lin.consts, st.cams, st.lm_ps)
    monkeypatch.setattr(lz, "_ROW_CHUNK_SLOTS", 64)
    lin2 = create_linearizer(bp, opts, np.float64)
    got = lin2._error_fn(lin2.consts, st.cams, st.lm_ps)
    for f in ("all", "valid"):
        a, b = getattr(ref, f), getattr(got, f)
        assert int(a.num_obs) == int(b.num_obs)
        np.testing.assert_allclose(float(b.error), float(a.error),
                                   rtol=1e-12)
        np.testing.assert_allclose(float(b.residual_sum),
                                   float(a.residual_sum), rtol=1e-12)


@pytest.fixture(scope="module")
def wide_bucket_problem():
    """Heavy-tailed clustered problem whose longest tracks land in a
    pow2 bucket of width >= 256 (the W_BUILD_MAX_N Pallas-gate
    fallback, wide-gather regimes, and pow2 padding paths the legacy
    ring fixtures never reached; the reference handles unbounded nobs
    via dynamic landmark blocks, landmark_block_dynamic.hpp:49-100)."""
    from rootba_tpu.bal.synthetic import generate_synthetic_bal

    p = generate_synthetic_bal(
        num_cams=280, num_lms=420, mean_obs_per_lm=11.0, seed=3,
        structure="clustered", track_sigma=1.8, window_stretch=2.0,
        p_far=0.03)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    return p


def test_wide_bucket_equivalence(wide_bucket_problem, dtype):
    """Flat and einsum sqrt layouts agree through stage1/stage2/solve/
    apply on a problem with a >=256-wide bucket."""
    bp = bucketize(wide_bucket_problem, pow2_from=9)
    assert max(b.n_obs for b in bp.buckets) >= 256, \
        sorted({b.n_obs for b in bp.buckets})
    ref = _one_solve(bp, "einsum", 1, dtype.type)
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="implicit")
    # f32: 512-wide reductions sum in different orders across the two
    # layouts and CG amplifies the rounding; f64 pins exactness
    rtol = 3e-3 if dtype.itemsize == 4 else 1e-10
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (wide-bucket flat vs einsum)")


def test_wide_bucket_bsr_vs_dense(wide_bucket_problem, dtype):
    """BSR RCS assembly/matvec == dense mode at >=256-wide buckets
    (wide tracks make every camera pair within a track a BSR block;
    this problem's pair graph is ~75% dense)."""
    bp = bucketize(wide_bucket_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pallas_cg="off")
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="bsr")
    rtol = 2e-3 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (wide-bucket bsr vs dense)")


def test_bsr_symmetric_half_storage(synthetic_problem, dtype):
    """bsr_pack_max_gb=0 forces the symmetric-half [P, 81] block table
    + two-direction matvec (the HBM-bounded mode for final-13682's
    clustered pair density); must solve to the same increment as the
    packed full-table default, on all three solvers."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    cases = [
        dict(sqrt_rcs_mode="bsr"),
        dict(solver_type=SolverType.SCHUR_COMPLEMENT,
             dense_rcs_max_cameras=1),
        dict(solver_type=SolverType.POWER_SCHUR_COMPLEMENT,
             dense_rcs_max_cameras=1,
             preconditioner_type=(
                 PreconditionerType.POWER_SCHUR_COMPLEMENT)),
    ]
    for extra in cases:
        layout = "flat" if "sqrt_rcs_mode" in extra else "einsum"
        ref = _one_solve(bp, layout, 1, dtype.type, **extra)
        got = _one_solve(bp, layout, 1, dtype.type,
                         bsr_pack_max_gb=0.0, **extra)
        rtol = 2e-4 if dtype.itemsize == 4 else 1e-9
        for i, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
                err_msg=f"component {i} (sym-half bsr, {extra})")


@pytest.mark.parametrize("gather", ["strips", "obs"])
def test_pair_gather_stream_matches(synthetic_problem, dtype, gather):
    """pair_gather='stream' (r5 default; structure-robust sub-stream
    gathers + segment-sum fold) produces the same solve as the r4
    'strips' pattern grouping and the per-obs 'obs' CSR."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="bsr",
                     pair_gather=gather)
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="bsr",
                     pair_gather="stream")
    rtol = 5e-4 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (stream vs {gather})")


def test_pair_gather_stream_sc(synthetic_problem, dtype):
    """SC solver on the stream index == strips index."""
    bp = bucketize(synthetic_problem, pow2_from=9)
    common = dict(solver_type=SolverType.SCHUR_COMPLEMENT,
                  dense_rcs_max_cameras=2048)
    ref = _one_solve(bp, "einsum", 1, dtype.type,
                     pair_gather="strips", **common)
    got = _one_solve(bp, "einsum", 1, dtype.type,
                     pair_gather="stream", **common)
    rtol = 5e-4 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (sc stream vs strips)")


def test_pair_gather_stream_fused_w(synthetic_problem, dtype,
                                    monkeypatch):
    """Fused-W streaming (W rows built post-gather from Q1h/Jp factor
    rows; the final-13682 memory path) == the materialized-W stream."""
    from rootba_tpu.solver import sqrt_flat as sf

    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="bsr",
                     pair_gather="stream")
    monkeypatch.setattr(sf, "_FUSED_W_MIN_BYTES", 0)
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="bsr",
                     pair_gather="stream")
    rtol = 5e-4 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (fused-W stream)")


def test_pair_gather_stream_fused_w_dense(synthetic_problem, dtype,
                                          monkeypatch):
    """Fused-W factors through the DENSE stream assembler."""
    from rootba_tpu.solver import sqrt_flat as sf

    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pair_gather="stream", pallas_cg="off")
    monkeypatch.setattr(sf, "_FUSED_W_MIN_BYTES", 0)
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="dense",
                     pair_gather="stream", pallas_cg="off")
    rtol = 5e-4 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (fused-W dense stream)")


def test_pair_gather_stream_u16(synthetic_problem, dtype, monkeypatch):
    """u16 stream indexing (giant-pair-graph memory mode: sub-tables
    capped at 65535 rows, half-width wi/wj tables) == i32 stream."""
    from rootba_tpu.bal import bucketing as bk

    bp = bucketize(synthetic_problem, pow2_from=9)
    ref = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="bsr",
                     pair_gather="stream")
    monkeypatch.setattr(bk, "_U16_SLOT_THRESHOLD", 0)
    got = _one_solve(bp, "flat", 1, dtype.type, sqrt_rcs_mode="bsr",
                     pair_gather="stream")
    rtol = 5e-4 if dtype.itemsize == 4 else 1e-9
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=rtol,
            err_msg=f"component {i} (u16 stream)")
