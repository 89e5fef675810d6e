"""Equivalence tests for the Pallas VMEM kernels (ops/pallas_fold.py),
run in interpreter mode on CPU (the TPU lowering is exercised by the
benchmarks; the kernel math must match the 2-D elementwise chains
bit-for-... well, to float reassociation).

Mirrors the reference's dual-path equivalence discipline
(solver_options.hpp:266 reduction_alg cross-checks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rootba_tpu.ops.pallas_fold import w_build_table


def w_ref(q_tab, jp_tab, n):
    L = q_tab.shape[0]
    qf = q_tab.reshape(L * n, 6)
    jpf = jp_tab.reshape(L * n, 18)
    W27 = (jnp.repeat(qf[:, :3], 9, axis=1)
           * jnp.tile(jpf[:, :9], (1, 3))
           + jnp.repeat(qf[:, 3:], 9, axis=1)
           * jnp.tile(jpf[:, 9:], (1, 3)))
    return W27.reshape(L, n * 27)


@pytest.mark.parametrize("n,L", [(2, 7), (3, 64), (5, 129), (8, 40),
                                 (16, 9), (32, 3)])
def test_w_build_matches_elementwise(n, L):
    rng = np.random.default_rng(n * 100 + L)
    q = jnp.asarray(rng.standard_normal((L, n * 6)), jnp.float32)
    jp = jnp.asarray(rng.standard_normal((L, n * 18)), jnp.float32)
    ref = np.asarray(w_ref(q, jp, n))
    out = np.asarray(w_build_table(q, jp, n, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_w_build_gated_by_bucket_width():
    """Wide buckets (long landmark tracks) must not route to the
    Pallas kernel: its expansion matrices scale O(n^2) in VMEM and
    Mosaic would fail at compile time on real TPUs, which
    interpret-mode CPU tests cannot catch (ADVICE r3). The gate lives
    in w_build_available(dtype, n)."""
    from rootba_tpu.ops.pallas_fold import W_BUILD_MAX_N, w_build_available

    # dtype gating unchanged: f64 never routes to the kernel
    assert not w_build_available(jnp.float64, 4)
    # width gating is backend-independent (False regardless of device)
    for n in (W_BUILD_MAX_N * 2, 64, 128):
        assert not w_build_available(jnp.float32, n)


@pytest.mark.parametrize("width,K", [(2, 2), (4, 3), (16, 3)])
def test_outer81_fold_pallas_matches(width, K):
    """outer81_fold_pallas (interpret mode) == the XLA dot_general
    fold, including the ragged last grid block."""
    from rootba_tpu.ops.pallas_fold import outer81_fold_pallas
    from rootba_tpu.solver.linearization import _outer81_fold

    rng = np.random.default_rng(3)
    M = (3 * 512 + 5 * width)  # ragged vs the 512-slot block
    M = M // width * width
    s1 = jnp.asarray(rng.standard_normal((M, K * 9)), jnp.float32)
    s2 = jnp.asarray(rng.standard_normal((M, K * 9)), jnp.float32)
    ref = np.asarray(_outer81_fold(s1, s2, width))
    out = np.asarray(outer81_fold_pallas(s1, s2, width,
                                         interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
