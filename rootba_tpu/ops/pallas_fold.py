"""Pallas TPU kernels for the narrow per-slot block products of the
sqrt/SC assemblies.

Why these exist: the hot assembly chains multiply 3/9-wide per-slot
blocks (W = Q1h'Jp, the 9x9 gram folds). In plain XLA every
materialized intermediate of such a chain lane-pads its minor dim to
128 (the (8,128) tile), so the repeat/tile elementwise forms are
bound by pad traffic, not math (docs/Performance.md cost model). A
Pallas kernel keeps the whole chain in VMEM: the only HBM traffic is
the (per-bucket, slot-major, already bounded-pad) input tables and
the output table.

The in-kernel trick: Mosaic has no lane-axis repeat/tile/gather, so
the slot expansions are expressed as matmuls against 0/1 expansion
matrices (built host-side per bucket width, passed as inputs).
Precision.HIGHEST keeps every expanded copy f32-exact (each output
element is a single product x*1); measured max rel err vs the
elementwise chain is ~2e-7 (float reassociation only) --
benchmarks/fold_variants.py.

Reference mapping: the W build is the Q1h^T Jp product of
linearization_qr.hpp:716-815 (get_stage2 W blocks); the TPU layout
and kernelization are original.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Rows per grid step. [cb, 2*n*27]-wide VMEM transients must fit next
# to the in/out blocks and their pipeline double-buffers (~6 MB at
# n=8, cb=1024); cb shrinks with n to hold cb*n ~ 8192 so the
# transient envelope stays constant across bucket widths.
_CB = 1024

# The expansion matrices alone are 5184*n^2 bytes ([n*6 + n*18,
# 2*n*27]) -- 1.3 MB at n=16, 5.3 MB at n=32 -- and do not shrink
# with cb, so wide buckets (long landmark tracks in real BAL data)
# would blow the ~16 MB VMEM budget at Mosaic compile time. Buckets
# above this width take the elementwise w_chunk path instead.
W_BUILD_MAX_N = 16


def _available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=None)
def _w_expand_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """0/1 expansion matrices for the per-slot W = Q1h'Jp product.

    Column layout r*n*27 + i*27 + c*9 + a (residual-row r major) so the
    r-sum after the elementwise product is ONE static half-slice add:
        A[s, col] = q_tab[s, i*6 + r*3 + c]
        B[s, col] = jp_tab[s, i*18 + r*9 + a]
        W[s, i*27 + c*9 + a] = sum_r (A*B)[s, col]
    """
    eq = np.zeros((n * 6, 2 * n * 27), np.float32)
    ej = np.zeros((n * 18, 2 * n * 27), np.float32)
    for r in range(2):
        for i in range(n):
            for c in range(3):
                for a in range(9):
                    col = r * n * 27 + i * 27 + c * 9 + a
                    eq[i * 6 + r * 3 + c, col] = 1.0
                    ej[i * 18 + r * 9 + a, col] = 1.0
    return eq, ej


def _w_build_kernel(q_ref, jp_ref, eq_ref, ej_ref, out_ref, *, n):
    a = jax.lax.dot_general(
        q_ref[:], eq_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)  # [cb, 2*n*27]
    b = jax.lax.dot_general(
        jp_ref[:], ej_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    p = a * b
    out_ref[:] = p[:, :n * 27] + p[:, n * 27:]


def w_build_available(dtype, n: int | None = None) -> bool:
    if n is not None and n > W_BUILD_MAX_N:
        return False
    return _available() and jnp.dtype(dtype) == jnp.dtype(jnp.float32)


def w_build_table(q_tab: jnp.ndarray, jp_tab: jnp.ndarray, n: int,
                  interpret: bool = False) -> jnp.ndarray:
    """W strip table [L, n*27] from Q1h [L, n*6] and Jp [L, n*18]
    per-bucket tables, entirely in VMEM (see module docstring).

    L need not divide the row block: the grid is ceil-divided and
    Pallas masks the ragged last block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = q_tab.shape[0]
    eq, ej = _w_expand_mats(n)
    cap = max(64, (8 * _CB // max(n, 8)) // 8 * 8)  # cb*n ~ 8k rows
    cb = min(cap, max(64, -(-L // 8) * 8)) if L < cap else cap
    kern = functools.partial(_w_build_kernel, n=n)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(L, cb),),
        in_specs=[
            pl.BlockSpec((cb, n * 6), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, n * 18), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n * 6, 2 * n * 27), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n * 18, 2 * n * 27), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, n * 27), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n * 27), jnp.float32),
        interpret=interpret,
    )(q_tab, jp_tab, jnp.asarray(eq), jnp.asarray(ej))


# ---------------------------------------------------------------------------
# Run-folded 9x9 outer products (the stream reducers' hot op)

# slots per grid block: divisible by every run width (2..32). Small
# blocks balance the in-kernel [cb/W, cb] selector matmul against the
# expansion matmuls: measured flat 43 ms across cb 256-1024 for 2.4M
# slots at W=4/8, rising at 2048 (the selector's flops scale cb/W per
# output row)
_FOLD_CB = 512


@functools.lru_cache(maxsize=None)
def _fold_expand_mats(K: int) -> Tuple[np.ndarray, np.ndarray]:
    """0/1 expansion matrices for the per-slot block outer product:
        (s1 @ E1)[s, k*81 + a*9 + b] = s1[s, k*9 + a]
        (s2 @ E2)[s, k*81 + a*9 + b] = s2[s, k*9 + b]
    so the elementwise product summed over the k-slices is the [81]
    block-product row of slot s."""
    E1 = np.zeros((K * 9, K * 81), np.float32)
    E2 = np.zeros((K * 9, K * 81), np.float32)
    for k in range(K):
        for a in range(9):
            for b in range(9):
                col = k * 81 + a * 9 + b
                E1[k * 9 + a, col] = 1.0
                E2[k * 9 + b, col] = 1.0
    return E1, E2


def _fold_kernel(s1_ref, s2_ref, e1_ref, e2_ref, out_ref, *, K, W, M):
    from jax.experimental import pallas as pl

    cb = s1_ref.shape[0]
    a = jax.lax.dot_general(
        s1_ref[:], e1_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)  # [cb, K*81]
    b = jax.lax.dot_general(
        s2_ref[:], e2_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    p = a * b
    acc = p[:, :81]
    for k in range(1, K):
        acc = acc + p[:, k * 81:(k + 1) * 81]
    # zero the ragged tail block's out-of-range slot rows
    i = pl.program_id(0)
    slot = i * cb + jax.lax.broadcasted_iota(jnp.int32, (cb, 1), 0)
    acc = jnp.where(slot < M, acc, 0.0)
    # fold width-W runs with a 0/1 matmul (an in-VMEM [cb/W, cb]
    # selector; sublane-axis reshapes/strided sums are relayouts)
    run_of = jax.lax.broadcasted_iota(jnp.int32, (cb // W, cb), 1) // W
    row = jax.lax.broadcasted_iota(jnp.int32, (cb // W, cb), 0)
    F = (run_of == row).astype(acc.dtype)
    out_ref[:] = jax.lax.dot_general(
        F, acc, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def outer81_fold_available(dtype) -> bool:
    return _available() and jnp.dtype(dtype) == jnp.dtype(jnp.float32)


def outer81_fold_pallas(s1: jnp.ndarray, s2: jnp.ndarray, width: int,
                        interpret: bool = False) -> jnp.ndarray:
    """[M, K*9] slot-major strips -> [M/width, 81] run-folded block
    products, entirely in VMEM.

    Replaces the XLA dot_general form whose [R, K9, K9] wide
    intermediate tile-pads (27,27)->(32,128) in HBM: ~16 KB of
    write+read per run, which dominates venice's stage2 at the
    adaptive widths W<=8 (measured 63 ns/slot; the in-VMEM kernel
    leaves only the gathered inputs and the [R, 81] output in HBM)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K9 = s1.shape
    K = K9 // 9
    R = M // width
    assert R * width == M
    cb = _FOLD_CB
    if M <= cb:
        cb = max(width, -(-M // 8) * 8)
        cb = -(-cb // width) * width
    E1, E2 = _fold_expand_mats(K)
    kern = functools.partial(_fold_kernel, K=K, W=width, M=M)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(M, cb),),
        in_specs=[
            pl.BlockSpec((cb, K9), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, K9), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K9, K * 81), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K9, K * 81), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb // width, 81), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 81), jnp.float32),
        interpret=interpret,
    )(s1, s2, jnp.asarray(E1), jnp.asarray(E2))
