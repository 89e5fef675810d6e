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
