"""Micro-bench of run-folded 9x9 gram product variants (the
_outer81_fold hot op of the strip assemblies; see
linearization._outer81_fold). Amortized on-device via a serial
fori_loop chain so tunnel RTs divide out.

    python -u benchmarks/fold_variants.py [slots] [K]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

WIDTH = 64


def fold_current(s1, s2):
    """dot_general [R, W*K, 9] x [R, W*K, 9] at HIGHEST (baseline)."""
    r1 = s1.reshape(s1.shape[0] // WIDTH, -1, 9)
    r2 = s2.reshape(s2.shape[0] // WIDTH, -1, 9)
    out = jax.lax.dot_general(
        r1, r2, (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(out.shape[0], 81)


def fold_wide(s1, s2):
    """[R, W, K*9]^T [R, W, K*9] -> [R, K9, K9], then sum the K diagonal
    9x9 blocks (3x the MXU output, 1/K the contraction passes)."""
    K9 = s1.shape[1]
    K = K9 // 9
    r1 = s1.reshape(s1.shape[0] // WIDTH, WIDTH, K9)
    r2 = s2.reshape(s2.shape[0] // WIDTH, WIDTH, K9)
    wide = jax.lax.dot_general(
        r1, r2, (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)  # [R, K9, K9]
    out = wide[:, 0:9, 0:9]
    for k in range(1, K):
        out = out + wide[:, k * 9:(k + 1) * 9, k * 9:(k + 1) * 9]
    return out.reshape(-1, 81)


def fold_default(s1, s2):
    r1 = s1.reshape(s1.shape[0] // WIDTH, -1, 9)
    r2 = s2.reshape(s2.shape[0] // WIDTH, -1, 9)
    out = jax.lax.dot_general(
        r1, r2, (((1,), (1,)), ((0,), (0,))))
    return out.reshape(out.shape[0], 81)


def fold_3bf16(s1, s2):
    """f32 ~= hi + lo bf16 split: hi'hi + hi'lo + lo'hi on the bf16 MXU
    path (error ~ lo'lo ~ 2^-16 relative)."""
    def split(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    h1, l1 = split(s1)
    h2, l2 = split(s2)

    def dg(a, b):
        ra = a.reshape(a.shape[0] // WIDTH, -1, 9)
        rb = b.reshape(b.shape[0] // WIDTH, -1, 9)
        return jax.lax.dot_general(
            ra, rb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    out = dg(h1, h2) + dg(h1, l2) + dg(l1, h2)
    return out.reshape(out.shape[0], 81)


def fold_vpu(s1, s2):
    """strictly-2-D repeat/tile chain (the pre-MXU elementwise path)."""
    K9 = s1.shape[1]
    K = K9 // 9
    out = None
    for k in range(K):
        a = s1[:, k * 9:(k + 1) * 9]
        b = s2[:, k * 9:(k + 1) * 9]
        t = jnp.repeat(a, 9, axis=1) * jnp.tile(b, (1, 9))
        out = t if out is None else out + t
    return jnp.sum(out.reshape(-1, WIDTH, 81), axis=1)


def _fold_pallas_kernel(s1_ref, s2_ref, out_ref, *, K, cb):
    import jax.numpy as jnp
    s1 = s1_ref[:]
    s2 = s2_ref[:]
    out = None
    for k in range(K):
        a = s1[:, k * 9:(k + 1) * 9]
        b = s2[:, k * 9:(k + 1) * 9]
        t = jnp.repeat(a, 9, axis=1) * jnp.tile(b, (1, 9))
        out = t if out is None else out + t
    out_ref[:] = jnp.sum(out.reshape(cb // WIDTH, WIDTH, 81), axis=1)


def make_fold_pallas(K, cb=2048, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(_fold_pallas_kernel, K=K, cb=cb)

    def fold(s1, s2):
        rows = s1.shape[0]
        grid = rows // cb
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((cb, K * 9), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cb, K * 9), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((cb // WIDTH, 81), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows // WIDTH, 81),
                                           jnp.float32),
            interpret=interpret,
        )(s1, s2)

    return fold


def _fold_pallas_mxu_kernel(s1_ref, s2_ref, e1_ref, e2_ref, out_ref,
                            *, K, cb):
    """expansion-matmul form: A = s1 @ E1, B = s2 @ E2 (0/1 matrices,
    HIGHEST keeps the copies exact), P = A*B summed over the K groups,
    then the run fold."""
    a = jax.lax.dot_general(
        s1_ref[:], e1_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)  # [cb, K*81]
    b = jax.lax.dot_general(
        s2_ref[:], e2_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    p = a * b
    out = p[:, :81]
    for k in range(1, K):
        out = out + p[:, k * 81:(k + 1) * 81]
    out_ref[:] = jnp.sum(out.reshape(cb // WIDTH, WIDTH, 81), axis=1)


def make_fold_pallas_mxu(K, cb=2048, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e1 = np.zeros((K * 9, K * 81), np.float32)
    e2 = np.zeros((K * 9, K * 81), np.float32)
    for k in range(K):
        for aa in range(9):
            for bb in range(9):
                e1[k * 9 + aa, k * 81 + aa * 9 + bb] = 1.0
                e2[k * 9 + bb, k * 81 + aa * 9 + bb] = 1.0
    e1 = jnp.asarray(e1)
    e2 = jnp.asarray(e2)

    kern = functools.partial(_fold_pallas_mxu_kernel, K=K, cb=cb)

    def fold(s1, s2):
        rows = s1.shape[0]
        grid = rows // cb
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((cb, K * 9), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cb, K * 9), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K * 9, K * 81), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K * 9, K * 81), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((cb // WIDTH, 81), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows // WIDTH, 81),
                                           jnp.float32),
            interpret=interpret,
        )(s1, s2, e1, e2)

    return fold


def bench(name, fn, s1, s2, ref, reps=8):
    from rootba_tpu.utils.jax_setup import sync

    @jax.jit
    def chain(x1, x2):
        def body(i, c):
            o = fn(x1 * (1.0 + c * 1e-30), x2)
            return c + o.ravel()[0] * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    try:
        out = jax.jit(fn)(s1, s2)
        err = float(jnp.max(jnp.abs(out - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-30))
        sync(chain(s1, s2))
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            sync(chain(s1, s2))
            ts.append((time.monotonic() - t0) / reps)
        dt = sorted(ts)[1]
        slots = s1.shape[0]
        print(f"{name:22s} {dt * 1e3:8.2f} ms  "
              f"{slots / dt / 1e6:8.1f} Mslot/s  maxrel {err:.2e}",
              flush=True)
        return dt
    except Exception as e:
        print(f"{name:22s} FAILED: {str(e).splitlines()[0][:100]}",
              flush=True)
        return None


def main():
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 2_621_440
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    slots = slots // 2048 * 2048
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    s1 = jax.random.normal(k1, (slots, K * 9), jnp.float32)
    s2 = jax.random.normal(k2, (slots, K * 9), jnp.float32)
    ref = jax.jit(fold_current)(s1, s2)
    interp = jax.default_backend() == "cpu"
    print(f"slots={slots} K={K} dev={jax.devices()[0]}", flush=True)
    bench("dot_general HIGHEST", fold_current, s1, s2, ref)
    bench("dot_general wide-N", fold_wide, s1, s2, ref)
    bench("dot_general DEFAULT", fold_default, s1, s2, ref)
    bench("3x bf16", fold_3bf16, s1, s2, ref)
    bench("vpu repeat/tile", fold_vpu, s1, s2, ref)
    bench("pallas vpu", make_fold_pallas(K, interpret=interp),
          s1, s2, ref)
    bench("pallas mxu-expand", make_fold_pallas_mxu(K, interpret=interp),
          s1, s2, ref)


if __name__ == "__main__":
    main()
