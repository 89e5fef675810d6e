"""Micro-benchmark: sqrt-BA implicit RCS matvec variants on device.

The matvec is the hot loop of the PCG solve (executed sum(cg_iters)
times per LM solve; reference linearization_qr.hpp:406-429). Its TPU
cost is dominated by how the per-observation contributions are reduced
into the camera-indexed accumulator [N, 9]:

  scatter      jax.ops.segment_sum (unsorted scatter-add)
  sorted       segment_sum with a static pre-sort permutation by camera
  gather       CSR-by-camera: pad per-camera obs lists, gather + reduce

Run: python benchmarks/micro_matvec.py [--cams N] [--lms M] [--dtype f32]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from rootba_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def build_case(num_cams, num_lms, mean_obs, seed=0):
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver.lm import SqrtLinearizer, initial_state

    p = generate_synthetic_bal(num_cams=num_cams, num_lms=num_lms,
                               mean_obs_per_lm=mean_obs, seed=seed)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    bp = bucketize(p)
    opts = SolverOptions(use_double=False)
    lin = SqrtLinearizer(bp, opts, jnp.float32)
    state = initial_state(bp, jnp.float32)
    lin.set_state(state)
    lins, pose_scale, _ = jax.block_until_ready(
        lin._stage1_fn(lin.consts, state.cams, state.lm_ps))
    return lin, lins


def bench(fn, x, iters=50):
    fn(x).block_until_ready()  # compile
    t0 = time.monotonic()
    y = x
    for _ in range(iters):
        y = fn(y)
    y.block_until_ready()
    return (time.monotonic() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=1778)
    ap.add_argument("--lms", type=int, default=200000)
    ap.add_argument("--obs-per-lm", type=float, default=5.0)
    args = ap.parse_args()

    from rootba_tpu.solver import sqrt_qr

    lin, lins = build_case(args.cams, args.lms, args.obs_per_lm)
    N = lin.num_cameras
    lam = jnp.asarray(1e-4, jnp.float32)
    stage2 = jax.jit(lambda l: sqrt_qr.sqrt_stage2(
        l, lin.buckets, lam, N))(lins)

    total_obs = sum(int(b.mask.sum()) for b in lin.buckets)
    bytes_per_matvec = sum(
        l.Jp.size * 4 + s.size * 4
        for l, s in zip(lins, stage2.Q1h))
    print(f"cams={N} lms={sum(b.lm_mask.shape[0] for b in lin.buckets)} "
          f"obs={total_obs} traffic/matvec ~ {bytes_per_matvec/1e6:.1f} MB")

    # variant 1: scatter segment_sum (current implementation)
    f_scatter = jax.jit(lambda x: sqrt_qr.sqrt_matvec(
        lins, lin.buckets, stage2, N, x))

    x0 = jnp.zeros((N, 9), jnp.float32) + 0.01
    dt = bench(f_scatter, x0)
    print(f"scatter:  {dt*1e3:8.3f} ms/matvec  "
          f"({bytes_per_matvec/dt/1e9:.1f} GB/s effective)")

    dev = jax.devices()[0]
    print("device:", dev)


if __name__ == "__main__":
    main()
