"""Per-piece XLA memory analysis of the explicit solve at scale.

    python -u benchmarks/memcheck_pieces.py [problem]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def report(name, fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    m = c.memory_analysis()
    print(f"{name:28s} code {m.generated_code_size_in_bytes/2**30:6.2f}G "
          f"args {m.argument_size_in_bytes/2**30:6.2f}G "
          f"out {m.output_size_in_bytes/2**30:6.2f}G "
          f"temp {m.temp_size_in_bytes/2**30:6.2f}G", flush=True)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "venice"

    from benchmarks.scale_bench import SIZES
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver import sqrt_flat
    from rootba_tpu.solver.cg import pcg
    from rootba_tpu.solver.explicit_sc import sc_matvec_dense
    from rootba_tpu.solver.lm import create_linearizer, initial_state
    from rootba_tpu.solver.sqrt_qr import precond_apply
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    nc, nl, nobs = SIZES[name]
    p = generate_synthetic_bal(num_cams=nc, num_lms=nl,
                               mean_obs_per_lm=nobs / nl, seed=17)
    p.normalize(100.0)
    p.filter_obs(0.1)
    opts = SolverOptions(use_double=False, verbosity_level=0)
    bp = bucketize(p, pow2_from=opts.bucket_pow2_from)
    lin = create_linearizer(bp, opts, "float32")
    state = initial_state(bp, "float32")
    lam = jnp.asarray(1e-4, jnp.float32)
    buckets, csr, cam_flat, pairs = lin.consts[:4]
    N = lin.num_cameras

    lins_shape, _, _ = jax.eval_shape(
        lin.stage1_pure, lin.consts, state.cams, state.lm_ps)
    lins = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), lins_shape)

    def stage2_fn(lins, lam):
        return sqrt_flat.flat_stage2(lins, buckets, cam_flat, lam, N,
                                     csr=csr, with_precond=False)

    report("stage2 (no precond)", stage2_fn, lins, lam)

    s2_shape = jax.eval_shape(stage2_fn, lins, lam)
    s2 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), s2_shape)

    def asm_fn(lins, s2):
        return sqrt_flat.flat_assemble_rcs(lins, s2, cam_flat, pairs,
                                           N, csr=csr)

    report("assemble (pairs+diag+dense)", asm_fn, lins, s2)

    Hd = jnp.zeros((N * 9, N * 9), jnp.float32)
    chol = jnp.zeros((N, 9, 9), jnp.float32)
    b = jnp.zeros((N, 9), jnp.float32)

    def cg_fn(Hd, chol, b):
        return pcg(lambda x: sc_matvec_dense(Hd, x),
                   lambda r: precond_apply(chol, r), b,
                   min_num_iterations=0, max_num_iterations=100,
                   q_tolerance=0.1, r_tolerance=-1.0)

    report("pcg (dense, 100 max)", cg_fn, Hd, chol, b)


if __name__ == "__main__":
    main()
