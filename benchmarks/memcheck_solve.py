"""Compile the solve stage at a given problem scale and print XLA's
memory analysis (argument/output/temp/peak sizes). No execution.

    python -u benchmarks/memcheck_solve.py [problem]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "venice"

    from benchmarks.scale_bench import SIZES
    from rootba_tpu.bal.bucketing import bucketize
    from rootba_tpu.bal.synthetic import generate_synthetic_bal
    from rootba_tpu.config.options import SolverOptions
    from rootba_tpu.solver.lm import create_linearizer, initial_state
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

    s1 = jax.jit(lin.stage1_pure)
    lowered1 = s1.lower(lin.consts, state.cams, state.lm_ps)
    c1 = lowered1.compile()
    print("stage1:", c1.memory_analysis(), flush=True)

    lins_shape = jax.eval_shape(
        lin.stage1_pure, lin.consts, state.cams, state.lm_ps)[0]
    lins = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), lins_shape)

    sv = jax.jit(lin.solve_pure)
    lowered = sv.lower(lin.consts, lins, lam)
    c = lowered.compile()
    print("solve:", c.memory_analysis(), flush=True)


if __name__ == "__main__":
    main()
