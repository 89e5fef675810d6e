"""CG-loop overhead: full pcg iterations vs bare matvecs on a dense H.

    python -u benchmarks/micro_cg.py [N] [iters]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.flat_times import chain, timed


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 257
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from rootba_tpu.solver.cg import pcg
    from rootba_tpu.solver.explicit_sc import sc_matvec_dense
    from rootba_tpu.solver.sqrt_qr import precond_apply
    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    n = 9 * N
    A = (rng.normal(size=(n, n)) / np.sqrt(n)).astype(np.float32)
    H = jnp.asarray((A @ A.T + 2.0 * np.eye(n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32))
    chol = jnp.linalg.cholesky(
        jnp.asarray(np.stack([np.eye(9, dtype=np.float32) * 2.0] * N)))
    z = jnp.zeros((), jnp.float32)
    K = 4

    def bare(eps):
        def body(i, x):
            return sc_matvec_dense(H, x) * (1.0 / (2.1 + eps))
        return jax.lax.fori_loop(0, iters, body, b)

    timed(f"{iters} bare matvecs [{n}]", chain(bare), K, z)

    def full(eps):
        res = pcg(
            lambda x: sc_matvec_dense(H, x),
            lambda r: precond_apply(chol, r),
            b + eps,
            min_num_iterations=iters,
            max_num_iterations=iters,
            q_tolerance=-1.0, r_tolerance=-1.0)
        return res.x

    timed(f"{iters}-iter pcg [{n}]", chain(full), K, z)


if __name__ == "__main__":
    main()
