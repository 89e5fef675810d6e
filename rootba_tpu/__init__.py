"""rootba_tpu: a TPU-native square-root bundle adjustment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of RootBA
(https://github.com/NikolausDemmel/rootba): Levenberg-Marquardt bundle
adjustment on BAL-style problems with three manual linear solvers

  * SQUARE_ROOT          -- sqrt-BA landmark marginalization (CVPR'21)
  * SCHUR_COMPLEMENT     -- explicit reduced camera system + PCG
  * POWER_SCHUR_COMPLEMENT -- PoBA power-series inverse (CVPR'23)

re-designed TPU-first: landmark blocks become obs-count-bucketed padded
tensors, TBB parallel loops become batched XLA/Pallas kernels inside jit,
mutex scatters become segment-sums, and multi-chip scaling uses
jax.sharding meshes with psum collectives over the camera axis.
"""

__version__ = "0.1.0"

__all__ = [
    "BalProblem",
    "load_normalized_bal_problem",
    "BalDatasetOptions",
    "BalResidualOptions",
    "SolverOptions",
    "bundle_adjust",
]


def __getattr__(name):  # lazy imports keep `import rootba_tpu` light
    if name in ("BalProblem", "load_normalized_bal_problem"):
        from rootba_tpu.bal import problem as _m

        return getattr(_m, name)
    if name in ("BalDatasetOptions", "BalResidualOptions", "SolverOptions"):
        from rootba_tpu.config import options as _m

        return getattr(_m, name)
    if name == "bundle_adjust":
        from rootba_tpu.solver.lm import bundle_adjust

        return bundle_adjust
    raise AttributeError(name)
