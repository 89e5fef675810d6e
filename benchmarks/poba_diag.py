"""Diagnose the PoBA venice cost gap (VERDICT r3 item 1).

Runs POWER_SCHUR_COMPLEMENT in its three E0 formulations (dense /
bsr / implicit) against SCHUR_COMPLEMENT ground truth on a mid-size
synthetic problem, printing per-iteration accepted costs side by side.
Venice uses the bsr mode (1778 cams > dense_rcs_max_cameras=1024);
toy CI tests only covered dense vs implicit.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rootba_jax_cache")

import numpy as np

from rootba_tpu.bal.synthetic import generate_synthetic_bal
from rootba_tpu.config.options import SolverOptions, SolverType
from rootba_tpu.solver.lm import bundle_adjust


def fresh(seed=3):
    p = generate_synthetic_bal(num_cams=60, num_lms=4000,
                               mean_obs_per_lm=4.5, seed=seed)
    p.normalize(100.0)
    p.perturb(0.0, 0.01, 0.01, 38401)
    p.filter_obs(0.1)
    return p


def run(tag, **kw):
    p = fresh()
    opts = SolverOptions(max_num_iterations=20, verbosity_level=0,
                         bucket_pow2_from=4, **kw)
    s = bundle_adjust(p, opts)
    costs = [it.cost.all.error for it in s.iterations if it.step_is_successful or it.iteration == 0]
    print(f"{tag:28s} final={s.final_cost.all.error:.4f} "
          f"iters={len(s.iterations)}")
    return s


if __name__ == "__main__":
    s_sc = run("SC (truth)", solver_type=SolverType.SCHUR_COMPLEMENT)
    s_d = run("PoBA dense", solver_type=SolverType.POWER_SCHUR_COMPLEMENT)
    s_b = run("PoBA bsr", solver_type=SolverType.POWER_SCHUR_COMPLEMENT,
              dense_rcs_max_cameras=30)
    s_i = run("PoBA implicit", solver_type=SolverType.POWER_SCHUR_COMPLEMENT,
              dense_rcs_max_cameras=0)
    print("\nper-iteration accepted cost (SC | dense | bsr | implicit):")
    for i, (a, b, c, d) in enumerate(zip(s_sc.iterations, s_d.iterations,
                                         s_b.iterations, s_i.iterations)):
        print(f"  it{i:02d} {a.cost.all.error:12.4f} {b.cost.all.error:12.4f} "
              f"{c.cost.all.error:12.4f} {d.cost.all.error:12.4f} "
              f"cg=({a.linear_solver_iterations},{b.linear_solver_iterations},"
              f"{c.linear_solver_iterations},{d.linear_solver_iterations})")
