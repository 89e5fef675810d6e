"""`bal` executable: BA solve on one problem (reference app/bal.cpp:45-121).

Usage: python -m rootba_tpu.cli.bal --input problem.txt [options]
"""

from __future__ import annotations

import sys
from typing import List, Optional


def run_app(summary_text: str, argv: Optional[List[str]] = None,
            forced_solver_type: Optional[str] = None) -> int:
    from rootba_tpu.cli.common import parse_bal_app_arguments

    options = parse_bal_app_arguments(summary_text, argv, forced_solver_type)
    if options is None:
        return 0

    import jax

    from rootba_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    if options.solver.use_double:
        jax.config.update("jax_enable_x64", True)

    from rootba_tpu.bal.problem import (
        DatasetSummary,
        PipelineTimingSummary,
        load_normalized_bal_problem,
    )
    from rootba_tpu.log.ba_log import save_log
    from rootba_tpu.log.summary import SolverSummary
    from rootba_tpu.solver.lm import bundle_adjust

    dataset_summary = DatasetSummary()
    timing = PipelineTimingSummary()
    problem = load_normalized_bal_problem(
        options.dataset, dataset_summary, timing)

    solver_summary = SolverSummary()
    bundle_adjust(problem, options.solver, solver_summary, timing)

    if options.dataset.save_output:
        import time

        t0 = time.monotonic()
        out_path = options.dataset.output_optimized_path
        # .cereal -> reference binary layout (save_rootba,
        # bal_problem.cpp:557-568); .txt/.bal -> reference-readable
        # BAL text; anything else -> npz
        if out_path.endswith(".cereal"):
            from rootba_tpu.bal.rootba_io import save_rootba

            save_rootba(problem, out_path)
        elif out_path.endswith((".txt", ".bal")):
            problem.save_bal(out_path)
        else:
            problem.save_npz(out_path)
        timing.postprocess_time = time.monotonic() - t0

    save_log(options.solver.log, solver_summary, dataset_summary, timing,
             quiet=options.dataset.quiet)
    return 0


def main() -> int:
    return run_app("rootba_tpu bundle adjustment on a BAL problem")


if __name__ == "__main__":
    sys.exit(main())
