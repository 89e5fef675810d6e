"""`bal_ceres` executable: forces the external-baseline solver
(reference app/bal_ceres.cpp pattern; scipy stands in for Ceres)."""

import sys

from rootba_tpu.cli.bal import run_app


def main() -> int:
    return run_app(
        "rootba_tpu bundle adjustment (external scipy baseline)",
        forced_solver_type="CERES")


if __name__ == "__main__":
    sys.exit(main())
