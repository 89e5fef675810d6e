"""`bal_power_sc` executable: forces solver_type=POWER_SCHUR_COMPLEMENT
(reference app/bal_power_sc.cpp pattern, e.g. app/bal_qr.cpp:58-61)."""

import sys

from rootba_tpu.cli.bal import run_app


def main() -> int:
    return run_app(
        "rootba_tpu bundle adjustment (forced POWER_SCHUR_COMPLEMENT)",
        forced_solver_type="POWER_SCHUR_COMPLEMENT")


if __name__ == "__main__":
    sys.exit(main())
