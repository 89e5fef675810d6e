"""`bal_qr` executable: forces solver_type=SQUARE_ROOT
(reference app/bal_qr.cpp pattern, e.g. app/bal_qr.cpp:58-61)."""

import sys

from rootba_tpu.cli.bal import run_app


def main() -> int:
    return run_app(
        "rootba_tpu bundle adjustment (forced SQUARE_ROOT)",
        forced_solver_type="SQUARE_ROOT")


if __name__ == "__main__":
    sys.exit(main())
