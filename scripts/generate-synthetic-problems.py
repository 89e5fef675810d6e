#!/usr/bin/env python3
"""Generate a suite of synthetic BAL problems for offline testing and
benchmarking (the real BAL suite needs network access; see
scripts/download-bal-problems.sh). Sizes mimic well-known BAL problems.
"""

from __future__ import annotations

import argparse
import os

SUITE = {
    # name: (num_cams, num_lms, mean_obs_per_lm)
    "ladybug/problem-49-7776": (49, 7776, 31843 / 7776),
    "ladybug/problem-73-11032": (73, 11032, 4.2),
    "trafalgar/problem-21-11315": (21, 11315, 3.2),
    "trafalgar/problem-257-65132": (257, 65132, 3.5),
    "dubrovnik/problem-16-22106": (16, 22106, 3.8),
    "venice/problem-52-64053": (52, 64053, 5.5),
    "venice/problem-1778-993923": (1778, 993923, 5.03),
    "final/problem-93-61203": (93, 61203, 4.6),
    "final/problem-4585-1324582": (4585, 1324582, 7.4),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", nargs="?", default="data/bal-synth")
    ap.add_argument("--only", nargs="*", default=None,
                    help="substring filters, e.g. 'ladybug' '49'")
    ap.add_argument("--max-lms", type=int, default=None,
                    help="skip problems with more landmarks than this")
    args = ap.parse_args()

    from rootba_tpu.bal.synthetic import generate_synthetic_bal, write_bal_file

    for name, (nc, nl, mo) in SUITE.items():
        if args.only and not any(s in name for s in args.only):
            continue
        if args.max_lms and nl > args.max_lms:
            print(f"skip {name} (too large)")
            continue
        path = os.path.join(args.target, name + "-pre.txt")
        if os.path.exists(path):
            print(f"have {path}")
            continue
        os.makedirs(os.path.dirname(path), exist_ok=True)
        print(f"generate {name}: {nc} cams, {nl} lms ...")
        p = generate_synthetic_bal(num_cams=nc, num_lms=nl,
                                   mean_obs_per_lm=mo,
                                   seed=abs(hash(name)) % (2**31))
        write_bal_file(p, path)
        print(f"wrote {path} ({p.num_observations} obs)")


if __name__ == "__main__":
    main()
