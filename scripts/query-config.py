#!/usr/bin/env python3
"""Query a value from a rootba_config.toml (port of the reference's
scripts/query-config.py). Usage: query-config.py CONFIG dotted.key"""

import argparse
import sys
import tomllib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("key", help="dotted path, e.g. solver.solver_type")
    args = ap.parse_args()
    with open(args.config, "rb") as fp:
        cfg = tomllib.load(fp)
    cur = cfg
    for part in args.key.split("."):
        if not isinstance(cur, dict) or part not in cur:
            print(f"key '{args.key}' not found", file=sys.stderr)
            return 1
        cur = cur[part]
    print(cur)
    return 0


if __name__ == "__main__":
    sys.exit(main())
