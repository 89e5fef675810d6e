#!/usr/bin/env python3
"""Visualize the RCS (camera-pair) sparsity of a BAL problem (port of
the reference's scripts/show-sparsity.py)."""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="BAL problem file")
    ap.add_argument("--save", default=None, help="save PNG instead of showing")
    args = ap.parse_args()

    import numpy as np

    from rootba_tpu.bal.problem import load_normalized_bal_problem
    from rootba_tpu.config.options import BalDatasetOptions

    p = load_normalized_bal_problem(
        BalDatasetOptions(input=args.input, quiet=True, normalize=False))
    N = p.num_cameras
    H = np.zeros((N, N), dtype=bool)
    # cameras i,j are coupled iff they co-observe a landmark
    order = np.argsort(p.obs_lm, kind="stable")
    lm = p.obs_lm[order]
    cam = p.obs_cam[order]
    starts = np.searchsorted(lm, np.arange(p.num_landmarks))
    ends = np.searchsorted(lm, np.arange(p.num_landmarks), side="right")
    for s, e in zip(starts, ends):
        cs = cam[s:e]
        H[np.ix_(cs, cs)] = True
    nnz = H.sum()
    print(f"{N} cameras, RCS block sparsity: {nnz}/{N*N} "
          f"({100.0*nnz/(N*N):.2f}% nonzero)")

    import matplotlib
    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(7, 7))
    plt.spy(H, markersize=max(0.2, 200.0 / N))
    plt.title(f"RCS sparsity ({100.0*nnz/(N*N):.1f}% nonzero)")
    if args.save:
        plt.savefig(args.save, dpi=120)
        print(f"saved {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
