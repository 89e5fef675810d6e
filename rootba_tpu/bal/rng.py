"""Bit-exact re-implementation of the perturbation RNG of the reference.

The reference perturbs the loaded problem state with
``std::default_random_engine`` (libstdc++: minstd_rand0) +
``std::normal_distribution<double>`` (libstdc++: Marsaglia polar method
over two-draw generate_canonical), seeded with the benchmark seed 38401
(reference bal_problem.cpp:90-115, :509-554). Reproducing the exact draw
sequence lets us start from the *identical* perturbed state as the CVPR
benchmark protocol, so converged costs are directly comparable.

Verified bit-exact against a g++/libstdc++ probe in
tests/test_rng.py::test_against_cpp_probe.
"""

from __future__ import annotations

import math

import numpy as np

_M = 2147483647  # 2^31 - 1
_A = 16807


class MinstdRand0:
    """libstdc++ std::default_random_engine = minstd_rand0."""

    def __init__(self, seed: int):
        seed = seed % _M
        if seed == 0:
            seed = 1
        self.x = seed

    def __call__(self) -> int:
        self.x = (self.x * _A) % _M
        return self.x

    min = 1
    max = _M - 1  # 2147483646


class NormalDistribution:
    """libstdc++ std::normal_distribution<double> (Marsaglia polar).

    Each fresh distribution object starts with an empty cache; the
    reference constructs a fresh one per perturbation<N>() call.
    """

    def __init__(self):
        self.saved = None

    def _canonical(self, eng: MinstdRand0) -> float:
        # std::generate_canonical<double, 53>(minstd_rand0):
        # r = max-min+1 = 2147483646, log2(r) ~ 31, k = ceil(53/31) = 2
        r = float(eng.max - eng.min + 1)
        sum_ = float(eng() - eng.min)
        tmp = r
        sum_ += float(eng() - eng.min) * tmp
        tmp *= r
        ret = sum_ / tmp
        if ret >= 1.0:
            ret = math.nextafter(1.0, 0.0)
        return ret

    def __call__(self, eng: MinstdRand0) -> float:
        if self.saved is not None:
            v = self.saved
            self.saved = None
            return v
        while True:
            x = 2.0 * self._canonical(eng) - 1.0
            y = 2.0 * self._canonical(eng) - 1.0
            r2 = x * x + y * y
            if r2 <= 1.0 and r2 != 0.0:
                break
        mult = math.sqrt(-2.0 * math.log(r2) / r2)
        self.saved = x * mult
        return y * mult


def perturbation(sigma: float, eng: MinstdRand0, n: int = 3) -> np.ndarray:
    """Reference bal_problem.cpp perturbation<T,N>: fresh distribution,
    n draws scaled by sigma."""
    dist = NormalDistribution()
    return np.array([dist(eng) * sigma for _ in range(n)], dtype=np.float64)
