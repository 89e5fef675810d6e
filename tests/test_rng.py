"""Perturbation-RNG bit-exactness vs libstdc++.

Expected values were produced by a g++/libstdc++ probe:

    std::default_random_engine eng(38401);
    for 6 calls: { std::normal_distribution<double> normal;
                   3x printf("%.17g", normal(eng)); }
    std::default_random_engine eng2(12345);
    std::normal_distribution<double> n2; 4x printf(normal(eng2));

matching the reference's perturbation<double,3> call pattern
(bal_problem.cpp:90-115) with the benchmark seed 38401.
"""

from rootba_tpu.bal.rng import MinstdRand0, NormalDistribution

EXPECTED_38401 = [
    0.44993946666242152, -1.1543347413885821, -0.30509108774949084,
    -0.21722963473309309, 0.046613535294214935, 1.2017384449954209,
    0.78911426041984245, 1.0651043240475764, -1.0650161927063704,
    -1.1959613104723599, -0.28718871435088233, 0.24046549664885983,
    -0.21388781542600893, 0.69105943285775551, 0.21233614061185513,
    0.57491993153831877, -1.2018319955204062, -1.3550006091599212,
]

EXPECTED_12345 = [
    0.11176354368256498, -0.59065862504305633,
    -0.62564101996406651, 0.58237074530768129,
]


def test_against_cpp_probe():
    eng = MinstdRand0(38401)
    vals = []
    for _ in range(6):
        d = NormalDistribution()
        vals.extend(d(eng) for _ in range(3))
    assert vals == EXPECTED_38401

    eng2 = MinstdRand0(12345)
    d2 = NormalDistribution()
    vals2 = [d2(eng2) for _ in range(4)]
    assert vals2 == EXPECTED_12345


def test_minstd_sequence():
    # minstd_rand0: x_{n+1} = 16807 x_n mod (2^31-1); x0=1 gives the
    # classic 16807, 282475249, ...
    eng = MinstdRand0(1)
    assert eng() == 16807
    assert eng() == 282475249
