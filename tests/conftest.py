"""Test configuration: force CPU with an 8-device virtual mesh and
enable x64 so double-precision reference semantics can be tested.

(The reference's typed test suites run every numeric test in float and
double, src/rootba/testing/test_types.hpp:45-58; here dtype is a fixture
parameter instead.)
"""

import os

# NOTE: this machine globally exports JAX_PLATFORMS=axon (TPU tunnel),
# so set the platform through jax.config, not the environment.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rootba_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(params=["float32", "float64"])
def dtype(request):
    return np.dtype(request.param)


@pytest.fixture(scope="session")
def synthetic_problem():
    """Session-scoped small synthetic BAL problem (preprocessed)."""
    from rootba_tpu.bal.synthetic import generate_synthetic_bal

    problem = generate_synthetic_bal(num_cams=12, num_lms=200,
                                     mean_obs_per_lm=4.5, seed=3)
    problem.normalize(100.0)
    problem.perturb(0.0, 0.01, 0.01, 38401)
    problem.filter_obs(0.1)
    return problem
