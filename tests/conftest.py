"""Test harness: 8 virtual CPU devices so sharding/mesh tests run anywhere.

The container's sitecustomize pins JAX_PLATFORMS=axon (one real TPU chip);
tests must run on a virtual multi-device CPU mesh instead (SURVEY.md §4.4),
so we force the platform BEFORE any jax backend initialization. Numeric
sanitizers (NaN debugging, strict rank promotion) are on for every test
(SURVEY.md §5.2).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)
jax.config.update("jax_numpy_rank_promotion", "raise")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from tpuseg.core.mesh import create_mesh

    assert jax.device_count() == 8, "virtual CPU mesh missing"
    return create_mesh()


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
