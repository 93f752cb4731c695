"""Test harness: 8 virtual CPU devices so sharding/mesh tests run anywhere.

The container's sitecustomize pins JAX_PLATFORMS=axon (one real TPU chip);
tests must run on a virtual multi-device CPU mesh instead (SURVEY.md §4.4),
so we force the platform BEFORE any jax backend initialization. Numeric
sanitizers (NaN debugging, strict rank promotion) are on for every test
(SURVEY.md §5.2).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU in-process collectives ABORT the process when participants
# miss a rendezvous by 40 s — on this 1-core host, 8 device threads
# time-slicing through a collective permute can exceed that (observed
# in dryrun_multichip; __graft_entry__.py has the full story). An
# explicit user/env setting wins (flags are last-wins, so don't append
# a duplicate over it).
if "collective_call_warn_stuck_timeout" not in _flags:
    _flags += " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
if "collective_call_terminate_timeout" not in _flags:
    _flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = _flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)
jax.config.update("jax_numpy_rank_promotion", "raise")

# Persistent XLA compile cache (same directory bench.py/__graft_entry__ use;
# entries are keyed by platform+config so CPU test programs and TPU bench
# programs never collide). XLA:CPU compilation dominates the suite's wall
# clock on this 1-core host; a warm cache cuts re-runs several-fold.
# TPUSEG_TEST_NO_CACHE=1 opts out (e.g. to measure cold-compile behavior).
if os.environ.get("TPUSEG_TEST_NO_CACHE", "0") != "1":
    # the safe path: probes/stamps the cache for this host's CPU features
    # before trusting its AOT entries (tpuseg.core.platform, VERDICT r2)
    from tpuseg.core.platform import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                     ".xla_cache")
    )

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
