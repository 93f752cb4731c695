"""tpuseg.core.device_io: packed tree transfer + host-side init.

These helpers exist for the remote-TPU tunnel (one RPC per leaf / per
eager op — docs/DESIGN.md §19, bench.py); on the CPU test platform they
must be exact no-ops semantically: same values, dtypes, shapes, shardings
as the plain jax.device_put / eager init they replace.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.core.device_io import (
    device_put_packed,
    ensure_cpu_backend,
    host_cpu_device,
    init_on_host,
)


def _tree():
    rng = np.random.RandomState(0)
    return {
        "a": rng.rand(3, 4).astype(np.float32),
        "nested": {
            "b": rng.rand(7).astype(np.float32),
            "c": rng.randint(0, 10, (2, 2), np.int32),
        },
        "scalar": np.float32(2.5),
        "empty": {},
    }


def test_packed_put_matches_plain_device_put():
    tree = _tree()
    packed = device_put_packed(tree)
    plain = jax.device_put(tree)
    jax.tree.map(
        lambda p, q: np.testing.assert_array_equal(np.asarray(p), np.asarray(q)),
        packed,
        plain,
    )
    for leaf in jax.tree.leaves(packed):
        assert isinstance(leaf, jax.Array)


def test_packed_put_preserves_dtypes_and_shapes():
    packed = device_put_packed(_tree())
    assert packed["a"].shape == (3, 4) and packed["a"].dtype == jnp.float32
    assert packed["nested"]["c"].dtype == jnp.int32
    assert packed["scalar"].shape == ()


def test_packed_put_with_sharding(mesh8):
    from tpuseg.core.mesh import replicated_sharding

    sharding = replicated_sharding(mesh8)
    packed = device_put_packed(_tree(), sharding=sharding)
    assert packed["a"].sharding == sharding
    np.testing.assert_array_equal(np.asarray(packed["a"]), _tree()["a"])
    # idempotent: re-placing an already-placed tree is a no-op (no fetch)
    again = device_put_packed(packed, sharding=sharding)
    assert again["a"] is packed["a"]


def test_packed_put_already_on_device_skips():
    packed = device_put_packed(_tree())
    again = device_put_packed(packed)
    assert again["a"] is packed["a"]


def test_init_on_host_matches_eager_init():
    ensure_cpu_backend()
    assert host_cpu_device() is not None  # cpu platform in tests

    def init(key):
        k1, k2 = jax.random.split(key)
        return {
            "w": jax.random.normal(k1, (4, 3)),
            "b": jnp.zeros((3,)),
            "k2sum": jax.random.uniform(k2, (2,)),
        }

    hosted = init_on_host(init, jax.random.PRNGKey(7))
    eager = jax.tree.map(np.asarray, init(jax.random.PRNGKey(7)))
    jax.tree.map(np.testing.assert_array_equal, hosted, eager)
    for leaf in jax.tree.leaves(hosted):
        assert isinstance(leaf, np.ndarray)  # host-side, uncommitted
