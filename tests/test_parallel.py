"""Spatial sharding: halo exchange correctness on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpuseg.core.mesh import create_mesh
from tpuseg.parallel.spatial import halo_exchange, spatial_shard_apply


@pytest.fixture(scope="module")
def spatial_mesh():
    return create_mesh(data=1, spatial=8)


@pytest.fixture(scope="module")
def spatial_mesh2():
    return create_mesh(data=4, spatial=2)


def test_halo_exchange_rows(spatial_mesh):
    """Each slab receives exactly its neighbors' boundary rows."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    h_total, halo = 64, 2
    x = jnp.arange(h_total, dtype=jnp.float32).reshape(1, h_total, 1, 1)
    x = jnp.broadcast_to(x, (1, h_total, 4, 1))

    @jax.shard_map(
        mesh=spatial_mesh, in_specs=P(None, "spatial"),
        out_specs=P(None, "spatial"),
    )
    def padded(slab):
        return halo_exchange(slab, halo, "spatial")[:, : slab.shape[1] + 2 * halo]

    out = np.asarray(
        padded(jax.device_put(x, NamedSharding(spatial_mesh, P(None, "spatial"))))
    )
    # 8 slabs of 8 rows each -> padded slabs of 12 rows, concatenated
    out = out.reshape(8, 12, 4, 1)[:, :, 0, 0]
    for d in range(8):
        lo = d * 8
        expect_top = [0, 0] if d == 0 else [lo - 2, lo - 1]
        expect_bot = [0, 0] if d == 7 else [lo + 8, lo + 9]
        np.testing.assert_array_equal(out[d, :2], expect_top)
        np.testing.assert_array_equal(out[d, 2:10], np.arange(lo, lo + 8))
        np.testing.assert_array_equal(out[d, 10:], expect_bot)


def test_conv_stack_exact_with_sufficient_halo(spatial_mesh):
    """3x 3x3-conv stack (half-RF = 3), halo 4: the sharded output equals
    crop(fn(zero-padded input)) everywhere, and equals the plain unsharded
    forward on all rows beyond the receptive field of the global border
    (the documented exactness contract)."""
    rng = np.random.RandomState(0)
    kernels = [jnp.asarray(rng.randn(3, 3, 4, 4) * 0.2, jnp.float32)
               for _ in range(3)]

    def stack(x):
        for k in kernels:
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.relu(x)
        return x

    halo, rf = 4, 3
    x = jnp.asarray(rng.rand(2, 64, 32, 4), jnp.float32)
    out = np.asarray(spatial_shard_apply(stack, spatial_mesh, halo=halo)(x))

    padded = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    ref_padded = np.asarray(stack(padded))[:, halo:-halo]
    np.testing.assert_allclose(out, ref_padded, rtol=1e-5, atol=1e-6)

    ref_plain = np.asarray(stack(x))
    np.testing.assert_allclose(out[:, rf:-rf], ref_plain[:, rf:-rf],
                               rtol=1e-5, atol=1e-6)


def test_insufficient_halo_detected(spatial_mesh):
    """halo < receptive field must actually change boundary outputs —
    guards against the test above passing vacuously."""
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.randn(9, 9, 2, 2) * 0.2, jnp.float32)

    def wide(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    x = jnp.asarray(rng.rand(1, 64, 32, 2), jnp.float32)
    ref = wide(x)
    out = spatial_shard_apply(wide, spatial_mesh, halo=1)(x)
    assert not np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_unet_spatial_vs_unsharded(spatial_mesh2):
    """Full UNet H-sharded over 2 devices with a receptive-field halo."""
    from tpuseg.models.unet import UNet

    m = UNet(output_channels=10, base_filters=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    def fwd(x):
        return m.apply(v, x, train=False)

    rng = np.random.RandomState(2)
    halo = 96
    x = jnp.asarray(rng.rand(1, 256, 64, 3), jnp.float32)
    out = np.asarray(spatial_shard_apply(fwd, spatial_mesh2, halo=halo)(x))
    padded = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    ref = np.asarray(fwd(padded))[:, halo:-halo]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # interior rows also match the plain forward
    ref_plain = np.asarray(fwd(x))
    np.testing.assert_allclose(out[:, 112:-112], ref_plain[:, 112:-112],
                               rtol=1e-4, atol=1e-5)
