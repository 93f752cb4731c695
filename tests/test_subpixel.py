"""Subpixel conv3x3(up2x(x)) rewrite: exactness vs the literal path.

The composite-kernel formulation (tpuseg/ops/subpixel.py) must match
conv3x3(pad=1)(upsample2x_bilinear(x, align_corners=False)) everywhere —
including the border rows/cols where the conv's zero padding over the
upsampled tensor and the bilinear edge clamp interact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from tpuseg.ops.resize import upsample2x_bilinear
from tpuseg.ops.subpixel import (
    conv3x3_up2x,
    up_concat_conv_subpixel,
)


def _reference(x, k):
    up = upsample2x_bilinear(x, align_corners=False)
    return lax.conv_general_dilated(
        up.astype(jnp.float32),
        k.astype(jnp.float32),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "shape,cout",
    [
        ((2, 8, 12, 5), 7),
        ((1, 2, 2, 3), 4),   # degenerate: borders are the whole image
        ((1, 5, 3, 2), 6),   # odd sizes
        ((3, 16, 16, 8), 8),
    ],
)
def test_conv3x3_up2x_exact(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, shape[-1], cout) * 0.2, jnp.float32)
    got = conv3x3_up2x(x, k)
    want = _reference(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_up_concat_conv_subpixel_exact():
    rng = np.random.RandomState(1)
    skip = jnp.asarray(rng.randn(2, 16, 24, 6), jnp.float32)
    x = jnp.asarray(rng.randn(2, 8, 12, 10), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 16, 12) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(12), jnp.float32)

    got = up_concat_conv_subpixel(skip, x, k, b)

    cat = jnp.concatenate(
        [skip, upsample2x_bilinear(x, align_corners=False)], axis=-1
    )
    want = lax.conv_general_dilated(
        cat, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.reshape(1, 1, 1, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_subpixel_bf16_train_grad():
    """bf16 training through the subpixel path: grads compute and are
    finite (regression: conv preferred_element_type upcast has a
    mixed-dtype transpose that failed under value_and_grad)."""
    from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet
    from tpuseg.train.train_step import create_train_state, make_train_step

    m = MobileNetV2UNet(output_channels=10, dtype=jnp.bfloat16,
                        up_subpixel=True)
    st = create_train_state(m, jax.random.PRNGKey(0), (1, 32, 64, 3))
    step = make_train_step(donate=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 64, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, (2, 32, 64)), jnp.int32)
    st2, metrics = step(st, x, y)
    assert np.isfinite(float(metrics["loss"]))


def test_subpixel_bf16_close_to_fp32():
    """bf16 fast path stays within bf16 tolerance of the fp32 result."""
    rng = np.random.RandomState(2)
    x32 = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 4, 8) * 0.2, jnp.float32)
    y32 = conv3x3_up2x(x32, k)
    y16 = conv3x3_up2x(x32.astype(jnp.bfloat16), k)
    assert y16.dtype == jnp.float32  # fp32 accumulators
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=0.05, atol=0.05)
