"""Pallas kernels: interpret-mode parity on CPU (SURVEY.md §5.2 sanitizer)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuseg.data.class_maps import COLOR_MAP_BGR, COLOR_MAP_RGB
from tpuseg.ops.pallas_kernels import (
    argmax_colorize,
    argmax_colorize_reference,
    unpack_colors,
)


@pytest.mark.parametrize("shape", [(2, 64, 256, 10), (1, 8, 128, 10),
                                   (3, 16, 384, 4)])
def test_argmax_colorize_matches_reference(shape, rng):
    logits = jnp.asarray(rng.randn(*shape), jnp.float32)
    palette = COLOR_MAP_RGB[: shape[-1]]
    cls_ref, col_ref = argmax_colorize_reference(logits, palette)
    cls, col = argmax_colorize(logits, palette, interpret=True)
    np.testing.assert_array_equal(np.asarray(cls), np.asarray(cls_ref))
    np.testing.assert_array_equal(np.asarray(col), np.asarray(col_ref))


def test_non_128_width_falls_back(rng):
    logits = jnp.asarray(rng.randn(1, 8, 100, 10), jnp.float32)
    cls, col = argmax_colorize(logits, COLOR_MAP_RGB)
    cls_ref, col_ref = argmax_colorize_reference(logits, COLOR_MAP_RGB)
    np.testing.assert_array_equal(np.asarray(cls), np.asarray(cls_ref))
    np.testing.assert_array_equal(np.asarray(col), np.asarray(col_ref))


def test_unpack_colors_roundtrip(rng):
    classes = rng.randint(0, 10, (32, 64)).astype(np.uint8)
    logits = np.zeros((1, 32, 64, 10), np.float32)
    np.put_along_axis(logits[0], classes[..., None].astype(np.int64), 1.0,
                      axis=-1)
    _, col = argmax_colorize(jnp.asarray(logits), COLOR_MAP_BGR,
                             interpret=True)
    np.testing.assert_array_equal(
        unpack_colors(np.asarray(col[0])), COLOR_MAP_BGR[classes]
    )


def test_predictor_colorize_on_device_matches_host_path():
    """The device-colorized pipeline output (XLA argmax+palette gather)
    must equal the plain path byte-for-byte (incl. the road-cleanup
    fix-up)."""
    from tpuseg.configs import ModelConfig
    from tpuseg.infer.predictor import Predictor
    from tpuseg.infer.video import VideoPipeline

    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (60, 128, 3), np.uint8)

    plain = Predictor(ModelConfig(name="unet", base_filters=4),
                      input_hw=(32, 128), batch_size=1)
    fused = Predictor(ModelConfig(name="unet", base_filters=4),
                      input_hw=(32, 128), batch_size=1,
                      colorize_on_device=True)
    # same weights
    fused.variables = plain.variables

    out_a, det_a = VideoPipeline(plain).process_frame(frame)
    out_b, det_b = VideoPipeline(fused).process_frame(frame)
    np.testing.assert_array_equal(out_a, out_b)
    assert det_a == det_b


@pytest.mark.parametrize("shape_case", [
    (2, 32, 16, 24, 40, 32, 8),
    (1, 8, 8, 16, 96, 64, 4),
])
def test_fused_upconcat_matches_reference(shape_case, rng):
    from tpuseg.ops.pallas_kernels import (
        fused_upconcat_reference,
        fused_upsample_concat_conv,
    )

    bsz, h2, w2, cs, cx, cout, tile = shape_case
    skip = jnp.asarray(rng.randn(bsz, h2, w2, cs), jnp.float32)
    x = jnp.asarray(rng.randn(bsz, h2 // 2, w2 // 2, cx), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, cs + cx, cout) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    ref = fused_upconcat_reference(skip, x, w, b)
    out = fused_upsample_concat_conv(skip, x, w, b, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_decoder_model_matches_plain():
    """MobileNetV2UNet(use_pallas=True) == plain model at inference."""
    import jax

    from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet

    plain = MobileNetV2UNet(output_channels=10)
    fused = MobileNetV2UNet(output_channels=10, use_pallas=True)
    v = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)),
                   train=False)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 64, 3), jnp.float32)
    ref = plain.apply(v, x, train=False)
    out = fused.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_upsample2x_argmax_matches_reference():
    """Kernel 3: fused final-upsample (ac=True) + argmax == reference."""
    from tpuseg.ops.pallas_kernels import (
        upsample2x_argmax,
        upsample2x_argmax_reference,
    )

    rng = np.random.RandomState(0)
    for shape in [(2, 8, 64, 10), (1, 4, 64, 10), (2, 16, 128, 10)]:
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        ref = upsample2x_argmax_reference(x)
        got = upsample2x_argmax(x, interpret=True)
        assert got.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # non-tiling shapes take the pure-JAX fallback
    x = jnp.asarray(rng.randn(1, 5, 30, 10), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(upsample2x_argmax(x, interpret=True)),
        np.asarray(upsample2x_argmax_reference(x)),
    )


def test_model_pre_upsample_head_plus_fused_equals_full():
    """upsample_head=False + upsample2x_argmax == argmax(full model)."""
    import jax

    from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet
    from tpuseg.ops.pallas_kernels import upsample2x_argmax

    full = MobileNetV2UNet(output_channels=10)
    pre = MobileNetV2UNet(output_channels=10, upsample_head=False)
    v = full.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)),
                  train=False)
    assert jax.tree.structure(v) == jax.tree.structure(
        pre.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)),
                 train=False)
    )
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 64, 3), jnp.float32)
    want = jnp.argmax(full.apply(v, x, train=False), axis=-1)
    got = upsample2x_argmax(pre.apply(v, x, train=False), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
