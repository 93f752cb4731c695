"""Model shape/dtype contracts at the canonical input size (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.configs import ModelConfig
from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet
from tpuseg.models.mobilenetv2 import MobileNetV2Encoder
from tpuseg.models.registry import build_model
from tpuseg.models.unet import LightUNet, UNet


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_mobilenetv2_unet_canonical_shape():
    """Input 128x256 (reference main.py:23) -> logits [B,128,256,10] float32."""
    m = MobileNetV2UNet(output_channels=10)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)), train=False)
    out = m.apply(v, jnp.zeros((2, 128, 256, 3)), train=False)
    assert out.shape == (2, 128, 256, 10)
    assert out.dtype == jnp.float32


def test_encoder_stage_shapes():
    """The 5 skip taps at 16/24/32/64/1280 ch, 1/2..1/32 res (src/unet.py:15-19)."""
    enc = MobileNetV2Encoder()
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)), train=False)
    taps = enc.apply(v, jnp.zeros((1, 128, 256, 3)), train=False)
    shapes = [t.shape for t in taps]
    assert shapes == [
        (1, 64, 128, 16),
        (1, 32, 64, 24),
        (1, 16, 32, 32),
        (1, 8, 16, 64),
        (1, 4, 8, 1280),
    ]


def test_mobilenetv2_unet_param_count_matches_torch():
    torch = pytest.importorskip("torch")
    from tests.torch_ref import TorchMobileNetV2UNet

    tm = TorchMobileNetV2UNet(output_channels=10)
    # count unique parameters (the reference registers encoder slices twice)
    seen, n_torch = set(), 0
    for p in tm.parameters():
        if id(p) not in seen:
            seen.add(id(p))
            n_torch += p.numel()
    m = MobileNetV2UNet(output_channels=10)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)), train=False)
    assert _n_params(v["params"]) == n_torch


def test_unet_output_at_input_resolution():
    m = UNet(output_channels=10, base_filters=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 10)


def test_light_unet_single_channel():
    m = LightUNet(base_filters=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    out = m.apply(v, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 32, 32, 1)


def test_bf16_compute_fp32_logits():
    m = MobileNetV2UNet(output_channels=10, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)), train=False)
    out = m.apply(v, jnp.zeros((1, 64, 128, 3)), train=False)
    assert out.dtype == jnp.float32  # logits always fp32
    # params stay fp32 regardless of compute dtype
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(v["params"]))


def test_registry():
    for name in ("mobilenetv2_unet", "unet", "light_unet"):
        build_model(ModelConfig(name=name, base_filters=8))
    with pytest.raises(KeyError):
        build_model(ModelConfig(name="nope"))


def test_registry_default_widths():
    """base_filters=0 (the config default) = each model's reference width:
    UNet 64 (src/unet.py:125), LightUNet 32 (src/unet.py:149)."""
    assert build_model(ModelConfig(name="unet")).base_filters == 64
    assert build_model(ModelConfig(name="light_unet")).base_filters == 32
    assert build_model(ModelConfig(name="light_unet", base_filters=8)).base_filters == 8


def test_stem_space_to_depth_equivalence():
    """stem_s2d is an exact apply-time rewrite of the 3x3 s2 stem."""
    from tpuseg.models.mobilenetv2 import MobileNetV2Encoder

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 128, 3), jnp.float32)
    enc_a = MobileNetV2Encoder(stem_s2d=False)
    enc_b = MobileNetV2Encoder(stem_s2d=True)
    v = enc_a.init(jax.random.PRNGKey(0), x, train=False)
    taps_a = enc_a.apply(v, x, train=False)
    taps_b = enc_b.apply(v, x, train=False)
    for a, b in zip(taps_a, taps_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_up_subpixel_toggle_param_tree_invariant_and_exact():
    """--model.up_subpixel is an exact apply-time rewrite: same param tree,
    same outputs (fp32), reachable through ModelConfig."""
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    m_off = build_model(
        ModelConfig(name="mobilenetv2_unet", up_subpixel=False)
    )
    m_on = build_model(ModelConfig(name="mobilenetv2_unet", up_subpixel=True))
    v = m_off.init(jax.random.PRNGKey(0), x, train=False)
    v_on = m_on.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(v_on)
    out_off = m_off.apply(v, x, train=False)
    out_on = m_on.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_off), np.asarray(out_on), rtol=1e-4, atol=1e-4
    )
    # train mode is also exact (subpixel path allowed under grad/BN-update)
    out_tr_off, st1 = m_off.apply(v, x, train=True, mutable=["batch_stats"])
    out_tr_on, st2 = m_on.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_tr_off), np.asarray(out_tr_on), rtol=1e-4, atol=1e-4
    )


def test_stem_s2d_config_toggle_param_tree_invariant():
    """--model.stem_s2d toggles the apply-time path only: same param tree,
    same outputs, reachable through ModelConfig (VERDICT r1 item 7)."""
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    m_off = build_model(ModelConfig(name="mobilenetv2_unet", stem_s2d=False))
    m_on = build_model(ModelConfig(name="mobilenetv2_unet", stem_s2d=True))
    v_off = m_off.init(jax.random.PRNGKey(0), x, train=False)
    v_on = m_on.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(v_off) == jax.tree.structure(v_on)
    out_off = m_off.apply(v_off, x, train=False)
    out_on = m_on.apply(v_off, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_off), np.asarray(out_on), rtol=1e-5, atol=1e-5
    )


def test_bf16_head_close_and_same_tree():
    """head_fp32=False (the +6.8%-fps serving knob) is apply-time only:
    identical param tree, fp32 logits, and values within bf16 rounding of
    the exact fp32-head path."""
    m_exact = MobileNetV2UNet(output_channels=10, dtype=jnp.bfloat16)
    m_fast = MobileNetV2UNet(
        output_channels=10, dtype=jnp.bfloat16, head_fp32=False
    )
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 64, 3), jnp.float32)
    v = m_exact.init(jax.random.PRNGKey(0), x[:1], train=False)
    v2 = m_fast.init(jax.random.PRNGKey(0), x[:1], train=False)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    a = m_exact.apply(v, x, train=False)
    b = m_fast.apply(v, x, train=False)
    assert b.dtype == jnp.float32
    # bf16 storage of the 2-tap lerp: ~2^-8 relative worst case
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) < 0.02 * max(scale, 1.0)
    # and the vast majority of argmax classes agree even at random init
    agree = float((jnp.argmax(a, -1) == jnp.argmax(b, -1)).mean())
    assert agree > 0.97


def test_validate_input_size_contract():
    """Every entry point validates the family's H/W divisibility contract
    up front (x32 MobileNetV2 families, x8 UNet/LightUNet) instead of
    failing with a mid-trace concat shape error."""
    from tpuseg.models.registry import size_divisor, validate_input_size

    assert size_divisor("mobilenetv2_unet") == 32
    assert size_divisor("mobilenetv2_fpn") == 32
    assert size_divisor("mobilenetv2_deeplab") == 32
    assert size_divisor("unet") == 8
    assert size_divisor(UNet(output_channels=3)) == 8
    assert size_divisor(MobileNetV2UNet(output_channels=10)) == 32

    validate_input_size("mobilenetv2_unet", 128, 256)  # reference size: ok
    validate_input_size("unet", 24, 64)
    with pytest.raises(ValueError, match="multiples of 32"):
        validate_input_size("mobilenetv2_deeplab", 48, 64)
    with pytest.raises(ValueError, match="multiples of 8"):
        validate_input_size(LightUNet(), 12, 16)
    with pytest.raises(KeyError):
        size_divisor("not_a_model")

    # the Predictor surfaces the same clean error
    from tpuseg.configs import load_config
    from tpuseg.infer.predictor import Predictor

    cfg = load_config(
        ["--model.name=mobilenetv2_fpn", "--data.height=40",
         "--data.width=64"]
    )
    with pytest.raises(ValueError, match="multiples of 32"):
        Predictor(
            model_cfg=cfg.model, input_hw=(40, 64), batch_size=1
        )
