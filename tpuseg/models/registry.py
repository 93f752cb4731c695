"""Model registry: name -> constructor, driven by ModelConfig."""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from tpuseg.configs import ModelConfig
from tpuseg.models.deeplab import MobileNetV2DeepLab
from tpuseg.models.fpn import MobileNetV2FPN
from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet
from tpuseg.models.unet import LightUNet, UNet


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


MODEL_REGISTRY: Dict[str, Callable] = {
    "mobilenetv2_unet": lambda cfg: MobileNetV2UNet(
        output_channels=cfg.num_classes,
        width_mult=cfg.width_mult,
        dtype=_dtype(cfg),
        use_pallas=cfg.use_pallas,
        stem_s2d=cfg.stem_s2d,
        up_subpixel=cfg.up_subpixel,
        head_fp32=cfg.head_fp32,
    ),
    # second decoder family (semantic FPN; no reference counterpart) —
    # constant-width pyramid, MXU-lane-aligned; base_filters sets the
    # pyramid width (default 128 = one lane tile)
    "mobilenetv2_fpn": lambda cfg: MobileNetV2FPN(
        output_channels=cfg.num_classes,
        width_mult=cfg.width_mult,
        fpn_channels=cfg.base_filters or 128,
        dtype=_dtype(cfg),
        stem_s2d=cfg.stem_s2d,
    ),
    # third decoder family (DeepLabV3+; no reference counterpart) — ASPP
    # context at 1/32 + one low-level skip at 1/4; base_filters sets the
    # ASPP/decoder width. Default 128: measured faster AND better than the
    # paper's 256 on this stack (3017 vs 1778 fps @512x512, 0.9444 vs
    # 0.9386 protocol mIoU — DESIGN §31)
    "mobilenetv2_deeplab": lambda cfg: MobileNetV2DeepLab(
        output_channels=cfg.num_classes,
        width_mult=cfg.width_mult,
        aspp_channels=cfg.base_filters or 128,
        dtype=_dtype(cfg),
        stem_s2d=cfg.stem_s2d,
    ),
    "unet": lambda cfg: UNet(
        output_channels=cfg.num_classes,
        base_filters=cfg.base_filters or 64,
        dtype=_dtype(cfg),
    ),
    "light_unet": lambda cfg: LightUNet(
        base_filters=cfg.base_filters or 32, dtype=_dtype(cfg)
    ),
}


def build_model(cfg: ModelConfig):
    if cfg.name not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model {cfg.name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[cfg.name](cfg)


def size_divisor(model) -> int:
    """The input-size contract of ``model`` (an instance or registry name):
    H and W must be multiples of this. MobileNetV2 encoders downsample x32
    and the decoders' exact 2x upsamples must land back on every skip grid;
    UNet/LightUNet pool x8 the same way (tpuseg/models/deeplab.py docstring,
    'same contract as the other MobileNetV2 families')."""
    if isinstance(model, str):
        name = model
        if name not in MODEL_REGISTRY:
            raise KeyError(
                f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
            )
        return 8 if name in ("unet", "light_unet") else 32
    if isinstance(model, (UNet, LightUNet)):
        return 8
    if isinstance(model, (MobileNetV2UNet, MobileNetV2FPN, MobileNetV2DeepLab)):
        return 32
    return 1


def validate_input_size(model, height: int, width: int) -> None:
    """Raise a clear ValueError (instead of a mid-trace concat shape error)
    when ``height``/``width`` violate the model family's divisibility
    contract. Call before tracing/initializing at a user-provided size."""
    down = size_divisor(model)
    if height % down or width % down:
        name = model if isinstance(model, str) else type(model).__name__
        raise ValueError(
            f"{name} requires input height and width to be multiples of "
            f"{down}; got {height}x{width} (the encoder downsamples x{down} "
            f"and the decoder's exact 2x upsamples must land back on every "
            f"skip-connection grid)"
        )
