"""MobileNetV2UNet — the production model.

Behavioral spec: reference src/unet.py:7-51. Encoder = MobileNetV2 feature
stages tapped at 16/24/32/64/1280 channels (1/2..1/32 resolution); decoder =
four ``up`` blocks with skip concats

    up1: cat(64, 1280) -> 256     up2: cat(32, 256) -> 128
    up3: cat(24, 128)  -> 64      up4: cat(16, 64)  -> 32

then ``outconv(32 -> classes)`` and a final x2 bilinear upsample with
**align_corners=True** (src/unet.py:30 — deliberately different from the
align_corners=False upsamples inside the decoder, src/unet.py:97). Logits are
returned at full input resolution, NHWC, float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.models.blocks import OutConv, Up
from tpuseg.models.mobilenetv2 import MobileNetV2Encoder
from tpuseg.ops.resize import upsample2x_bilinear


class MobileNetV2UNet(nn.Module):
    output_channels: int = 10
    width_mult: float = 1.0
    dtype: Any = jnp.float32
    use_pallas: bool = False  # fused decoder upsample+concat+conv kernels
    stem_s2d: bool = False    # space-to-depth stem rewrite (apply-time path)
    # Exact subpixel/d2s rewrite of each up-block's first conv
    # (tpuseg.ops.subpixel): same FLOPs at (H/2, W/2) with 4x output
    # channels — fills the MXU's 128 lanes where Cout is thin (up3/up4).
    # Default ON: measured 2289 vs 1767 fps @512x512 batch 128 (+30%,
    # bench_history.json); exact to fp32 tolerance, param tree unchanged.
    up_subpixel: bool = True
    # When False, return logits BEFORE the final x2 align_corners=True
    # upsample (at input/2 resolution) so inference can fuse that upsample
    # with the argmax (tpuseg.ops.pallas_kernels.upsample2x_argmax) and the
    # full-resolution logits never reach HBM. Training keeps the default.
    upsample_head: bool = True
    # Dtype of the final x2 upsample's contraction. True (default): fp32 —
    # the exact-parity convention (the fp32 parity gate runs through this
    # path). False: the contraction runs in the model's compute dtype
    # (bf16), halving the head's HBM traffic; the 2-tap lerp still
    # accumulates in fp32 on the MXU, only the stored operands/results are
    # bf16, so logits differ ~2^-9 relative and argmax can flip at exact
    # near-ties. Apply-time only; param tree unchanged. Returned logits are
    # float32 either way (the astype fuses into any consumer reduce).
    head_fp32: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        up = self.use_pallas
        sp = self.up_subpixel
        # named_scopes label the profiler trace (SURVEY.md §5.1) — they are
        # metadata only and change neither params nor numerics
        with jax.named_scope("encoder"):
            x1, x2, x3, x4, x5 = MobileNetV2Encoder(
                width_mult=self.width_mult,
                dtype=dt,
                stem_s2d=self.stem_s2d,
                name="backbone",
            )(x, train)
        with jax.named_scope("decoder"):
            y = Up(256, dtype=dt, use_pallas=up, subpixel=sp, name="up1")(
                x5, x4, train)
            y = Up(128, dtype=dt, use_pallas=up, subpixel=sp, name="up2")(
                y, x3, train)
            y = Up(64, dtype=dt, use_pallas=up, subpixel=sp, name="up3")(
                y, x2, train)
            y = Up(32, dtype=dt, use_pallas=up, subpixel=sp, name="up4")(
                y, x1, train)
        with jax.named_scope("head"):
            y = OutConv(self.output_channels, dtype=dt, name="outc")(y, train)
            if not self.upsample_head:
                return y.astype(jnp.float32)
            # final x2, align_corners=True (src/unet.py:30)
            if self.head_fp32:
                return upsample2x_bilinear(
                    y.astype(jnp.float32), align_corners=True
                )
            return upsample2x_bilinear(
                y, align_corners=True, compute_dtype=dt
            ).astype(jnp.float32)
