"""MobileNetV2FPN — a second decoder family: semantic FPN.

No reference counterpart (the reference ships exactly one production
decoder, the UNet-style skip-concat of src/unet.py:22-30); this is a
capability extension in the SURVEY §2.5 spirit. Semantic FPN (the
Panoptic-FPN segmentation head) trades the UNet's channel-heavy concats for
a constant-width pyramid: lateral 1x1s project every encoder stage to one
width, a top-down nearest-2x + add pass fuses them, and a per-level head
resizes everything to 1/4 resolution and sums before a 1x1 classifier.

TPU-first properties:
- constant ``fpn_channels`` (default 128 = one MXU lane tile) everywhere the
  UNet decoder had thin awkward widths (152/80/32 concats) — every conv
  lands on full 128-lane tiles;
- adds instead of concats: no wide intermediate tensors in HBM;
- built entirely from ConvBNAct, so the whole apply-time machinery —
  QAT (--train.qat), full-int8 serving, BN folding, bf16 policy — works on
  this family with zero extra code (tests/test_fpn.py pins that).

All resamples are align_corners=False (no reference parity to honor here);
logits return at input resolution, float32, NHWC.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.models.blocks import ConvBNAct
from tpuseg.models.mobilenetv2 import MobileNetV2Encoder
# Every upsample in this family is a power of 2, so it rides the cascaded
# exact-phase 2x lerps (the gather formulation measured 696.2 fps -> this
# measured 2531.6 @512x512 d=128, 3.6x — past the flagship's 2411;
# DESIGN §29). Shared with the DeepLab family.
from tpuseg.ops.resize import up_pow2_bilinear as _up_pow2_bilinear


def _up2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x nearest upsample of NHWC features (broadcast+reshape under
    XLA — no gather). resize_nearest (ops.resize) is the class-map/packed-
    overlay variant; its channel heuristic does not apply to feature maps."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class MobileNetV2FPN(nn.Module):
    output_channels: int = 10
    width_mult: float = 1.0
    fpn_channels: int = 128
    dtype: Any = jnp.float32
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        d = self.fpn_channels
        with jax.named_scope("encoder"):
            _, c2, c3, c4, c5 = MobileNetV2Encoder(
                width_mult=self.width_mult,
                dtype=dt,
                stem_s2d=self.stem_s2d,
                name="backbone",
            )(x, train)  # 1/4, 1/8, 1/16, 1/32

        def lat(name):
            return ConvBNAct(
                d, kernel=(1, 1), padding="VALID", act=None, dtype=dt,
                name=name,
            )

        def smooth(name):
            return ConvBNAct(d, dtype=dt, name=name)  # 3x3 BN ReLU

        with jax.named_scope("fpn_topdown"):
            p5 = lat("lat5")(c5, train)
            p4 = lat("lat4")(c4, train) + _up2x_nearest(p5)
            p3 = lat("lat3")(c3, train) + _up2x_nearest(p4)
            p2 = lat("lat2")(c2, train) + _up2x_nearest(p3)
            p2 = smooth("smooth2")(p2, train)
            p3 = smooth("smooth3")(p3, train)
            p4 = smooth("smooth4")(p4, train)
            p5 = smooth("smooth5")(p5, train)

        with jax.named_scope("semantic_head"):
            y = None
            for steps, (name, p) in enumerate(
                (("head2", p2), ("head3", p3), ("head4", p4), ("head5", p5))
            ):
                h = ConvBNAct(d, dtype=dt, name=name)(p, train)
                h = _up_pow2_bilinear(h, steps)  # to 1/4 resolution
                y = h if y is None else y + h
            logits = nn.Conv(
                self.output_channels, (1, 1), padding="VALID", dtype=dt,
                param_dtype=jnp.float32, name="classifier",
            )(y)
            logits = _up_pow2_bilinear(logits.astype(jnp.float32), 2)
        return logits.astype(jnp.float32)
