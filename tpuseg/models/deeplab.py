"""MobileNetV2DeepLab — the third decoder family: DeepLabV3+ (ASPP).

No reference counterpart (the reference ships one production decoder, the
UNet skip-concat of src/unet.py:22-30); like the semantic FPN this is a
capability extension in the SURVEY §2.5 spirit. DeepLabV3+ reads context
with an Atrous Spatial Pyramid Pooling block on the deepest encoder stage
(parallel dilated 3x3s + an image-level pooling branch), then refines
boundaries with ONE low-level skip at 1/4 resolution — between the UNet
(four skips, sharpest) and the FPN (adds-only, fastest) in the
speed/quality space.

TPU-first properties:
- ASPP runs at 1/32 resolution (16x16 for a 512 input): the concat-heavy
  part of the architecture lives on the tiniest tensors, so its HBM cost is
  noise; the dilated 3x3s are ordinary MXU convs (XLA rhs_dilation).
- Atrous rates default to (2, 4, 6) — the paper's (6, 12, 18) is calibrated
  for output-stride 16 at a ~33px grid; at our OS=32 grids (16x16 @512,
  8x4 @256x128) those taps would land almost entirely in padding. The same
  caveat recurses one size down: at 256x128 the c5 grid is 8x4, so the
  rate-4/6 branches themselves degrade toward (BN'd, ReLU'd) 1x1s — they
  still carry capacity (the measured 0.9444 protocol mIoU INCLUDES this
  regime) but their context radius is clipped; tune ``aspp_rates`` to the
  deployment grid for maximum effect.
- All upsamples are powers of 2 and ride the exact-phase cascaded 2x lerps
  (ops.resize.upsample2x_bilinear) — the gather-free formulation the
  decoder postmortem proved out (DESIGN §9, §29).
- The image-pooling branch is a global mean + 1x1 conv + broadcast: no
  resize, no gather.
- Built entirely from ConvBNAct, so QAT (--train.qat), full-int8 serving,
  BN folding, and the bf16 policy work on this family with zero extra code
  (tests/test_deeplab.py pins that); dilation is threaded through the int8
  and QAT conv paths so the deployed graph keeps the atrous geometry.

All resamples are align_corners=False (no reference parity to honor);
logits return at input resolution, float32, NHWC. Input H, W must be
multiples of 32 (same contract as the other MobileNetV2 families).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.models.blocks import ConvBNAct
from tpuseg.models.mobilenetv2 import MobileNetV2Encoder
from tpuseg.ops.resize import up_pow2_bilinear as _up_pow2_bilinear


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling: 1x1 + dilated 3x3s + image pooling,
    concatenated and projected back to ``features`` with a 1x1."""

    features: int
    rates: Tuple[int, ...] = (2, 4, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.features
        branches = [
            ConvBNAct(
                d, kernel=(1, 1), padding="VALID", dtype=self.dtype,
                name="aspp_conv1x1",
            )(x, train)
        ]
        for r in self.rates:
            branches.append(
                ConvBNAct(
                    d,
                    padding=((r, r), (r, r)),
                    dilation=(r, r),
                    dtype=self.dtype,
                    name=f"aspp_rate{r}",
                )(x, train)
            )
        # image-level pooling: global mean -> 1x1 conv/BN/ReLU -> broadcast.
        # Mean in >=fp32 (bf16 activations would lose mantissa over H*W).
        pool_dt = jnp.promote_types(jnp.float32, x.dtype)
        pooled = jnp.mean(
            x.astype(pool_dt), axis=(1, 2), keepdims=True
        ).astype(self.dtype)
        pooled = ConvBNAct(
            d, kernel=(1, 1), padding="VALID", dtype=self.dtype,
            name="aspp_pool",
        )(pooled, train)
        branches.append(
            jnp.broadcast_to(pooled, pooled.shape[:1] + x.shape[1:3] + (d,))
        )
        y = jnp.concatenate(branches, axis=-1)
        return ConvBNAct(
            d, kernel=(1, 1), padding="VALID", dtype=self.dtype,
            name="project",
        )(y, train)


class MobileNetV2DeepLab(nn.Module):
    output_channels: int = 10
    width_mult: float = 1.0
    aspp_channels: int = 256
    low_level_channels: int = 64  # paper uses 48; 64 keeps MXU lanes fuller
    aspp_rates: Tuple[int, ...] = (2, 4, 6)
    dtype: Any = jnp.float32
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        d = self.aspp_channels
        with jax.named_scope("encoder"):
            _, c2, _, _, c5 = MobileNetV2Encoder(
                width_mult=self.width_mult,
                dtype=dt,
                stem_s2d=self.stem_s2d,
                name="backbone",
            )(x, train)  # c2: 1/4, c5: 1/32

        with jax.named_scope("aspp"):
            y = ASPP(d, rates=self.aspp_rates, dtype=dt, name="aspp")(
                c5, train
            )

        with jax.named_scope("decoder"):
            y = _up_pow2_bilinear(y, 3)  # 1/32 -> 1/4
            low = ConvBNAct(
                self.low_level_channels, kernel=(1, 1), padding="VALID",
                dtype=dt, name="low_project",
            )(c2, train)
            y = jnp.concatenate([low, y], axis=-1)
            y = ConvBNAct(d, dtype=dt, name="refine1")(y, train)
            y = ConvBNAct(d, dtype=dt, name="refine2")(y, train)
            logits = nn.Conv(
                self.output_channels, (1, 1), padding="VALID", dtype=dt,
                param_dtype=jnp.float32, name="classifier",
            )(y)
            logits = _up_pow2_bilinear(logits.astype(jnp.float32), 2)
        return logits.astype(jnp.float32)
