"""MobileNetV2 encoder (torchvision-compatible graph) as a Flax module.

The reference slices torchvision's ``mobilenet_v2().features`` into five
stages by index (src/unet.py:15-19):

    features[:2]    -> 16 ch   @ 1/2      (stem s2 + t1 block)
    features[2:4]   -> 24 ch   @ 1/4      (two t6 blocks, first s2)
    features[4:7]   -> 32 ch   @ 1/8
    features[7:11]  -> 64 ch   @ 1/16
    features[11:19] -> 1280 ch @ 1/32     (96x3, 160x3 s2, 320, 1x1 conv)

This module rebuilds that exact layer graph from the MobileNetV2 paper
settings so torchvision-pretrained weights can be imported 1:1
(tpuseg.core.torch_import maps ``features.N...`` keys onto it):

    (t, c, n, s) = (1,16,1,1) (6,24,2,2) (6,32,3,2) (6,64,4,2)
                   (6,96,3,1) (6,160,3,2) (6,320,1,1), then Conv1x1 -> 1280.

TPU-first choices: NHWC layout, depthwise convs via feature_group_count
(XLA lowers them to efficient TPU depthwise convs), ReLU6 fused into conv
epilogues, optional bf16 compute. All convs bias-free + BatchNorm, exactly
like torchvision (eps=1e-5).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.blocks import ConvBNAct

# (expand_ratio t, out_channels c, repeats n, first_stride s)
INVERTED_RESIDUAL_SETTINGS: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# feature indices after which the UNet taps skip connections (src/unet.py:15-19)
STAGE_TAPS = (1, 3, 6, 10, 18)


def make_divisible(v: float, divisor: int = 8) -> int:
    """Channel rounding used by MobileNet family (keeps channels % 8 == 0)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class InvertedResidual(nn.Module):
    """expand 1x1 -> depthwise 3x3 -> project 1x1 (+residual when s=1, cin=cout)."""

    features: int
    stride: int = 1
    expand_ratio: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        use_res = self.stride == 1 and cin == self.features
        y = x
        if self.expand_ratio != 1:
            y = ConvBNAct(
                hidden,
                kernel=(1, 1),
                padding="VALID",
                use_bias=False,
                act=relu6,
                dtype=self.dtype,
                name="expand",
            )(y, train)
        y = ConvBNAct(
            hidden,
            kernel=(3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            groups=hidden,
            use_bias=False,
            act=relu6,
            dtype=self.dtype,
            name="depthwise",
        )(y, train)
        y = ConvBNAct(
            self.features,
            kernel=(1, 1),
            padding="VALID",
            use_bias=False,
            act=None,
            dtype=self.dtype,
            name="project",
        )(y, train)
        return x + y if use_res else y


class MobileNetV2Encoder(nn.Module):
    """The 19-layer feature extractor, returning the 5 UNet skip taps."""

    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        dt = self.dtype
        x = x.astype(dt)
        taps: List[jnp.ndarray] = []
        c_stem = make_divisible(32 * self.width_mult)
        # features[0]: ConvBNReLU6 3x3 stride 2
        x = ConvBNAct(
            c_stem,
            kernel=(3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            act=relu6,
            dtype=dt,
            name="features_0",
        )(x, train)
        idx = 1
        for t, c, n, s in INVERTED_RESIDUAL_SETTINGS:
            cout = make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    cout,
                    stride=s if i == 0 else 1,
                    expand_ratio=t,
                    dtype=dt,
                    name=f"features_{idx}",
                )(x, train)
                if idx in STAGE_TAPS:
                    taps.append(x)
                idx += 1
        # features[18]: ConvBNReLU6 1x1 -> 1280
        c_last = make_divisible(1280 * max(1.0, self.width_mult))
        x = ConvBNAct(
            c_last,
            kernel=(1, 1),
            padding="VALID",
            use_bias=False,
            act=relu6,
            dtype=dt,
            name="features_18",
        )(x, train)
        taps.append(x)
        return taps
