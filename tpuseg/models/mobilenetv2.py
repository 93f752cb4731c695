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
import numpy as np

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
    # Space-to-depth stem (exact-equivalent rewrite). Off by default: measured
    # 4.3x SLOWER on the real chip (312 vs 1357 fps @512x512 — BENCH_r01 vs
    # bench_history; see docs/DESIGN.md). Toggle via --model.stem_s2d.
    stem_s2d: bool = False

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
            stem_s2d=self.stem_s2d,
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


def space_to_depth_stem_kernel(kernel3x3: jnp.ndarray) -> jnp.ndarray:
    """Rearrange the stem's [3,3,3,C] stride-2 kernel into the equivalent
    [2,2,12,C] stride-1 kernel over a space-to-depth(2) input.

    The classic TPU input trick: a 3x3 stride-2 conv on [H,W,3] reads, for
    output (i,j), input rows/cols 2i-1..2i+1 — i.e. 2x2 blocks (i-1..i) of
    the space-to-depth image whose 12 channels are the (dy,dx,rgb) subpixels.
    Channels go from 3 (wasting 125/128 MXU lanes on the largest tensor in
    the network) to 12, and the strided access becomes dense.

    s2d channel layout: c = (a * 2 + b) * 3 + rgb for subpixel (a, b).
    Pure-jnp (traceable under jit: the kernel is a traced parameter).
    """
    k = kernel3x3  # [3, 3, 3, C] (dy, dx, rgb, out)
    cout = k.shape[-1]
    out = jnp.zeros((2, 2, 12, cout), k.dtype)
    # output pixel (i,j): tap (dy,dx) in 0..2 reads input (2i+dy-1, 2j+dx-1)
    # = s2d block (i-1 + (dy+1)//2, j-1 + (dx+1)//2), subpixel ((dy+1)%2, (dx+1)%2)
    for dy in range(3):
        for dx in range(3):
            p, a = divmod(dy + 1, 2)   # block row offset (0|1), subpixel row
            q, b = divmod(dx + 1, 2)
            c0 = (a * 2 + b) * 3
            out = out.at[p, q, c0 : c0 + 3, :].set(k[dy, dx])
    return out


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, H/2, W/2, 12] with (a,b,rgb) channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, H/2, W/2, a, b, c]
    return x.reshape(b, h // 2, w // 2, 4 * c)
