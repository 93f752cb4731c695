"""Vanilla UNet and LightUNet as Flax modules.

Behavioral spec: reference src/unet.py:124-147 (UNet) and :149-172
(LightUNet). Topology (base_filters = F):

    inc   : DoubleConv(3 -> F)
    down1 : MaxPool + DoubleConv(F -> 2F)
    down2 : MaxPool + DoubleConv(2F -> 4F)
    down3 : MaxPool + DoubleConv(4F -> 4F)     # note: keeps 4F (src/unet.py:130)
    up1   : cat(4F skip, 4F up) -> 2F
    up2   : cat(2F, 2F) -> F
    up3   : cat(F, F)  -> F
    head  : outconv(F -> classes)              # output at input resolution

LightUNet is the same graph with F=32 and 1 output channel
(src/unet.py:149-172).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.blocks import DoubleConv, Down, Up, OutConv


class UNet(nn.Module):
    output_channels: int = 1
    base_filters: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        dt = self.dtype
        x = x.astype(dt)
        x1 = DoubleConv(f, dtype=dt, name="inc")(x, train)
        x2 = Down(f * 2, dtype=dt, name="down1")(x1, train)
        x3 = Down(f * 4, dtype=dt, name="down2")(x2, train)
        x4 = Down(f * 4, dtype=dt, name="down3")(x3, train)

        y = Up(f * 2, dtype=dt, name="up1")(x4, x3, train)
        y = Up(f, dtype=dt, name="up2")(y, x2, train)
        y = Up(f, dtype=dt, name="up3")(y, x1, train)
        return OutConv(self.output_channels, dtype=dt, name="sem_out")(y, train)


class LightUNet(nn.Module):
    base_filters: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return UNet(
            output_channels=1,
            base_filters=self.base_filters,
            dtype=self.dtype,
            name="unet",
        )(x, train)
