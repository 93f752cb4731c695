"""Pallas TPU kernels for the inference hot path.

Kernel 1 — fused argmax + palette colorize. The reference's postprocess does
``torch.max`` on device, ships the class map to host, then runs a 10-pass
per-class recoloring loop in numpy (inference.py:64-113). Here a single VPU
kernel computes, per [8, W]-tile: the running max/argmax over the 10 class
planes AND the palette lookup, emitting BOTH the class map (uint8, for the
host morphology path) and the packed 0xXXRRGGBB color image (uint32 — one
lane-aligned plane instead of a ragged [..., 3] tail). The color lookup is a
chain of 10 vector selects, fused into the same pass over the logits, so the
logits are read from HBM exactly once.

Layout reasoning (pallas_guide.md): logits arrive NHWC with C=10 — far below
the 128-lane width, so lanes must come from W instead. The kernel views the
input as [B*H, W, C], tiles [8, 128] over (rows, W), and loops C in registers.

All kernels carry a pure-JAX reference implementation and run in interpret
mode on CPU for tests; ``use_pallas`` flags select them at runtime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_palette(palette_rgb: np.ndarray) -> np.ndarray:
    """[C, 3] uint8 -> [C] uint32 packed 0x00RRGGBB."""
    p = palette_rgb.astype(np.uint32)
    return (p[:, 0] << 16) | (p[:, 1] << 8) | p[:, 2]


def argmax_colorize_reference(logits: jnp.ndarray, palette_rgb: np.ndarray):
    """Pure-JAX reference: (class_map uint8, packed colors uint32)."""
    classes = jnp.argmax(logits, axis=-1)
    packed = jnp.asarray(_pack_palette(palette_rgb), jnp.uint32)
    return classes.astype(jnp.uint8), packed[classes]


def _argmax_colorize_kernel(logits_ref, classes_ref, colors_ref, *, palette):
    """Grid cell: logits [TILE_R, 128, C] -> classes/colors [TILE_R, 128]."""
    num_classes = logits_ref.shape[-1]
    best = logits_ref[:, :, 0]
    best_idx = jnp.zeros(best.shape, jnp.int32)
    for c in range(1, num_classes):
        x = logits_ref[:, :, c]
        take = x > best
        best = jnp.where(take, x, best)
        best_idx = jnp.where(take, c, best_idx)
    color = jnp.full(best_idx.shape, palette[0], jnp.uint32)
    for c in range(1, num_classes):
        color = jnp.where(best_idx == c, jnp.uint32(palette[c]), color)
    classes_ref[:, :] = best_idx.astype(jnp.uint8)
    colors_ref[:, :] = color


def argmax_colorize(
    logits: jnp.ndarray,
    palette_rgb: np.ndarray,
    tile_rows: int = 256,
    interpret: bool = False,
):
    """Fused argmax+colorize. logits [B, H, W, C] float -> (uint8 [B,H,W],
    uint32 [B,H,W] packed 0x00RRGGBB). W must be a multiple of 128."""
    b, h, w, c = logits.shape
    if w % 128 != 0:
        return argmax_colorize_reference(logits, palette_rgb)
    rows = b * h
    x = logits.reshape(rows, w, c)
    tile_r = min(tile_rows, rows)
    while rows % tile_r != 0:
        tile_r //= 2
    tile_r = max(tile_r, 1)
    palette = tuple(int(v) for v in _pack_palette(palette_rgb))

    kernel = functools.partial(_argmax_colorize_kernel, palette=palette)
    classes, colors = pl.pallas_call(
        kernel,
        grid=(rows // tile_r, w // 128),
        in_specs=[
            pl.BlockSpec(
                (tile_r, 128, c),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec((tile_r, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, w), jnp.uint8),
            jax.ShapeDtypeStruct((rows, w), jnp.uint32),
        ),
        interpret=interpret,
    )(x)
    return classes.reshape(b, h, w), colors.reshape(b, h, w)


def unpack_colors(packed: np.ndarray) -> np.ndarray:
    """Host-side: uint32 0x00RRGGBB [H, W] -> uint8 RGB [H, W, 3]."""
    p = np.asarray(packed)
    return np.stack(
        [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF], axis=-1
    ).astype(np.uint8)
