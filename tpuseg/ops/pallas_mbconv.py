"""Pallas fused MobileNetV2 inverted-residual block (encoder hot path).

The encoder's 17 blocks each run expand-1x1 -> BN/ReLU6 -> depthwise-3x3 ->
BN/ReLU6 -> project-1x1 -> BN (+residual) — the cuDNN path under the
reference's ``src/unet.py:15-19``. Under XLA the two hidden tensors (6x the
block's channel width) round-trip HBM between the convs; at 512x512 batch
128 the encoder's intermediate traffic is ~10 GB per step and the measured
encoder time (18.4 ms) is ~65% of the pure-bandwidth bound (docs/DESIGN.md
§11). This kernel keeps both hidden tensors in VMEM: per (batch, H-tile)
grid cell it runs the expand matmul, the depthwise 3x3 (9 shifted
multiply-adds on the VPU), and the project matmul back-to-back, with BN
folded into per-channel scale/bias (exact at inference: BN is affine in
eval mode).

Eval-only (BN batch statistics need the full batch in training); the
pure-JAX path remains the default for training and wherever shapes don't
tile. Mosaic constraints follow kernel 2's lessons: all-Element specs for
the halo'd input, explicit XLA pad of H for the depthwise halo, fp32
accumulation via preferred_element_type inside the kernel only (no autodiff
through the kernel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def fold_bn_affine(bn_params: dict, bn_stats: dict, eps: float = 1e-5):
    """BN eval-mode affine: y = x*scale + bias (exact; torch eps 1e-5)."""
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    scale = jnp.asarray(bn_params["scale"], jnp.float32) / jnp.sqrt(var + eps)
    bias = jnp.asarray(bn_params["bias"], jnp.float32) - mean * scale
    return scale, bias


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def mbconv_reference(x, we, se, be, wd, sd, bd, wp, sp, bp, stride, use_res):
    """Pure-JAX reference (same math, materialized intermediates)."""
    from jax import lax

    f32 = jnp.float32
    vec = lambda v: jnp.asarray(v, f32).reshape(1, 1, 1, -1)
    y = x.astype(f32)
    if we is not None:
        y = jnp.einsum("bhwc,cd->bhwd", y, we.astype(f32))
        y = _relu6(y * vec(se) + vec(be))
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = y.shape[1], y.shape[2]
    ho, wo = h // stride, w // stride
    acc = jnp.zeros((y.shape[0], ho, wo, y.shape[-1]), f32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + (
                yp[:, dy : dy + h : stride, dx : dx + w : stride, :][
                    :, :ho, :wo
                ]
                * wd[dy, dx].astype(f32).reshape(1, 1, 1, -1)
            )
    z = _relu6(acc * vec(sd) + vec(bd))
    out = jnp.einsum("bhwc,cd->bhwd", z, wp.astype(f32)) * vec(sp) + vec(bp)
    if use_res:
        out = out + x.astype(f32)
    return out.astype(x.dtype)


def _mbconv_kernel(x_ref, we_ref, se_ref, be_ref, wd_ref, sd_ref, bd_ref,
                   wp_ref, sp_ref, bp_ref, out_ref,
                   *, stride, use_res, expand, tile_out, w_in, cin, hidden,
                   cout):
    f32 = jnp.float32
    tile_in = tile_out * stride
    rows = tile_in + 2
    x = x_ref[0]                                   # [rows, w_in, cin]
    if expand:
        y = jnp.dot(
            x.reshape(rows * w_in, cin), we_ref[...],
            preferred_element_type=f32,
        )
        y = _relu6(
            y * se_ref[...].reshape(1, hidden)
            + be_ref[...].reshape(1, hidden)
        ).reshape(rows, w_in, hidden)
        # the dw conv's zero padding: halo rows OUTSIDE the image must stay
        # zero, but the expand's bias+ReLU6 turned padded zeros into
        # relu6(be) — mask them. Padded row p = hi*tile_in + j is a real
        # image row iff 1 <= p <= H (xp carries one pad row each side).
        i_h = pl.program_id(1)
        n_h = pl.num_programs(1)
        p = i_h * tile_in + jax.lax.broadcasted_iota(
            jnp.int32, (rows, 1, 1), 0
        )
        h_total = n_h * tile_in  # == H (grid covers all output rows)
        y = jnp.where((p >= 1) & (p <= h_total), y, 0.0)
    else:
        y = x.astype(f32)
    # depthwise 3x3: pad W in-kernel, 9 shifted FMAs (VPU). Strided slices
    # lower to >2D gathers Mosaic rejects, so stride 2 is expressed as a
    # contiguous slice + reshape + static phase-0 index.
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))
    wo = w_in // stride
    acc = jnp.zeros((tile_out, wo, hidden), f32)
    for dy in range(3):
        for dx in range(3):
            if stride == 1:
                sl = yp[dy : dy + tile_out, dx : dx + wo, :]
            else:
                blk = yp[dy : dy + 2 * tile_out, dx : dx + 2 * wo, :]
                sl = blk.reshape(tile_out, 2, wo, 2, hidden)[:, 0, :, 0, :]
            acc = acc + sl * wd_ref[dy, dx].reshape(1, 1, hidden)
    z = _relu6(
        acc * sd_ref[...].reshape(1, 1, hidden)
        + bd_ref[...].reshape(1, 1, hidden)
    )
    out = jnp.dot(
        z.reshape(tile_out * wo, hidden), wp_ref[...],
        preferred_element_type=f32,
    )
    out = (
        out * sp_ref[...].reshape(1, cout) + bp_ref[...].reshape(1, cout)
    ).reshape(tile_out, wo, cout)
    if use_res:
        out = out + x[1 : 1 + tile_out].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


def fused_inverted_residual(
    x: jnp.ndarray,
    we: Optional[jnp.ndarray],
    se, be,
    wd: jnp.ndarray,
    sd, bd,
    wp: jnp.ndarray,
    sp, bp,
    stride: int = 1,
    use_res: bool = False,
    tile_out: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """One inverted-residual block, hidden tensors never leaving VMEM.

    x [B,H,W,Cin]; we [Cin,hidden] or None (expand_ratio==1); wd [3,3,hidden];
    wp [hidden,Cout]; s*/b* fp32 per-channel BN affines. Returns x.dtype.
    Falls back to the reference for shapes that don't tile."""
    b, h, w_in, cin = x.shape
    hidden = wd.shape[-1]
    cout = wp.shape[-1]
    ho = h // stride
    # Mosaic scoped-VMEM budget: the kernel's live set measures ~12x the
    # fp32 hidden block (y + pad + unrolled dw partials + acc + out);
    # stay under ~14 MB of the 16 MB limit.
    budget = 14 * 1024 * 1024
    while tile_out > 1:
        rows = tile_out * stride + 2
        if rows * w_in * hidden * 4 * 12 <= budget and ho % tile_out == 0:
            break
        tile_out //= 2
    if ho % tile_out != 0 or h % stride != 0 or w_in % stride != 0:
        return mbconv_reference(x, we, se, be, wd, sd, bd, wp, sp, bp,
                                stride, use_res)

    Element = pl.Element
    tile_in = tile_out * stride
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    expand = we is not None
    f32 = jnp.float32
    dummy = jnp.zeros((1, 1), f32)
    we_in = jnp.asarray(we, f32) if expand else dummy
    se_in = jnp.asarray(se, f32) if expand else jnp.zeros((1,), f32)
    be_in = jnp.asarray(be, f32) if expand else jnp.zeros((1,), f32)

    kernel = functools.partial(
        _mbconv_kernel, stride=stride, use_res=use_res, expand=expand,
        tile_out=tile_out, w_in=w_in, cin=cin, hidden=hidden, cout=cout,
    )
    vec = lambda n: pl.BlockSpec((n,), lambda bi, hi: (0,))
    out = pl.pallas_call(
        kernel,
        grid=(b, ho // tile_out),
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(tile_in + 2), Element(w_in),
                 Element(cin)),
                lambda bi, hi: (bi, hi * tile_in, 0, 0),
            ),
            pl.BlockSpec(we_in.shape, lambda bi, hi: (0,) * we_in.ndim),
            vec(se_in.shape[0]),
            vec(be_in.shape[0]),
            pl.BlockSpec((3, 3, hidden), lambda bi, hi: (0, 0, 0)),
            vec(hidden),
            vec(hidden),
            pl.BlockSpec((hidden, cout), lambda bi, hi: (0, 0)),
            vec(cout),
            vec(cout),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_out, w_in // stride, cout), lambda bi, hi: (bi, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, ho, w_in // stride, cout),
                                       x.dtype),
        interpret=interpret,
    )(xp, we_in, se_in, be_in, jnp.asarray(wd, f32), jnp.asarray(sd, f32),
      jnp.asarray(bd, f32), jnp.asarray(wp, f32), jnp.asarray(sp, f32),
      jnp.asarray(bp, f32))
    return out
