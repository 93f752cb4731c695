"""Subpixel (depth-to-space) formulation of conv3x3(upsample2x(x)).

The decoder's ``up`` block computes ``conv3x3(cat([skip, up2x(x)]))``
(reference src/unet.py:94-105). The x-branch of the split kernel identity
``conv(cat(a,b)) = conv_a(a) + conv_b(b)`` is a 3x3 conv over a 2x
bilinear-upsampled tensor — a fractionally-strided conv. This module
rewrites it EXACTLY as

    conv3x3(up2x_half_pixel(x), K)  ==  d2s( conv3x3(x, K_comp) )

where ``K_comp[3,3,Cin,4*Cout]`` folds the fixed-phase bilinear weights
(0.25/0.75 half-pixel taps) into the conv kernel, one output-channel group
per output subpixel phase (a, b), and ``d2s`` is depth-to-space(2).

Why: the composite conv runs at (H/2, W/2) with 4x the output channels —
identical FLOPs but 4x the MXU lane utilization when Cout < 128 (up3/up4
have Cout 64/32; measured decoder MFU ~21%, see docs/DESIGN.md §11) — and
the 4x-upsampled intermediate never reaches HBM.

Exactness at the borders: torch's align_corners=False clamp makes
u[0] == x[0] at scale 2, which the composite reproduces by edge-padding x
before the VALID conv. The 3x3 conv's OWN zero padding over u, however,
zero-fills u[-1]/u[2H] — the composite's edge-pad sees x[0]/x[H-1] there
instead, so the first/last output row and column are recomputed exactly
from 2-row/2-col slices of x and stitched in (4 tiny convs; <1% of the
work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# W[a, dy, r]: weight with which kernel tap dy (0..2) reads input offset
# r-1 (-1..1) when producing output subpixel phase a of a half-pixel 2x
# upsample composed with a 3x3 conv. Derivation: output row 2i+a, tap dy
# reads u[2i + a + dy - 1]; u[2k] = 0.25 x[k-1] + 0.75 x[k],
# u[2k+1] = 0.75 x[k] + 0.25 x[k+1].
_W = np.zeros((2, 3, 3), np.float64)
for _a in range(2):
    for _dy in range(3):
        _t = _a + _dy - 1
        _k, _c = divmod(_t, 2)
        if _c == 0:
            for _m, _w in ((-1, 0.25), (0, 0.75)):
                _W[_a, _dy, _k + _m + 1] += _w
        else:
            for _m, _w in ((0, 0.75), (1, 0.25)):
                _W[_a, _dy, _k + _m + 1] += _w


def compose_up2x_conv_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Cin,Cout] -> [3,3,Cin,4*Cout] composite kernel.

    Output channel layout: group (a*2+b) holds phase (a, b), i.e.
    channels [(a*2+b)*Cout : (a*2+b+1)*Cout]. Pure-jnp (jit-traceable; the
    kernel is a traced parameter, the W tables are baked constants)."""
    k = kernel.astype(jnp.float32)
    w = jnp.asarray(_W, jnp.float32)
    # K_comp[ry, rx, ci, (a,b), co] = sum_{dy,dx} K[dy,dx,ci,co] W[a,dy,ry] W[b,dx,rx]
    comp = jnp.einsum("yxio,ays,bxt->stiabo", k, w, w)
    s, t, ci, _, _, co = comp.shape
    return comp.reshape(s, t, ci, 4 * co)


def depth_to_space2(y: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 4C] (phase-major groups) -> [B, 2H, 2W, C]."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # [B, H, a, W, b, C]
    return y.reshape(b, 2 * h, 2 * w, c)


def _conv(x, k, padding):
    # NOTE: no preferred_element_type upcast here — its transpose rule feeds
    # an fp32 cotangent into a bf16 conv and fails under grad (hit by the
    # bf16 training path); the MXU accumulates fp32 internally regardless.
    return lax.conv_general_dilated(
        x,
        k.astype(x.dtype),
        (1, 1),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)


def conv3x3_up2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact conv3x3(pad=1, zeros)(up2x_half_pixel(x), kernel).

    x [B,H,W,Cin] — convs run in x.dtype (bf16 on the fast path, matching
    nn.Conv(dtype=...)) with fp32 accumulation; kernel [3,3,Cin,Cout] fp32
    (bilinear weights folded at fp32, then cast once). Returns
    [B,2H,2W,Cout] float32. No bias (caller adds it once for the full
    split-kernel sum)."""
    xf = x
    b, h, w, cin = x.shape
    kc = compose_up2x_conv_kernel(kernel)

    # interior (+ bilinear edge clamp): edge-pad x, VALID composite conv
    xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = depth_to_space2(_conv(xp, kc, "VALID"))

    # border strips where the conv's zero padding over u differs from the
    # composite's edge-pad: output rows {0, 2H-1} and cols {0, 2W-1}.
    # Each is recomputed from a 2-row/2-col slice of x via the literal
    # definition (tiny u slices; conv zero-pads W / H respectively).
    from tpuseg.ops.resize import upsample2x_bilinear

    kf = kernel.astype(jnp.float32)

    def up_rows(xs):  # [B, 2, W, C] -> u rows [B, 4, 2W, C]
        return upsample2x_bilinear(xs, align_corners=False)

    # top/bottom rows: u rows {-1,0,1} with u[-1]=0 -> pad a zero row
    u_top = up_rows(xf[:, :2])[:, :2]            # u rows 0,1
    u_top = jnp.pad(u_top, ((0, 0), (1, 0), (0, 0), (0, 0)))
    row0 = _conv(u_top, kf, ((0, 0), (1, 1)))    # [B,1,2W,Cout]
    u_bot = up_rows(xf[:, -2:])[:, -2:]          # u rows 2H-2, 2H-1
    u_bot = jnp.pad(u_bot, ((0, 0), (0, 1), (0, 0), (0, 0)))
    rowl = _conv(u_bot, kf, ((0, 0), (1, 1)))
    # left/right cols over the FULL height: u cols {-1,0,1} / {2W-2,2W-1,pad}
    u_all_lr = up_rows(jnp.concatenate([xf[:, :, :2], xf[:, :, -2:]], 2))
    u_l = jnp.pad(u_all_lr[:, :, :2], ((0, 0), (0, 0), (1, 0), (0, 0)))
    col0 = _conv(u_l, kf, ((1, 1), (0, 0)))      # [B,2H,1,Cout]
    u_r = jnp.pad(u_all_lr[:, :, -2:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    coll = _conv(u_r, kf, ((1, 1), (0, 0)))

    y = y.at[:, :, :1].set(col0)
    y = y.at[:, :, -1:].set(coll)
    y = y.at[:, :1].set(row0)
    y = y.at[:, -1:].set(rowl)
    return y


def up_concat_conv_subpixel(
    skip: jnp.ndarray, x: jnp.ndarray, kernel: jnp.ndarray, bias
) -> jnp.ndarray:
    """conv3x3(cat([skip, up2x(x)]), kernel) + bias via the split-kernel
    identity: a plain conv on skip plus the subpixel composite on x.

    skip [B,2H,2W,Cs], x [B,H,W,Cx], kernel [3,3,Cs+Cx,Cout] -> fp32."""
    cs = skip.shape[-1]
    ks = kernel[:, :, :cs]
    kx = kernel[:, :, cs:]
    y = _conv(skip, ks, ((1, 1), (1, 1)))  # fp32 accumulators out
    y = y + conv3x3_up2x(x, kx)
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32).reshape(1, 1, 1, -1)
    return y
