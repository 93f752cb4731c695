"""Pallas TPU kernels for the inference hot path.

Kernel 1 — fused argmax + palette colorize. The reference's postprocess does
``torch.max`` on device, ships the class map to host, then runs a 10-pass
per-class recoloring loop in numpy (inference.py:64-113). Here a single VPU
kernel computes, per row-tile: the running max/argmax over the 10 class
planes AND the palette lookup, emitting ONE packed 0xCC'RRGGBB uint32 plane
(class index in the top byte, color below — one lane-aligned plane instead
of a ragged [..., 3] tail plus a separate class map). The color lookup is a
chain of 10 vector selects, fused into the same pass over the logits, so the
logits are read from HBM exactly once; the (classes, colors) split is
elementwise XLA outside the kernel.

Layout reasoning (pallas_guide.md): logits arrive NHWC with C=10 — far below
the 128-lane width, so lanes come from W instead. The kernel views the input
as [B*H, W, C], tiles rows with full W per block, and loops C in registers.

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


def _argmax_colorize_kernel(logits_ref, out_ref, *, words):
    """Grid cell: logits [TILE_R, W, C] -> packed [TILE_R, W] uint32
    0xCC'RRGGBB (class index in the top byte, palette color below)."""
    num_classes = logits_ref.shape[-1]
    best = logits_ref[:, :, 0]
    best_idx = jnp.zeros(best.shape, jnp.int32)
    for c in range(1, num_classes):
        x = logits_ref[:, :, c]
        take = x > best
        best = jnp.where(take, x, best)
        best_idx = jnp.where(take, c, best_idx)
    word = jnp.full(best_idx.shape, words[0], jnp.uint32)
    for c in range(1, num_classes):
        word = jnp.where(best_idx == c, jnp.uint32(words[c]), word)
    out_ref[...] = word


def argmax_colorize(
    logits: jnp.ndarray,
    palette_rgb: np.ndarray,
    tile_rows: int = 32,
    interpret: bool = False,
    prefer_pallas: bool = False,
):
    """Fused argmax+colorize. logits [B, H, W, C] float -> (uint8 [B,H,W],
    uint32 [B,H,W] packed 0x00RRGGBB). W must be a multiple of 128.

    On hardware this routes to the pure-XLA reference by default: measured
    on v5e (tools/colorize_bench.py, batch 64, 256x128 Predictor program),
    XLA's argmax + 10-entry table gather is FREE (10,498 fps vs 10,445 for
    argmax alone) while this Pallas kernel runs 2.66x slower (3,922 fps) —
    its C-minor [.., W, 10] layout forces per-class lane broadcasts that
    XLA's fused gather avoids. The kernel remains for interpret-mode tests
    and as ``prefer_pallas=True`` for re-measurement on other topologies.

    The kernel emits ONE uint32 plane with the class index packed into the
    top byte (0xCC'RRGGBB); the (classes, colors) split happens outside in
    XLA. Shape lessons from the hardware (both measured on v5e):
    - a two-output [rows, W/128]-grid formulation compiled in interpret
      mode but OOM'd scoped VMEM on-chip (XLA stack-allocated both full
      outputs, 32.3 MB > 16 MB);
    - tile_rows=256 with this single-output shape drove Mosaic's register
      allocator into 127.66 MB of spill slots (VMEM OOM after a 24-minute
      compile) — the unrolled 10-class select chain holds several
      [256, W] values live at once. Unlike upsample2x_argmax there is no
      MXU matmul here to amortize big tiles, so small row tiles are
      strictly better: tile_rows=32 keeps every live value at 8 vregs;
    - XLA then stack-allocates the whole u32 output in scoped VMEM when it
      is small enough to consider (8 MB at the video config), overflowing
      the default 16 MB scoped limit by 7.6 MB — raised via
      vmem_limit_bytes (v5e has 128 MB physical VMEM)."""
    b, h, w, c = logits.shape
    if w % 128 != 0 or c > 32 or not (interpret or prefer_pallas):
        return argmax_colorize_reference(logits, palette_rgb)
    rows = b * h
    x = logits.reshape(rows, w, c)
    tile_r = min(tile_rows, rows)
    while rows % tile_r != 0:
        tile_r //= 2
    tile_r = max(tile_r, 1)
    palette = _pack_palette(palette_rgb)
    words = tuple(int(v) | (i << 24) for i, v in enumerate(palette))

    kernel = functools.partial(_argmax_colorize_kernel, words=words)
    packed = pl.pallas_call(
        kernel,
        grid=(rows // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tile_r, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, w), jnp.uint32),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}),
    )(x)
    packed = packed.reshape(b, h, w)
    classes = (packed >> 24).astype(jnp.uint8)
    return classes, packed & jnp.uint32(0x00FFFFFF)


# ---------------------------------------------------------------------------
# Kernel 3 — fused final-upsample (align_corners=True) W-contraction + argmax.
#
# The head's last two ops are the x2 bilinear upsample (align_corners=True,
# src/unet.py:30) and the class argmax. Executed separately, the upsampled
# logits [B, 2H, 2W, C] hit HBM in fp32 twice (write + argmax read) — 2.6 GB
# at the 512x512/batch-128 headline config, ~14% of total runtime (ablation,
# docs/DESIGN.md §11). Here the H-axis contraction stays in XLA (a clean MXU
# einsum producing the HALF-size [B, 2H, W, C] tensor), and a Pallas kernel
# performs the W-axis contraction as per-class [rows, W] x [W, 2W] matmuls
# on the MXU with the running argmax kept in registers — the full-resolution
# logits never exist anywhere.


def upsample2x_argmax_reference(logits: jnp.ndarray) -> jnp.ndarray:
    """Pure-JAX reference: argmax(upsample2x_ac_true(logits)) as uint8."""
    from tpuseg.ops.resize import upsample2x_bilinear

    up = upsample2x_bilinear(logits.astype(jnp.float32), align_corners=True)
    return jnp.argmax(up, axis=-1).astype(jnp.uint8)


def _up_w_argmax_kernel(xh_ref, awt_ref, classes_ref, *, num_classes):
    """Grid cell: xh [TILE_R, W, C], AwT [W, W2] -> classes [TILE_R, W2]."""
    awt = awt_ref[...]
    x0 = xh_ref[:, :, 0]
    best = jnp.dot(x0, awt, preferred_element_type=jnp.float32)
    best_idx = jnp.zeros(best.shape, jnp.int32)
    for c in range(1, num_classes):
        y = jnp.dot(xh_ref[:, :, c], awt, preferred_element_type=jnp.float32)
        take = y > best
        best = jnp.where(take, y, best)
        best_idx = jnp.where(take, c, best_idx)
    classes_ref[...] = best_idx.astype(jnp.uint8)


def upsample2x_argmax(
    logits: jnp.ndarray,
    tile_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """argmax over C of the exact x2 align_corners=True bilinear upsample.

    logits [B, H, W, C] float -> classes uint8 [B, 2H, 2W]. Falls back to
    the pure-JAX reference when shapes don't tile (W2 % 128, C > 32).
    tile_rows is the matmul M dimension per grid cell — keep it >= 128 or
    the MXU runs mostly empty (tile 8 measured 1501 fps end-to-end vs 2294
    for the unfused head)."""
    from tpuseg.ops.resize import _bilinear_matrix

    b, h, w, c = logits.shape
    h2, w2 = 2 * h, 2 * w
    rows = b * h2
    while tile_rows > 8 and rows % tile_rows != 0:
        tile_rows //= 2
    if w2 % 128 != 0 or c > 32 or rows % tile_rows != 0:
        return upsample2x_argmax_reference(logits)

    xf = logits.astype(jnp.float32)
    # H contraction in XLA (MXU einsum on the half-size tensor)
    ah = jnp.asarray(_bilinear_matrix(h, h2, True))
    xh = jnp.einsum("ih,bhwc->biwc", ah, xf)          # [B, 2H, W, C]
    xh = xh.reshape(b * h2, w, c)
    awt = jnp.asarray(_bilinear_matrix(w, w2, True)).T  # [W, W2]

    kernel = functools.partial(_up_w_argmax_kernel, num_classes=c)
    classes = pl.pallas_call(
        kernel,
        grid=(b * h2 // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, w2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h2, w2), jnp.uint8),
        interpret=interpret,
    )(xh, awt)
    return classes.reshape(b, h2, w2)


def unpack_colors(packed: np.ndarray) -> np.ndarray:
    """Host-side: uint32 0x00RRGGBB [H, W] -> uint8 RGB [H, W, 3]."""
    p = np.asarray(packed)
    return np.stack(
        [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF], axis=-1
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Kernel 2 — fused bilinear-2x-upsample + skip-concat + 3x3 conv (+bias).
#
# The decoder's hot block (reference up, src/unet.py:94-105) is
#     y = conv3x3(cat([skip, upsample2x(x)], C)) + bias
# whose naive execution materializes BOTH the upsampled tensor and the
# concatenated tensor in HBM (up1 at 512x512 input: a 1344-channel concat).
# This kernel keeps them in VMEM: per (batch, H-tile) grid cell it loads a
# halo'd skip tile and the matching x tile (pl.Element blocks with padding),
# reconstructs the upsample IN REGISTERS (the fixed 0.25/0.75 half-pixel
# pattern of align_corners=False, edge-clamped), and accumulates the conv as
# 9 shifted MXU matmuls per input part — using the SPLIT kernel identity
#     conv(cat(a, b)) = conv_a(a) + conv_b(b)
# so the concat never exists anywhere. BN + activation stay in the caller
# (ConvBNAct applies them after), keeping parameter trees unchanged.


def fused_upconcat_reference(skip, x, w, b):
    """Pure-JAX reference: conv3x3(cat([skip, up2x(x)]), w) + b."""
    from tpuseg.ops.resize import upsample2x_bilinear

    up = upsample2x_bilinear(x, align_corners=False)
    cat = jnp.concatenate([skip, up], axis=-1)
    y = jax.lax.conv_general_dilated(
        cat.astype(jnp.float32),
        w.astype(jnp.float32),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.reshape((1, 1, 1, -1))


def _upconcat_kernel(skip_ref, x_ref, ws_ref, wx_ref, b_ref, out_ref,
                     *, tile, h2, w2, cs, cx, cout):
    i_h = pl.program_id(1)
    n_h = pl.num_programs(1)
    f32 = jnp.float32

    skip_blk = skip_ref[0].astype(f32)          # [tile+2, w2, cs]
    xb = x_ref[0].astype(f32)                   # [tile//2+2, w, cx]

    # --- global row bookkeeping -------------------------------------------
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile + 2, 1, 1), 0)
    r_global = i_h * tile - 1 + rows            # skip/up rows covered
    skip_valid = (r_global >= 0) & (r_global < h2)
    skip_blk = jnp.where(skip_valid, skip_blk, 0.0)  # conv zero padding

    xrows = jax.lax.broadcasted_iota(jnp.int32, (tile // 2 + 2, 1, 1), 0)
    # x block rows are x[i_h*tile//2 - 1 + j]; clamp-replicate at the edges
    # (bilinear edge semantics), the conv halo OOB rows are zeroed later.
    top = i_h == 0
    bot = i_h == n_h - 1
    last = tile // 2 + 1
    xb = jnp.where((xrows == 0) & top, xb[1:2], xb)
    xb = jnp.where((xrows == last) & bot, xb[last - 1:last], xb)

    # --- upsample x in H: rows u=0..tile+1 <-> global r = i_h*tile - 1 + u
    xa = xb[0 : tile // 2 + 1]                  # xb[k]
    xbb = xb[1 : tile // 2 + 2]                 # xb[k+1]
    odd_u = 0.75 * xa + 0.25 * xbb              # u = 2k   (odd global rows)
    even_u = 0.25 * xa + 0.75 * xbb             # u = 2k+1 (even global rows)
    up_h = jnp.stack([odd_u, even_u], axis=1).reshape(
        tile + 2, xb.shape[1], cx
    )
    # zero the conv-halo rows that fall outside the image
    up_h = jnp.where(skip_valid, up_h, 0.0)

    # --- upsample in W (fully static) -------------------------------------
    xm1 = jnp.concatenate([up_h[:, :1], up_h[:, :-1]], axis=1)
    xp1 = jnp.concatenate([up_h[:, 1:], up_h[:, -1:]], axis=1)
    w_even = 0.25 * xm1 + 0.75 * up_h           # output col 2c
    w_odd = 0.75 * up_h + 0.25 * xp1            # output col 2c+1
    up = jnp.stack([w_even, w_odd], axis=2).reshape(tile + 2, w2, cx)

    # --- 3x3 conv as 9 shifted matmuls per part ---------------------------
    def conv_part(blk, w_ref, cin):
        padded = jnp.pad(blk, ((0, 0), (1, 1), (0, 0)))
        acc = jnp.zeros((tile * w2, cout), f32)
        for dy in range(3):
            for dx in range(3):
                patch = padded[dy : dy + tile, dx : dx + w2, :].reshape(
                    tile * w2, cin
                )
                acc = acc + jnp.dot(
                    patch, w_ref[dy, dx], preferred_element_type=f32
                )
        return acc

    acc = conv_part(skip_blk, ws_ref, cs) + conv_part(up, wx_ref, cx)
    acc = acc + b_ref[:].reshape(1, cout)
    out_ref[0] = acc.reshape(tile, w2, cout).astype(out_ref.dtype)


def fused_upsample_concat_conv(
    skip: jnp.ndarray,
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    tile: int = 16,
    interpret: bool = False,
):
    """conv3x3(cat([skip, up2x(x)]), w) + b without materializing either
    intermediate. skip [B,2H,2W,Cs], x [B,H,W,Cx], w [3,3,Cs+Cx,Cout].

    Falls back to the pure-JAX reference when shapes don't tile cleanly.
    """
    Element = pl.Element  # public API (jax.experimental.pallas)

    bsz, h2, w2, cs = skip.shape
    _, h, wdim, cx = x.shape
    cout = w.shape[-1]
    if h2 != 2 * h or w2 != 2 * wdim or w.shape[2] != cs + cx:
        raise ValueError("shape mismatch between skip, x and w")
    while tile > 2 and (h2 % tile != 0 or tile > h2):
        tile //= 2
    if h2 % tile != 0 or tile % 2 != 0:
        return fused_upconcat_reference(skip, x, w, b)

    ws = jnp.asarray(w[:, :, :cs, :], jnp.float32)
    wx = jnp.asarray(w[:, :, cs:, :], jnp.float32)

    kernel = functools.partial(
        _upconcat_kernel, tile=tile, h2=h2, w2=w2, cs=cs, cx=cx, cout=cout
    )
    # Mosaic constraints (real-TPU lowering; interpret mode is laxer):
    # all-or-none Element dims per BlockSpec, and Element low-padding is
    # unsupported — so the 1-row halos come from an explicit XLA pad of the
    # H axis instead (one extra elementwise copy; the 4x-upsample and the
    # concat still never materialize). Index maps return ELEMENT offsets.
    skip_p = jnp.pad(skip, ((0, 0), (1, 1), (0, 0), (0, 0)))
    x_p = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(bsz, h2 // tile),
        in_specs=[
            pl.BlockSpec(
                (
                    Element(1),
                    Element(tile + 2),
                    Element(w2),
                    Element(cs),
                ),
                lambda bi, hi: (bi, hi * tile, 0, 0),
            ),
            pl.BlockSpec(
                (
                    Element(1),
                    Element(tile // 2 + 2),
                    Element(wdim),
                    Element(cx),
                ),
                lambda bi, hi: (bi, hi * (tile // 2), 0, 0),
            ),
            pl.BlockSpec((3, 3, cs, cout), lambda bi, hi: (0, 0, 0, 0)),
            pl.BlockSpec((3, 3, cx, cout), lambda bi, hi: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda bi, hi: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, w2, cout), lambda bi, hi: (bi, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h2, w2, cout), jnp.float32),
        interpret=interpret,
    )(skip_p, x_p, ws, wx, jnp.asarray(b, jnp.float32))
    return out
