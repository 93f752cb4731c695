"""Exact-semantics image resizing as interpolation-matrix contractions.

The reference model mixes TWO bilinear conventions (the classic PyTorch trap):

- decoder ``up`` blocks: ``nn.Upsample(scale_factor=2, mode='bilinear')``
  with the default ``align_corners=False`` (src/unet.py:97);
- the final x2 upsample: ``align_corners=True`` (src/unet.py:30).

Getting both exactly right is a parity gate, so instead of relying on any
library resize every path is built from first principles. THREE formulations
coexist because they have very different TPU cost profiles:

- ``upsample2x_bilinear`` — the decoder / final-head hot path — contracts
  with the [2n, n] interpolation matrix on the MXU (``_apply_hw``).
  Measured @512x512 batch 64: matrix 1357 fps vs interleave 783 fps vs
  gathers 314 fps end-to-end (the round-1 headline regression was this op
  silently switching to gathers).
- ``resize_bilinear`` for arbitrary sizes (preprocess) uses 2-tap
  ``jnp.take`` gathers: compile-safe for odd sizes where the matrix
  contraction's XLA lowering took 85s+ (e.g. 180->32 on this backend), and
  off the hot path so gather throughput doesn't matter.
- ``_upsample2x_axis_half_pixel`` — fixed-phase interleave kept for
  reference/cross-checking (middle of the pack on TPU).

Conventions implemented:
- ``align_corners=False`` (half-pixel): src = (i + 0.5) * n/m - 0.5, clamped.
  Identical to cv2.resize INTER_LINEAR and to torch/ONNX half_pixel.
- ``align_corners=True``: src = i * (n-1)/(m-1).
- nearest ``cv2`` convention: src = floor(i * n/m) (what cv2 INTER_NEAREST
  does — used for mask resizes, inference.py:68-70).
- nearest ``torch`` convention: src = floor(i * n/m) — same formula; torch
  nearest and cv2 nearest agree for integer scale factors.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """[n_out, n_in] row-stochastic interpolation matrix, float32."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    i = np.arange(n_out, dtype=np.float64)
    if align_corners:
        if n_out == 1:
            src = np.zeros_like(i)
        else:
            src = i * (n_in - 1) / (n_out - 1)
    else:
        src = (i + 0.5) * (n_in / n_out) - 0.5
        src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float64)
    A = np.zeros((n_out, n_in), dtype=np.float64)
    A[np.arange(n_out), lo] += 1.0 - frac
    A[np.arange(n_out), hi] += frac
    return A.astype(np.float32)


@functools.lru_cache(maxsize=None)
@functools.lru_cache(maxsize=None)
def _bilinear_taps(n_in: int, n_out: int, align_corners: bool):
    """(lo_idx, hi_idx, frac) int32/float32 arrays for 2-tap interpolation."""
    if align_corners:
        if n_out == 1:
            src = np.zeros(1)
        else:
            src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
        src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, n_in - 1).astype(np.int32)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def _interp_axis(x: jnp.ndarray, axis: int, n_out: int, align_corners: bool):
    """2-tap gather interpolation along one axis (exact torch/cv2 semantics).

    Two ``jnp.take`` gathers + a weighted sum — compiles and runs fast on TPU
    for arbitrary (in, out) sizes, unlike an interpolation-matrix matmul whose
    XLA lowering is pathologically slow to compile for odd sizes on this
    backend (measured 85s+ for a 180->32 contraction).
    """
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    lo, hi, frac = _bilinear_taps(n_in, n_out, align_corners)
    xlo = jnp.take(x, jnp.asarray(lo), axis=axis)
    xhi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = n_out
    w = jnp.asarray(frac).reshape(shape)
    return xlo * (1.0 - w) + xhi * w


def _apply_hw(
    x: jnp.ndarray, A_h: np.ndarray, A_w: np.ndarray, compute_dtype=None
) -> jnp.ndarray:
    """Contract [.., H, W, C] with A_h [H'->H] and A_w [W'->W] (matrix path,
    kept for parity testing of the tap path).

    ``compute_dtype``: storage dtype of the contraction operands/results
    (e.g. bf16 for the reduced-traffic inference head). The MXU still
    accumulates each 2-tap lerp in fp32; only HBM-resident tensors narrow.
    None (default) = at-least-fp32, the exact-parity convention."""
    orig_dtype = x.dtype
    if compute_dtype is not None:
        xf = x.astype(compute_dtype)
        y = jnp.einsum("ih,...hwc->...iwc", jnp.asarray(A_h, compute_dtype), xf)
        y = jnp.einsum("jw,...iwc->...ijc", jnp.asarray(A_w, compute_dtype), y)
        return y
    # at least float32 compute; float64 inputs (x64 parity tests) stay f64.
    # The f32-rounded matrix entries are exact for the x2 phases (0.25/0.75).
    dtype = jnp.promote_types(jnp.float32, orig_dtype)
    xf = x.astype(dtype)
    y = jnp.einsum("ih,...hwc->...iwc", jnp.asarray(A_h, dtype), xf)
    y = jnp.einsum("jw,...iwc->...ijc", jnp.asarray(A_w, dtype), y)
    return y.astype(orig_dtype)


def resize_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of an NHWC (or HWC) tensor with exact torch semantics."""
    orig_dtype = x.dtype
    y = x.astype(jnp.promote_types(jnp.float32, orig_dtype))
    y = _interp_axis(y, x.ndim - 3, out_h, align_corners)
    y = _interp_axis(y, x.ndim - 2, out_w, align_corners)
    return y.astype(orig_dtype)


def _upsample2x_axis_half_pixel(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x half-pixel (align_corners=False) upsample along one axis.

    For scale 2 the source grid is src = i/2 - 0.25, so every output is a
    fixed-phase 2-tap lerp of its neighbors:

        out[2k]   = 0.25 * x[k-1] + 0.75 * x[k]     (edge-clamped)
        out[2k+1] = 0.75 * x[k]   + 0.25 * x[k+1]

    Implemented as shifts + weighted adds + an interleaving reshape — pure
    elementwise VPU work that XLA fuses into one kernel. This is the decoder
    hot path; the gather formulation (``_interp_axis``) measured 4.3x slower
    end-to-end on the chip (314 vs 1357 fps @512x512 — the round-1 headline
    regression, bench_history.json).
    """
    from jax import lax

    n = x.shape[axis]
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, n - 1, n, axis=axis)
    xm1 = jnp.concatenate([first, lax.slice_in_dim(x, 0, n - 1, axis=axis)],
                          axis=axis)
    xp1 = jnp.concatenate([lax.slice_in_dim(x, 1, n, axis=axis), last],
                          axis=axis)
    even = 0.25 * xm1 + 0.75 * x
    odd = 0.75 * x + 0.25 * xp1
    y = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return y.reshape(shape)


def upsample2x_bilinear(
    x: jnp.ndarray,
    align_corners: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """x2 bilinear upsample (the decoder / final-head hot path).

    Contracts with the [2n, n] interpolation matrix — XLA maps the
    contraction onto the MXU with clean tiled layouts. Measured on the chip
    @512x512 batch 64 (bench_history.json): matrix 1357 fps, fixed-phase
    interleave (stack+reshape, ``_upsample2x_axis_half_pixel``) 783 fps, 2-tap
    gathers (``_interp_axis``) 314 fps. For x2 the matrix lowering compiles
    fast; the pathological-compile cases are odd downscales, which go through
    ``resize_bilinear``'s gather path instead."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_hw(
        x,
        _bilinear_matrix(h, 2 * h, align_corners),
        _bilinear_matrix(w, 2 * w, align_corners),
        compute_dtype=compute_dtype,
    )


def up_pow2_bilinear(x: jnp.ndarray, times: int) -> jnp.ndarray:
    """2^times bilinear upsample as CASCADED exact-phase 2x lerps.

    The decoder-postmortem-proven formulation for power-of-2 model-graph
    upsamples (the gather formulation measured 4.3x slower end-to-end,
    DESIGN §9; switching the FPN family to this gave 3.6x, DESIGN §29).
    The cascade IS the FPN/DeepLab families' definition of Nx bilinear —
    it differs from direct Nx in the tails by design (no torch parity
    applies to those families). align_corners=False at every stage."""
    for _ in range(times):
        x = upsample2x_bilinear(x, align_corners=False)
    return x


def _phase2_ac_true(x: jnp.ndarray, axis: int):
    """Even/odd output phases of the exact align_corners=True 2x upsample.

    For n inputs along ``axis`` the 2n outputs sample src = i*(n-1)/(2n-1).
    Writing i = 2k and i = 2k+1:

        src(2k)   = k - k/(2n-1)         -> lerp(x[k-1], x[k]),  w_{k-1} = k/(2n-1)
        src(2k+1) = k + (n-1-k)/(2n-1)   -> lerp(x[k], x[k+1]),  w_{k+1} = (n-1-k)/(2n-1)

    (k/(2n-1) < 1 and (n-1-k)/(2n-1) < 1 always, so the taps never cross an
    extra integer — the decomposition is exact for every n.) Unlike the
    ac=False case the weights are position-DEPENDENT, but they are still
    just per-position vectors broadcast over the lerp: pure elementwise
    shifts + multiplies, no gather, no matmul.
    """
    from jax import lax

    n = x.shape[axis]
    k = jnp.arange(n, dtype=x.dtype)
    shape = [1] * x.ndim
    shape[axis] = n
    we = (k / (2 * n - 1)).reshape(shape)            # weight of x[k-1], even
    wo = ((n - 1 - k) / (2 * n - 1)).reshape(shape)  # weight of x[k+1], odd
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, n - 1, n, axis=axis)
    xm1 = jnp.concatenate(
        [first, lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis
    )
    xp1 = jnp.concatenate(
        [lax.slice_in_dim(x, 1, n, axis=axis), last], axis=axis
    )
    even = we * xm1 + (1.0 - we) * x
    odd = (1.0 - wo) * x + wo * xp1
    return even, odd


def upsample2x_argmax_head(
    logits: jnp.ndarray, out_dtype=jnp.uint8
) -> jnp.ndarray:
    """argmax(upsample2x_bilinear(logits, align_corners=True)) — the model
    head (reference src/unet.py:30 + inference argmax) — WITHOUT ever
    materializing the full-resolution fp32 logits.

    Each of the four (H-phase x W-phase) grids is an elementwise 4-tap lerp
    of the half-res logits that XLA fuses straight into its argmax; only
    the four uint8 index planes reach HBM, then a depth-to-space interleave
    assembles the full-res class map. HBM traffic becomes ~4 half-res fp32
    reads + 1 full-res uint8 write, vs write + read of full-res fp32 logits
    (2.6 GB round trip at 512x512 batch 256 — DESIGN.md §13).

    [B, H, W, C] float -> [B, 2H, 2W] ``out_dtype`` (default uint8; int32
    avoids TPU 8-bit relayout in the interleave, A/B-able).
    """
    eh, oh = _phase2_ac_true(logits, logits.ndim - 3)
    rows = []
    for h in (eh, oh):
        ew, ow = _phase2_ac_true(h, logits.ndim - 2)
        ce = jnp.argmax(ew, axis=-1).astype(out_dtype)  # [B, H, W]
        co = jnp.argmax(ow, axis=-1).astype(out_dtype)
        # interleave W: [B, H, W, 2] -> [B, H, 2W]
        w2 = jnp.stack([ce, co], axis=-1)
        rows.append(w2.reshape(*w2.shape[:-2], 2 * w2.shape[-2]))
    # interleave H: [B, H, 2, 2W] -> [B, 2H, 2W]
    h2 = jnp.stack(rows, axis=-2)
    return h2.reshape(*h2.shape[:-3], 2 * h2.shape[-3], h2.shape[-1])


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize (cv2 INTER_NEAREST convention) for masks.

    Works on [..., H, W] integer class maps (no channel dim) or [..., H, W, C].
    """
    has_channels = x.ndim >= 3 and x.shape[-1] <= 4 and x.shape[-2] > 4
    if has_channels:
        h_ax, w_ax = x.ndim - 3, x.ndim - 2
    else:
        h_ax, w_ax = x.ndim - 2, x.ndim - 1
    h, w = x.shape[h_ax], x.shape[w_ax]
    rows = np.minimum(np.floor(np.arange(out_h) * (h / out_h)), h - 1).astype(
        np.int32
    )
    cols = np.minimum(np.floor(np.arange(out_w) * (w / out_w)), w - 1).astype(
        np.int32
    )
    y = jnp.take(x, jnp.asarray(rows), axis=h_ax)
    y = jnp.take(y, jnp.asarray(cols), axis=w_ax)
    return y
