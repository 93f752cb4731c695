"""Exact-semantics image resizing as interpolation-matrix contractions.

The reference model mixes TWO bilinear conventions (the classic PyTorch trap):

- decoder ``up`` blocks: ``nn.Upsample(scale_factor=2, mode='bilinear')``
  with the default ``align_corners=False`` (src/unet.py:97);
- the final x2 upsample: ``align_corners=True`` (src/unet.py:30).

Getting both exactly right is a parity gate, so instead of relying on any
library resize we build the 1-D interpolation matrix for each convention and
contract it along H then W:

    out[b, i, j, c] = sum_{h,w} A_h[i, h] * A_w[j, w] * x[b, h, w, c]

Each row of A has at most two nonzeros — XLA lowers these contractions to
MXU matmuls, which on TPU is *faster* than a gather-based resize and is
bit-exact in fp32. Matrices are cached per (in, out, mode) and baked into the
jitted graph as constants.

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
def _nearest_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] 0/1 selection matrix for cv2/torch nearest semantics."""
    i = np.arange(n_out, dtype=np.float64)
    src = np.minimum(np.floor(i * (n_in / n_out)), n_in - 1).astype(np.int64)
    A = np.zeros((n_out, n_in), dtype=np.float32)
    A[np.arange(n_out), src] = 1.0
    return A


def _apply_hw(x: jnp.ndarray, A_h: np.ndarray, A_w: np.ndarray) -> jnp.ndarray:
    """Contract [.., H, W, C] with A_h [H'->H] and A_w [W'->W]."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # H contraction then W contraction; XLA maps both onto the MXU.
    y = jnp.einsum("ih,...hwc->...iwc", jnp.asarray(A_h), xf)
    y = jnp.einsum("jw,...iwc->...ijc", jnp.asarray(A_w), y)
    return y.astype(orig_dtype)


def resize_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of an NHWC (or HWC) tensor with exact torch semantics."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_hw(
        x,
        _bilinear_matrix(h, out_h, align_corners),
        _bilinear_matrix(w, out_w, align_corners),
    )


def upsample2x_bilinear(x: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """x2 bilinear upsample (the decoder / final-head hot path)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, 2 * h, 2 * w, align_corners)


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize (cv2 INTER_NEAREST convention) for masks.

    Works on [..., H, W] integer class maps (no channel dim) or [..., H, W, C].
    """
    has_channels = x.ndim >= 3 and x.shape[-1] <= 4 and x.shape[-2] > 4
    if x.ndim == 2 or not has_channels:
        # [..., H, W] class map: use pure gather to keep integer dtype.
        h, w = x.shape[-2], x.shape[-1]
        rows = np.minimum(
            np.floor(np.arange(out_h) * (h / out_h)), h - 1
        ).astype(np.int32)
        cols = np.minimum(
            np.floor(np.arange(out_w) * (w / out_w)), w - 1
        ).astype(np.int32)
        y = jnp.take(x, jnp.asarray(rows), axis=-2)
        y = jnp.take(y, jnp.asarray(cols), axis=-1)
        return y
    h, w = x.shape[-3], x.shape[-2]
    orig = x.dtype
    y = _apply_hw(x, _nearest_matrix(h, out_h), _nearest_matrix(w, out_w))
    return y.astype(orig)
