"""Device-side binary morphology for the inference postprocess.

The reference's road cleanup opens with a 5x5 rect MORPH_CLOSE
(/root/reference/inference.py:76-83) before the connected-component
keep-largest. The close is two REGULAR sliding-window passes — exactly the
shape XLA's reduce_window lowers well to the VPU — so it can run inside the
Predictor's device program on the class map before the fetch
(tpuseg/infer/predictor.py device_close). The irregular half (CC labeling)
stays on host by design (SURVEY.md "hard parts").

cv2 parity, pinned in tests/test_infer.py: MORPH_CLOSE = dilate then erode;
cv2's morphologyDefaultBorderValue() makes out-of-image pixels a no-op for
each pass (-inf for dilate, +inf for erode), which here is padding False
into the max-pool and True into the min-pool. A k x k rect max/min is
separable, so each pass is two 1-D sweeps instead of a k^2 window.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _pool2d(mask: jnp.ndarray, k: int, comp, init: bool) -> jnp.ndarray:
    """Separable k x k sliding-window reduce over the last two axes."""
    pad = k // 2
    for axis in (mask.ndim - 2, mask.ndim - 1):
        window = [1] * mask.ndim
        window[axis] = k
        padding = [(0, 0)] * mask.ndim
        padding[axis] = (pad, pad)
        mask = lax.reduce_window(
            mask, jnp.asarray(init, mask.dtype), comp,
            tuple(window), (1,) * mask.ndim, tuple(padding),
        )
    return mask


def dilate(mask: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """Binary dilation with a rect kernel (cv2.dilate, BORDER no-op)."""
    return _pool2d(mask.astype(jnp.bool_), kernel_size, lax.max, False)


def erode(mask: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """Binary erosion with a rect kernel (cv2.erode, BORDER no-op)."""
    return _pool2d(mask.astype(jnp.bool_), kernel_size, lax.min, True)


def morph_close(mask: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """cv2.morphologyEx(mask, MORPH_CLOSE, k x k rect), bit-exact.

    ``mask``: bool [..., H, W]. Returns bool of the same shape.
    """
    return erode(dilate(mask, kernel_size), kernel_size)
