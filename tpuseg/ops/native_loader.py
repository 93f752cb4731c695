"""ctypes bindings for the native batch loader (native/loader.cpp).

One GIL-free memcpy gather per batch from the packed dataset's memmaps,
replacing the Python per-sample loop (memmap slice -> copy -> buffer
store). On the one-core host this keeps the producer thread from
contending with the consumer for the interpreter. ``available()`` is
False when the library hasn't been built (``make -C native``); callers
fall back to numpy with identical output.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libtpuseg_loader.so"),
    os.path.join(os.path.dirname(__file__), "libtpuseg_loader.so"),
)

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(os.path.abspath(p))
                lib.tpuseg_gather2.restype = ctypes.c_int64
                lib.tpuseg_gather2.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64,  # img src, bytes/sample
                    ctypes.c_void_p, ctypes.c_int64,  # msk src, bytes/sample
                    _i64p, ctypes.c_int64,            # indices, n
                    _u8p, _u8p,                       # img out, msk out
                ]
            except (OSError, AttributeError):
                continue  # unloadable / wrong-ABI library: try next path
            if _self_test(lib):
                _LIB = lib
                break
    return _LIB


def _self_test(lib: ctypes.CDLL) -> bool:
    """Tiny known-answer gather before trusting a committed binary —
    catches a stale/incompatible library (the build is portable -O3, so a
    loadable library should always pass; this guards the fallback path)."""
    try:
        img = np.arange(6, dtype=np.uint8).reshape(2, 3)
        msk = np.arange(4, dtype=np.uint8).reshape(2, 2)
        img_out = np.zeros((1, 3), np.uint8)
        msk_out = np.zeros((1, 2), np.uint8)
        idx = np.asarray([1], np.int64)
        lib.tpuseg_gather2(
            img.ctypes.data, 3, msk.ctypes.data, 2, idx, 1, img_out, msk_out
        )
        return bool(
            np.array_equal(img_out[0], img[1])
            and np.array_equal(msk_out[0], msk[1])
        )
    except Exception:
        return False


def available() -> bool:
    return _load() is not None


def gather2(
    images: np.ndarray,
    masks: np.ndarray,
    indices: np.ndarray,
    img_out: np.ndarray,
    msk_out: np.ndarray,
) -> None:
    """Copy images[indices] -> img_out and masks[indices] -> msk_out.

    ``images``/``masks`` may be np.memmap; outputs must be C-contiguous
    uint8 with the batch as the leading dim.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native loader unavailable — check available() and take the "
            "numpy fallback (make -C native builds it)")
    if not (hasattr(images, "ctypes") and hasattr(masks, "ctypes")):
        # a None pointer would send C memcpy reading from address
        # idx*img_bytes — segfault, not a Python error
        raise TypeError("gather2 requires ndarray/memmap inputs")
    n = int(indices.shape[0])
    img_bytes = int(np.prod(images.shape[1:]))
    msk_bytes = int(np.prod(masks.shape[1:]))
    if img_out.shape[0] < n or msk_out.shape[0] < n:
        raise ValueError("gather2: output batch smaller than indices")
    idx = np.ascontiguousarray(indices, np.int64)
    # ctypes.c_void_p from the memmap's buffer (no copy)
    lib.tpuseg_gather2(
        images.ctypes.data, img_bytes, masks.ctypes.data, msk_bytes,
        idx, n, img_out, msk_out,
    )
