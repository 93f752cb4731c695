"""ctypes bindings for the native postprocess library (native/postprocess.cpp).

The host-side runtime tier: morphological close, connected components,
keep-largest, component bounding boxes, palette colorize, and blend — the
exact op set the reference runs through OpenCV per frame (inference.py:76-144)
— as a dependency-free C++ .so. On the single-core TPU host these run in the
writer thread racing the video decoder, so they are the host hot path.

``available()`` is False when the library hasn't been built
(``make -C native``); callers fall back to cv2 (tpuseg.infer.postprocess
keeps identical semantics either way).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libtpuseg_post.so"),
    os.path.join(os.path.dirname(__file__), "libtpuseg_post.so"),
)

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = _bind(ctypes.CDLL(os.path.abspath(p)))
            except (OSError, AttributeError):
                # stale/partial .so (missing symbols, wrong arch): take the
                # cv2 fallback instead of crashing callers of available()
                continue
            _LIB = lib
            break
    return _LIB


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare every entry point's signature; raises AttributeError on a
    stale .so missing one (caught by _load -> cv2 fallback)."""
    lib.tpuseg_morph_close.argtypes = [
        _u8p, _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int
    ]
    lib.tpuseg_keep_largest.restype = ctypes.c_int32
    lib.tpuseg_keep_largest.argtypes = [
        _u8p, _u8p, ctypes.c_int, ctypes.c_int
    ]
    lib.tpuseg_label_components.restype = ctypes.c_int32
    lib.tpuseg_label_components.argtypes = [
        _u8p, _i32p, ctypes.c_int, ctypes.c_int
    ]
    lib.tpuseg_component_boxes.restype = ctypes.c_int32
    lib.tpuseg_component_boxes.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int32,
        _i32p, ctypes.c_int32,
    ]
    lib.tpuseg_clean_road.restype = ctypes.c_int32
    lib.tpuseg_clean_road.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_uint8, ctypes.c_int
    ]
    lib.tpuseg_colorize.argtypes = [
        _u8p, _u8p, ctypes.c_int, _u8p, ctypes.c_int, ctypes.c_int
    ]
    lib.tpuseg_blend.argtypes = [
        _u8p, _u8p, _u8p, ctypes.c_int, ctypes.c_float
    ]
    if hasattr(lib, "tpuseg_colorize_blend"):
        lib.tpuseg_colorize_blend.argtypes = [
            _u8p, _u8p, _u8p, _u8p, ctypes.c_int
        ]
    return lib


def available() -> bool:
    return _load() is not None


def morph_close(mask: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    """Binary close with a kernel_size x kernel_size rect kernel (0/255 in,
    0/255 out)."""
    lib = _load()
    assert lib is not None
    assert kernel_size % 2 == 1, (
        "kernel_size must be odd: the C++ close uses a symmetric radius, "
        "an even size would silently run (k+1)x(k+1) while the cv2 "
        "fallback uses a true k x k kernel")
    mask = np.ascontiguousarray(mask, np.uint8)
    out = np.empty_like(mask)
    lib.tpuseg_morph_close(
        mask, out, mask.shape[0], mask.shape[1], kernel_size // 2
    )
    return out


def label_components(mask: np.ndarray) -> Tuple[int, np.ndarray]:
    lib = _load()
    assert lib is not None
    mask = np.ascontiguousarray(mask, np.uint8)
    labels = np.empty(mask.shape, np.int32)
    n = lib.tpuseg_label_components(mask, labels, mask.shape[0], mask.shape[1])
    return int(n), labels


def keep_largest(mask: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    mask = np.ascontiguousarray(mask, np.uint8)
    out = np.empty_like(mask)
    lib.tpuseg_keep_largest(mask, out, mask.shape[0], mask.shape[1])
    return out


def component_boxes(
    mask: np.ndarray, min_area: int = 300, max_boxes: int = 256
) -> List[Tuple[int, int, int, int, int]]:
    """[(x, y, w, h, area)] of 8-connected components with area > min_area."""
    lib = _load()
    assert lib is not None
    mask = np.ascontiguousarray(mask, np.uint8)
    boxes = np.zeros((max_boxes, 5), np.int32)
    n = lib.tpuseg_component_boxes(
        mask, mask.shape[0], mask.shape[1], min_area, boxes, max_boxes
    )
    return [tuple(int(v) for v in row) for row in boxes[:n]]


def clean_road(classes: np.ndarray, road_class: int = 1, kernel_size: int = 5
               ) -> np.ndarray:
    """Fused close + keep-largest + stamp, C++ single pass; returns new map."""
    lib = _load()
    assert lib is not None
    assert kernel_size % 2 == 1, "kernel_size must be odd (see morph_close)"
    out = np.ascontiguousarray(classes, np.uint8).copy()
    lib.tpuseg_clean_road(
        out, out.shape[0], out.shape[1], road_class, kernel_size // 2
    )
    return out


def colorize(classes: np.ndarray, palette: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    classes = np.ascontiguousarray(classes, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    out = np.empty((*classes.shape, 3), np.uint8)
    lib.tpuseg_colorize(
        classes, palette, palette.shape[0], out,
        classes.shape[0], classes.shape[1],
    )
    return out


def blend(a: np.ndarray, b: np.ndarray, alpha: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    if a.shape != b.shape:
        raise ValueError(f"blend: shape mismatch {a.shape} vs {b.shape}")
    out = np.empty_like(a)
    lib.tpuseg_blend(a, b, out, a.size, alpha)
    return out


def has_colorize_blend() -> bool:
    """True when the loaded library carries the fused colorize+blend entry
    (older committed .so files may predate it)."""
    lib = _load()
    return lib is not None and hasattr(lib, "tpuseg_colorize_blend")


def make_blend_lut(palette256: np.ndarray, alpha: float) -> np.ndarray:
    """[256, 3, 256] uint8 LUT: lut[c, ch, v] = blend byte of frame value v
    against palette color c — clip(rint(v*(1-alpha) + palette*alpha)),
    computed in double with round-half-to-even, the exact expression of
    tpuseg_blend/cv2.addWeighted. np.rint rounds half to even like
    nearbyint, so lut-composed output is bit-identical to
    blend(frame, colorize(classes))."""
    assert palette256.shape == (256, 3)
    v = np.arange(256, dtype=np.float64)
    p = palette256.astype(np.float64)  # [256, 3]
    mix = v[None, None, :] * (1.0 - alpha) + p[:, :, None] * alpha
    return np.clip(np.rint(mix), 0, 255).astype(np.uint8)


def colorize_blend(
    frame_bgr: np.ndarray, classes: np.ndarray, lut: np.ndarray
) -> np.ndarray:
    """Fused out = blend(frame, palette[classes]) in one C++ pass.

    ``lut`` from make_blend_lut. Replaces the reference's recolor-then-
    addWeighted chain (inference.py:109-144) with a single memory pass."""
    lib = _load()
    assert lib is not None
    frame_bgr = np.ascontiguousarray(frame_bgr, np.uint8)
    classes = np.ascontiguousarray(classes, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    # validate BEFORE handing pointers to C++: a model-res class map with a
    # video-res frame would write past the output buffer (heap corruption),
    # where the cv2 fallback raises a broadcast error
    if frame_bgr.shape[:-1] != classes.shape or frame_bgr.shape[-1] != 3:
        raise ValueError(
            f"colorize_blend: frame {frame_bgr.shape} does not match "
            f"classes {classes.shape} (upscale the class map first)")
    if lut.shape != (256, 3, 256):
        raise ValueError(f"colorize_blend: lut must be (256, 3, 256), "
                         f"got {lut.shape}")
    out = np.empty_like(frame_bgr)
    lib.tpuseg_colorize_blend(
        frame_bgr, classes, lut, out, classes.size
    )
    return out
