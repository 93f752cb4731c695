"""Host-side postprocess: identical outputs to the reference overlay.

Reimplements inference.py:48-146 — road-mask cleanup (5x5 rect MORPH_CLOSE +
keep-largest connected component), per-class recoloring, car contour boxes
with the heuristic distance label ``int(50 * (1 - y_bottom/H))``, and the
0.6/0.4 addWeighted blend. These ops are irregular/sequential (CC labeling,
contours) — they stay on host by design (SURVEY.md "hard parts"); argmax and
the nearest upscale already happened on device (tpuseg.infer.predictor).

Operates on BGR frames like the reference (its color_map is BGR because
frames come from cv2.VideoCapture).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from tpuseg.data.class_maps import COLOR_MAP_BGR

ROAD_CLASS = 1
CAR_CLASS = 2
# Reserved class-plane id for box/text strokes in the fused colorize+blend
# path: strokes are rasterized INTO the class plane (cv2 draws identically on
# 1-channel planes), then one LUT pass produces blend(frame, color-of-id) for
# every pixel — bit-identical to the reference's draw-on-overlay-then-
# addWeighted order because stroke pixels overwrite class ids exactly where
# they overwrote overlay colors. 254 cannot collide: class maps come from a
# 10-way argmax.
BOX_CLASS = 254
BOX_COLOR_BGR = (0, 255, 0)

_LUT_CACHE: Dict[float, np.ndarray] = {}
_PALETTE256: Optional[np.ndarray] = None


def _palette256() -> np.ndarray:
    """The 10-class palette extended to all 256 ids: unknown ids follow
    colorize()'s clamp-to-class-0 convention; BOX_CLASS is the stroke
    green."""
    global _PALETTE256
    if _PALETTE256 is None:
        pal = np.empty((256, 3), np.uint8)
        pal[:] = COLOR_MAP_BGR[0]
        pal[: len(COLOR_MAP_BGR)] = COLOR_MAP_BGR
        pal[BOX_CLASS] = BOX_COLOR_BGR
        _PALETTE256 = pal
    return _PALETTE256


def _blend_lut(alpha: float) -> np.ndarray:
    """[256,3,256] fused colorize+blend LUT over _palette256()."""
    from tpuseg.ops import native_post

    lut = _LUT_CACHE.get(alpha)
    if lut is None:
        lut = native_post.make_blend_lut(_palette256(), alpha)
        _LUT_CACHE[alpha] = lut
    return lut


def clean_road_mask(classes: np.ndarray, kernel_size: int = 5,
                    closed_road: Optional[np.ndarray] = None) -> np.ndarray:
    """Morph-close the road mask, keep only its largest connected component,
    and stamp it back into the class map (inference.py:73-110).

    ``closed_road``: the already-closed road mask (bool or 0/255 uint8) when
    the 5x5 close ran on device (Predictor device_close,
    tpuseg.ops.morphology — cv2-bit-exact); only the irregular CC step runs
    here."""
    import cv2

    if closed_road is not None:
        road = (np.asarray(closed_road) != 0).astype(np.uint8) * 255
    else:
        road = (classes == ROAD_CLASS).astype(np.uint8) * 255
        kernel = cv2.getStructuringElement(
            cv2.MORPH_RECT, (kernel_size, kernel_size)
        )
        road = cv2.morphologyEx(road, cv2.MORPH_CLOSE, kernel)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(
        road, connectivity=8, ltype=cv2.CV_32S
    )
    if n > 1:
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        road = np.where(labels == largest, np.uint8(255), np.uint8(0))
    cleaned = classes.copy()
    cleaned[road == 255] = ROAD_CLASS
    return cleaned


def _car_contour_boxes(classes: np.ndarray, min_area: float, frame_height: int):
    """[(x, y, w, h, distance_m)] of car contours with contourArea > min_area
    — the reference's exact filter (inference.py:116-141; cv2 contourArea,
    not pixel count, so thin/concave blobs filter identically)."""
    import cv2

    car_mask = (classes == CAR_CLASS).astype(np.uint8) * 255
    contours, _ = cv2.findContours(
        car_mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    boxes = []
    for contour in contours:
        if cv2.contourArea(contour) > min_area:
            x, y, w, hh = cv2.boundingRect(contour)
            boxes.append(
                (x, y, w, hh, int(50 * (1.0 - (y + hh) / frame_height)))
            )
    return boxes


def _draw_rects(target: np.ndarray, boxes, color) -> None:
    """Rasterize bbox outlines; identical geometry on BGR overlays
    (color=(0,255,0)) and 1-channel class planes (color=BOX_CLASS) — cv2
    rectangles don't depend on channel count and are crisp (no partial
    intensities), unlike glyphs."""
    import cv2

    for x, y, w, hh, _distance in boxes:
        cv2.rectangle(target, (x, y), (x + w, y + hh), color, 2)


def _draw_texts(target: np.ndarray, boxes, color, dx: int = 0, dy: int = 0
                ) -> None:
    """Rasterize the distance labels (anti-aliased glyphs) in box order,
    optionally offset into an ROI."""
    import cv2

    for x, y, _w, _hh, distance in boxes:
        cv2.putText(
            target,
            f"{distance}m",
            (x - dx, y - 5 - dy),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.5,
            color,
            1,
        )


def _draw_boxes(target: np.ndarray, boxes, color) -> None:
    """Boxes + labels in the reference's per-box order. For same-color
    strokes the (rect_i, text_i, rect_j, text_j, ...) interleaving and the
    (all rects, all texts) order are pixel-identical: overlapping strokes
    share one color, and glyph anti-aliasing composes over that color the
    same either way."""
    _draw_rects(target, boxes, color)
    _draw_texts(target, boxes, color)


def _repair_text_rois(result, frame_bgr, plane, boxes, alpha) -> None:
    """Exact re-blend of the distance-label regions for the fused path.

    Glyphs anti-alias against the overlay, so each label's region is redone
    the reference way on a tiny ROI: overlay = palette[plane] (the plane
    already carries every rect stroke), all labels drawn in box order, then
    the same double-precision rint blend as the LUT. ROIs are padded past
    the glyph raster and transitively merged, so every glyph lies fully
    inside its region — no glyph is ever clipped mid-raster (clipped
    anti-aliased rasterization is the one thing that could diverge)."""
    import cv2

    h, w = plane.shape
    rois = []
    for x, y, _bw, _bh, distance in boxes:
        (tw, th), base = cv2.getTextSize(
            f"{distance}m", cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1
        )
        x0, x1 = max(0, x - 3), min(w, x + tw + 3)
        y0, y1 = max(0, y - 5 - th - 3), min(h, y - 5 + base + 3)
        if x0 < x1 and y0 < y1:
            rois.append((x0, y0, x1, y1))
    # transitive merge of intersecting ROIs
    merged = []
    for r in rois:
        changed = True
        while changed:
            changed = False
            for m in merged:
                if r[0] < m[2] and m[0] < r[2] and r[1] < m[3] and m[1] < r[3]:
                    merged.remove(m)
                    r = (min(r[0], m[0]), min(r[1], m[1]),
                         max(r[2], m[2]), max(r[3], m[3]))
                    changed = True
                    break
        merged.append(r)
    pal = _palette256()
    for x0, y0, x1, y1 in merged:
        ov = pal[plane[y0:y1, x0:x1]]
        # draw every label (cv2 clips fully-outside glyphs to nothing;
        # partially-overlapping glyphs cannot exist after the merge)
        _draw_texts(ov, boxes, BOX_COLOR_BGR, dx=x0, dy=y0)
        mix = (
            frame_bgr[y0:y1, x0:x1].astype(np.float64) * (1.0 - alpha)
            + ov.astype(np.float64) * alpha
        )
        result[y0:y1, x0:x1] = np.clip(np.rint(mix), 0, 255).astype(np.uint8)


def detect_cars(
    overlay: np.ndarray,
    classes: np.ndarray,
    min_area: float = 300.0,
    frame_height: int = 0,
) -> int:
    """Draw green bboxes + distance labels on ``overlay``; return car count
    (inference.py:116-141)."""
    boxes = _car_contour_boxes(
        classes, min_area, frame_height or overlay.shape[0]
    )
    _draw_boxes(overlay, boxes, BOX_COLOR_BGR)
    return len(boxes)


def colorize(classes: np.ndarray) -> np.ndarray:
    """Class map -> BGR color image via single palette gather (replaces the
    reference's 10-pass per-class assignment loop, inference.py:109-113).

    Uses the native C++ LUT when built (10x faster than numpy fancy
    indexing at 720p: 1.2ms vs 12ms on this host); identical output.
    """
    from tpuseg.ops import native_post

    if native_post.available():
        return native_post.colorize(classes, COLOR_MAP_BGR)
    return COLOR_MAP_BGR[classes]


def blend(frame_bgr: np.ndarray, overlay: np.ndarray, alpha: float) -> np.ndarray:
    """cv2.addWeighted(frame, 1-a, overlay, a, 0) — native C++ when built
    (bit-exact at the reference's alpha=0.4), cv2 otherwise."""
    from tpuseg.ops import native_post

    if native_post.available():
        return native_post.blend(frame_bgr, overlay, alpha)
    import cv2

    return cv2.addWeighted(frame_bgr, 1.0 - alpha, overlay, alpha, 0)


def overlay_predictions(
    frame_bgr: np.ndarray,
    classes: np.ndarray,
    road_cleanup: bool = True,
    car_boxes: bool = True,
    min_car_area: float = 300.0,
    blend_alpha: float = 0.4,
    precolored_bgr: np.ndarray = None,
    closed_road: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Dict[str, int]]:
    """frame [H,W,3] BGR + class map [H,W] -> (blended frame, {'cars': n}).

    Bitwise-equivalent output to the reference pipeline given the same class
    map (verified in tests/test_infer.py against a literal transcription of
    inference.py:48-146).

    ``precolored_bgr``: the overlay already colorized (on device, by the
    Pallas fused argmax+colorize kernel) from the PRE-cleanup class map. The
    road-cleanup only ever turns pixels INTO road, so the host fix-up is a
    single masked store of the road color — identical output to colorizing
    the cleaned map.
    """
    if road_cleanup:
        cleaned = clean_road_mask(classes, closed_road=closed_road)
    else:
        cleaned = classes
    if precolored_bgr is None:
        from tpuseg.ops import native_post

        if native_post.has_colorize_blend():
            # Fused path: never materialize the full-frame BGR overlay. Box
            # outlines (crisp, single-color) are stroked into the class
            # plane as BOX_CLASS, then ONE C++ LUT pass yields
            # blend(frame, color-of-class) per pixel — bit-identical to
            # colorize -> draw -> addWeighted (the LUT bakes the same
            # double-precision rounding; rect strokes overwrite ids exactly
            # where they overwrote colors). Distance labels anti-alias to
            # partial intensities, which a class plane cannot carry, so the
            # few small text regions are re-blended exactly afterwards.
            # ~1/3 the memory traffic of the three-pass chain on the 1-core
            # host.
            boxes = []
            if car_boxes:
                boxes = _car_contour_boxes(
                    cleaned, min_car_area, frame_bgr.shape[0]
                )
            if boxes:
                plane = cleaned.copy() if cleaned is classes else cleaned
                _draw_rects(plane, boxes, int(BOX_CLASS))
            else:
                plane = cleaned
            result = native_post.colorize_blend(
                frame_bgr, plane, _blend_lut(blend_alpha)
            )
            if boxes:
                _repair_text_rois(
                    result, frame_bgr, plane, boxes, blend_alpha
                )
            return result, {"cars": len(boxes)}
    if precolored_bgr is not None:
        overlay = precolored_bgr
        if road_cleanup:
            changed = cleaned != classes
            overlay = overlay.copy()
            overlay[changed] = COLOR_MAP_BGR[ROAD_CLASS]
        classes = cleaned
        return _finish(frame_bgr, classes, overlay, car_boxes, min_car_area,
                       blend_alpha)
    classes = cleaned
    overlay = colorize(classes)
    return _finish(frame_bgr, classes, overlay, car_boxes, min_car_area,
                   blend_alpha)


def _finish(frame_bgr, classes, overlay, car_boxes, min_car_area, blend_alpha):
    detected = {"cars": 0}
    if car_boxes:
        detected["cars"] = detect_cars(
            overlay, classes, min_area=min_car_area, frame_height=frame_bgr.shape[0]
        )
    result = blend(frame_bgr, overlay, blend_alpha)
    return result, detected
