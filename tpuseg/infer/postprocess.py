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

from typing import Dict, Tuple

import numpy as np

from tpuseg.data.class_maps import COLOR_MAP_BGR

ROAD_CLASS = 1
CAR_CLASS = 2


def clean_road_mask(classes: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    """Morph-close the road mask, keep only its largest connected component,
    and stamp it back into the class map (inference.py:73-110)."""
    import cv2

    road = (classes == ROAD_CLASS).astype(np.uint8) * 255
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (kernel_size, kernel_size))
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


def detect_cars(
    overlay: np.ndarray,
    classes: np.ndarray,
    min_area: float = 300.0,
    frame_height: int = 0,
) -> int:
    """Draw green bboxes + distance labels on ``overlay``; return car count
    (inference.py:116-141)."""
    import cv2

    h = frame_height or overlay.shape[0]
    car_mask = (classes == CAR_CLASS).astype(np.uint8) * 255
    contours, _ = cv2.findContours(
        car_mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    count = 0
    for contour in contours:
        if cv2.contourArea(contour) > min_area:
            x, y, w, hh = cv2.boundingRect(contour)
            cv2.rectangle(overlay, (x, y), (x + w, y + hh), (0, 255, 0), 2)
            distance = int(50 * (1.0 - (y + hh) / h))
            cv2.putText(
                overlay,
                f"{distance}m",
                (x, y - 5),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.5,
                (0, 255, 0),
                1,
            )
            count += 1
    return count


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
        cleaned = clean_road_mask(classes)
    else:
        cleaned = classes
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
