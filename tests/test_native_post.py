"""Native C++ postprocess vs cv2 golden behavior (built via `make -C native`)."""

import numpy as np
import pytest

from tpuseg.ops import native_post

cv2 = pytest.importorskip("cv2")

if not native_post.available():
    pytest.skip("libtpuseg_post.so not built (make -C native)",
                allow_module_level=True)


@pytest.fixture
def masks(rng):
    out = []
    for _ in range(5):
        m = (rng.rand(90, 160) > 0.8).astype(np.uint8) * 255
        m[40:70, 30:100] = 255   # a big blob
        m[42:45, 50:60] = 0      # crack inside it
        out.append(m)
    return out


def test_morph_close_matches_cv2(masks):
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    for m in masks:
        ref = cv2.morphologyEx(m, cv2.MORPH_CLOSE, kernel)
        ours = native_post.morph_close(m, 5)
        np.testing.assert_array_equal(ours, ref)


def test_keep_largest_matches_cv2(masks):
    for m in masks:
        n, labels, stats, _ = cv2.connectedComponentsWithStats(
            m, connectivity=8, ltype=cv2.CV_32S
        )
        if n <= 1:
            continue
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        ref = np.where(labels == largest, np.uint8(255), np.uint8(0))
        ours = native_post.keep_largest(m)
        np.testing.assert_array_equal(ours, ref)


def test_component_count_matches_cv2(masks):
    for m in masks:
        n_ref, *_ = cv2.connectedComponentsWithStats(m, connectivity=8,
                                                     ltype=cv2.CV_32S)
        n_ours, labels = native_post.label_components(m)
        assert n_ours == n_ref - 1  # cv2 counts background as a component
        assert labels.max() == n_ours
        # labeled pixels exactly the foreground
        np.testing.assert_array_equal(labels > 0, m > 0)


def test_component_boxes_match_cv2_rects(rng):
    classes = np.zeros((120, 200), np.uint8)
    classes[30:60, 50:90] = 255     # area 1200
    classes[10:14, 100:106] = 255   # area 24 (filtered)
    classes[20:40, 150:190] = 255   # area 800
    boxes = native_post.component_boxes(classes, min_area=300)
    got = sorted((x, y, w, h) for x, y, w, h, _ in boxes)
    contours, _ = cv2.findContours(classes, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    ref = sorted(
        cv2.boundingRect(c) for c in contours if cv2.contourArea(c) > 300
    )
    assert got == ref


def test_clean_road_matches_python_reference(masks):
    from tpuseg.infer.postprocess import clean_road_mask

    rng = np.random.RandomState(3)
    classes = rng.randint(0, 3, (90, 160)).astype(np.uint8)
    ref = clean_road_mask(classes)          # cv2 path
    ours = native_post.clean_road(classes)  # C++ fused path
    np.testing.assert_array_equal(ours, ref)


def test_colorize_and_blend(rng):
    from tpuseg.data.class_maps import COLOR_MAP_BGR

    classes = rng.randint(0, 10, (60, 80)).astype(np.uint8)
    ours = native_post.colorize(classes, COLOR_MAP_BGR)
    np.testing.assert_array_equal(ours, COLOR_MAP_BGR[classes])

    a = rng.randint(0, 255, (60, 80, 3)).astype(np.uint8)
    b = rng.randint(0, 255, (60, 80, 3)).astype(np.uint8)
    ref = cv2.addWeighted(a, 0.6, b, 0.4, 0)
    ours = native_post.blend(a, b, 0.4)
    # addWeighted uses round-half-away; allow off-by-one at rounding edges
    assert int(np.abs(ours.astype(int) - ref.astype(int)).max()) <= 1


def test_native_gather_matches_numpy(tmp_path):
    """libtpuseg_loader gather2 == numpy fancy indexing, bytes-exact."""
    from tpuseg.ops import native_loader

    if not native_loader.available():
        pytest.skip("native loader not built")
    rng = np.random.RandomState(0)
    images = np.ascontiguousarray(rng.randint(0, 255, (10, 6, 8, 3), np.uint8))
    masks = np.ascontiguousarray(rng.randint(0, 9, (10, 6, 8), np.uint8))
    idx = np.asarray([7, 0, 3, 3, 9], np.int64)
    img_out = np.empty((5, 6, 8, 3), np.uint8)
    msk_out = np.empty((5, 6, 8), np.uint8)
    native_loader.gather2(images, masks, idx, img_out, msk_out)
    np.testing.assert_array_equal(img_out, images[idx])
    np.testing.assert_array_equal(msk_out, masks[idx])


# ---------------------------------------------------------------------------
# Fused colorize+blend (single LUT pass) vs the three-pass fallback.


def _overlay_both_paths(frame, classes, **kw):
    """(fused result, fallback result, fused dets, fallback dets)."""
    from tpuseg.infer import postprocess as pp

    fused, d1 = pp.overlay_predictions(frame, classes, **kw)
    orig = native_post.has_colorize_blend
    native_post.has_colorize_blend = lambda: False
    try:
        fb, d2 = pp.overlay_predictions(frame, classes, **kw)
    finally:
        native_post.has_colorize_blend = orig
    return fused, fb, d1, d2


@pytest.mark.skipif(not native_post.has_colorize_blend(),
                    reason="library predates tpuseg_colorize_blend")
def test_blend_lut_matches_addweighted(rng):
    """LUT entries reproduce cv2.addWeighted's double-precision rounding."""
    from tpuseg.data.class_maps import COLOR_MAP_BGR

    classes = rng.randint(0, 10, (70, 110)).astype(np.uint8)
    frame = rng.randint(0, 256, (70, 110, 3)).astype(np.uint8)
    overlay = COLOR_MAP_BGR[classes]
    ref = cv2.addWeighted(frame, 0.6, overlay, 0.4, 0)
    lut = native_post.make_blend_lut(
        np.vstack([COLOR_MAP_BGR,
                   np.tile(COLOR_MAP_BGR[0], (256 - len(COLOR_MAP_BGR), 1))]
                  ).astype(np.uint8), 0.4)
    np.testing.assert_array_equal(
        native_post.colorize_blend(frame, classes, lut), ref)


@pytest.mark.skipif(not native_post.has_colorize_blend(),
                    reason="library predates tpuseg_colorize_blend")
def test_fused_overlay_bitexact_vs_fallback(rng):
    """The fused LUT path must be byte-identical to the colorize->draw->
    addWeighted chain, including anti-aliased labels (repaired per-ROI),
    overlapping labels (merged ROIs), labels clipped at the frame edge,
    and frames with no detections."""
    # overlapping labels: three cars close together
    c = np.zeros((100, 160), np.uint8)
    c[30:60, 10:50] = 2
    c[32:62, 55:95] = 2
    c[40:70, 100:140] = 2
    f = rng.randint(0, 256, (100, 160, 3)).astype(np.uint8)
    fused, fb, d1, d2 = _overlay_both_paths(f, c)
    np.testing.assert_array_equal(fused, fb)
    assert d1 == d2 == {"cars": 3}

    # label clipped at the top edge (text org y-5 above the frame)
    c = np.zeros((80, 160), np.uint8)
    c[2:40, 20:80] = 2
    f = rng.randint(0, 256, (80, 160, 3)).astype(np.uint8)
    fused, fb, d1, d2 = _overlay_both_paths(f, c)
    np.testing.assert_array_equal(fused, fb)
    assert d1 == d2 == {"cars": 1}

    # no detections; road_cleanup both on and off (off must not mutate input)
    c = np.zeros((60, 80), np.uint8)
    c[30:, :] = 1
    f = rng.randint(0, 256, (60, 80, 3)).astype(np.uint8)
    for cleanup in (True, False):
        keep = c.copy()
        fused, fb, _, _ = _overlay_both_paths(f, c, road_cleanup=cleanup)
        np.testing.assert_array_equal(fused, fb)
        np.testing.assert_array_equal(c, keep)

    # random class soup stress
    for _ in range(10):
        cs = rng.randint(0, 10, (90, 150)).astype(np.uint8)
        fr = rng.randint(0, 256, (90, 150, 3)).astype(np.uint8)
        fused, fb, d1, d2 = _overlay_both_paths(fr, cs)
        np.testing.assert_array_equal(fused, fb)
        assert d1 == d2
