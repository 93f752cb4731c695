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
