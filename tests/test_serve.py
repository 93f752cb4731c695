"""tools/serve.py — the HTTP serving daemon around the Predictor.

The reference serves by running inference.py over a video; serve.py is the
request/response production surface. These tests boot the real server on an
ephemeral port and exercise every endpoint through actual HTTP.
"""

import importlib.util
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_serve():
    spec = importlib.util.spec_from_file_location(
        "tpuseg_tool_serve", os.path.join(ROOT, "tools", "serve.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def server():
    import cv2  # noqa: F401  (skip cleanly if opencv is absent)

    serve = _load_serve()
    ns = type("A", (), {})()
    ns.checkpoint = ""
    ns.artifact = ""
    ns.model = "unet"
    ns.num_classes = 10
    ns.base_filters = 4
    ns.width = 64
    ns.height = 32
    ns.bf16_head = False
    ns.normalize_mean = ""
    ns.normalize_std = ""
    ns.host = "127.0.0.1"
    ns.port = 0  # ephemeral
    ns.max_batch = 1
    ns.batch_wait_ms = 5.0
    httpd, state = serve.make_server(ns)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    host, port = httpd.server_address[:2]
    yield f"http://{host}:{port}", state
    httpd.shutdown()
    httpd.server_close()
    thread.join(timeout=10)


def _png_frame(seed=0, h=48, w=80):
    import cv2

    rng = np.random.default_rng(seed)
    frame_bgr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    ok, png = cv2.imencode(".png", frame_bgr)
    assert ok
    return frame_bgr, png.tobytes()


def _post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, headers=headers or {})
    return urllib.request.urlopen(req, timeout=120)


def test_healthz(server):
    base, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        assert r.status == 200
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["input_hw"] == [32, 64]


def test_predict_png_matches_direct_predictor(server):
    import cv2

    base, state = server
    frame_bgr, png = _png_frame(seed=1)
    with _post(base + "/predict", png) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "image/png"
        mask = cv2.imdecode(
            np.frombuffer(r.read(), np.uint8), cv2.IMREAD_UNCHANGED
        )
    assert mask.shape == frame_bgr.shape[:2]
    assert mask.dtype == np.uint8
    assert mask.max() < 10
    rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
    direct = state.predictor(rgb[None])[0]
    np.testing.assert_array_equal(mask, direct)


def test_predict_json_counts(server):
    base, _ = server
    frame_bgr, png = _png_frame(seed=2)
    with _post(base + "/predict?format=json", png) as r:
        out = json.loads(r.read())
    assert out["shape"] == list(frame_bgr.shape[:2])
    assert len(out["class_pixel_counts"]) == 10
    assert sum(out["class_pixel_counts"]) == frame_bgr.shape[0] * frame_bgr.shape[1]


def test_overlay_and_car_header(server):
    import cv2

    base, _ = server
    frame_bgr, png = _png_frame(seed=3)
    with _post(base + "/overlay", png) as r:
        assert r.status == 200
        assert "X-Cars" in r.headers
        blended = cv2.imdecode(
            np.frombuffer(r.read(), np.uint8), cv2.IMREAD_COLOR
        )
    assert blended.shape == frame_bgr.shape
    assert int(r.headers["X-Cars"]) >= 0


def test_raw_upload_and_raw_response(server):
    """Codec-wall bypass: raw octet-stream upload (X-Shape) and format=raw
    responses carry the same pixels as the PNG round trip."""
    import cv2

    base, state = server
    frame_bgr, png = _png_frame(seed=11)
    with _post(base + "/predict", png) as r:
        ref_mask = cv2.imdecode(
            np.frombuffer(r.read(), np.uint8), cv2.IMREAD_UNCHANGED
        )
    h, w = frame_bgr.shape[:2]
    headers = {"Content-Type": "application/octet-stream",
               "X-Shape": f"{h},{w},3"}
    with _post(base + "/predict?format=raw", frame_bgr.tobytes(),
               headers) as r:
        assert r.headers["Content-Type"] == "application/octet-stream"
        shape = tuple(int(v) for v in r.headers["X-Shape"].split(","))
        raw_mask = np.frombuffer(r.read(), np.uint8).reshape(shape)
    np.testing.assert_array_equal(raw_mask, ref_mask)
    # rgb upload declares itself via X-Pixel-Format
    rgb = frame_bgr[..., ::-1].copy()
    headers_rgb = dict(headers, **{"X-Pixel-Format": "rgb"})
    with _post(base + "/predict?format=raw", rgb.tobytes(),
               headers_rgb) as r:
        shape = tuple(int(v) for v in r.headers["X-Shape"].split(","))
        rgb_mask = np.frombuffer(r.read(), np.uint8).reshape(shape)
    np.testing.assert_array_equal(rgb_mask, ref_mask)
    # a bad shape header is a 400, not a crash
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict", frame_bgr.tobytes(),
              {"Content-Type": "application/octet-stream",
               "X-Shape": "nope"})
    assert e.value.code == 400


def test_overlay_jpeg_and_raw_formats(server):
    import cv2

    base, _ = server
    frame_bgr, png = _png_frame(seed=12)
    with _post(base + "/overlay", png) as r:
        ref = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                           cv2.IMREAD_COLOR)
    with _post(base + "/overlay?format=raw", png) as r:
        assert r.headers["Content-Type"] == "application/octet-stream"
        shape = tuple(int(v) for v in r.headers["X-Shape"].split(","))
        raw = np.frombuffer(r.read(), np.uint8).reshape(shape)
    np.testing.assert_array_equal(raw, ref)  # raw == png-decoded, bit-exact
    with _post(base + "/overlay?format=jpeg&quality=80", png) as r:
        assert r.headers["Content-Type"] == "image/jpeg"
        jpg = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                           cv2.IMREAD_COLOR)
    assert jpg.shape == ref.shape  # lossy but decodable at the right size
    # lossy class masks are refused
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict?format=jpeg", png)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/overlay?format=bmp", png)
    assert e.value.code == 400


def test_bad_body_and_unknown_path(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict", b"this is not an image")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/nope", b"x")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(base + "/predict", timeout=60)  # GET
    assert e.value.code == 404


def test_any_upload_size_single_program(server):
    """Host preprocess makes the device program upload-size independent —
    a second, different-size upload must not require a new compile (the
    jit cache stays at one entry)."""
    base, state = server
    n_before = len(state.predictor._jitted)
    for seed, (h, w) in ((4, (30, 50)), (5, (100, 160))):
        _, png = _png_frame(seed=seed, h=h, w=w)
        with _post(base + "/predict", png) as r:
            assert r.status == 200
    assert len(state.predictor._jitted) == n_before == 1


@pytest.fixture(scope="module")
def batched_server():
    import cv2  # noqa: F401

    serve = _load_serve()
    ns = type("A", (), {})()
    ns.checkpoint = ""
    ns.artifact = ""
    ns.model = "unet"
    ns.num_classes = 10
    ns.base_filters = 4
    ns.width = 64
    ns.height = 32
    ns.bf16_head = False
    ns.normalize_mean = ""
    ns.normalize_std = ""
    ns.host = "127.0.0.1"
    ns.port = 0
    ns.max_batch = 4
    # Wide window so concurrent posts coalesce even when this 1-core host
    # schedules the posting threads far apart. Costs nothing when all 4
    # arrive (the collator dispatches as soon as max_batch is reached).
    ns.batch_wait_ms = 2000.0
    httpd, state = serve.make_server(ns)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    host, port = httpd.server_address[:2]
    yield f"http://{host}:{port}", state
    httpd.shutdown()
    httpd.server_close()
    thread.join(timeout=10)


def test_batched_requests_coalesce_and_match_direct(batched_server):
    """Concurrent posts of DIFFERENT upload sizes coalesce into shared
    dispatches and every mask equals the direct batch-1 Predictor result."""
    import cv2

    base, state = batched_server
    frames = [_png_frame(seed=10 + i, h=40 + 8 * i, w=64 + 16 * i)
              for i in range(4)]
    results = [None] * 4

    def post(i):
        with _post(base + "/predict", frames[i][1]) as r:
            results[i] = cv2.imdecode(
                np.frombuffer(r.read(), np.uint8), cv2.IMREAD_UNCHANGED
            )

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)

    for i, (frame_bgr, _) in enumerate(frames):
        assert results[i] is not None
        assert results[i].shape == frame_bgr.shape[:2]
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        direct = state.predictor(rgb[None])[0]
        np.testing.assert_array_equal(results[i], direct)

    b = state.batcher
    assert b is not None
    # 4 requests inside a 2 s window on this host must share dispatches
    assert b.max_seen >= 2
    assert b.dispatches < 4 + 1  # +1: the direct calls above don't count


def test_batched_healthz_reports_batching(batched_server):
    base, _ = batched_server
    # Drive one request through the collator first so the test holds when
    # run in isolation (warm_up() calls the predictor directly and does
    # not count as a dispatch).
    with _post(base + "/predict", _png_frame(seed=99, h=32, w=64)[1]) as r:
        assert r.status == 200
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        info = json.loads(r.read())
    assert info["batching"]["max_batch"] == 4
    assert info["batching"]["dispatches"] >= 1


def test_unbatched_predictor_failure_returns_500_json(server):
    """Any exception from the direct (max_batch=1) inference path must come
    back as a 500 JSON body, not a dropped connection (ADVICE r2: only
    RuntimeError was caught; the batched path already wrapped everything)."""
    url, state = server
    _, png = _png_frame(seed=9)
    orig = state.infer_model_sized

    def boom(x):
        raise ValueError("synthetic predictor failure")

    state.infer_model_sized = boom
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url + "/predict", png)
        assert ei.value.code == 500
        body = json.loads(ei.value.read())
        assert "ValueError" in body["error"]
        assert "synthetic predictor failure" in body["error"]
    finally:
        state.infer_model_sized = orig
    # the server is still alive and serving after the failure
    with _post(url + "/predict", png) as resp:
        assert resp.status == 200
