"""Inference stack: postprocess parity with the reference, batched pipeline."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpuseg.configs import ModelConfig
from tpuseg.data.class_maps import COLOR_MAP_BGR
from tpuseg.infer.postprocess import clean_road_mask, overlay_predictions
from tpuseg.infer.predictor import Predictor
from tpuseg.infer.video import VideoPipeline


def _reference_overlay(image, predicted_class):
    """Literal transcription of the reference's postprocess semantics
    (inference.py:48-146) given an already-argmaxed class map, used as the
    golden implementation for byte-equality."""
    color_map = {i: COLOR_MAP_BGR[i].tolist() for i in range(10)}
    road_mask = (predicted_class == 1).astype(np.uint8) * 255
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    road_mask = cv2.morphologyEx(road_mask, cv2.MORPH_CLOSE, kernel)
    ccs = cv2.connectedComponentsWithStats(road_mask, connectivity=8,
                                           ltype=cv2.CV_32S)
    labels, stats = ccs[1], ccs[2]
    if len(stats) > 1:
        largest = 1 + np.argmax(stats[1:, cv2.CC_STAT_AREA])
        cleaned = np.zeros_like(road_mask)
        cleaned[labels == largest] = 255
        road_mask = cleaned
    cleaned_class = predicted_class.copy()
    cleaned_class[road_mask == 255] = 1
    overlay = image.copy()
    for class_idx, color in color_map.items():
        overlay[cleaned_class == class_idx] = color
    car_mask = (cleaned_class == 2).astype(np.uint8) * 255
    contours, _ = cv2.findContours(car_mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    n_cars = 0
    for contour in contours:
        if cv2.contourArea(contour) > 300:
            x, y, w, h = cv2.boundingRect(contour)
            cv2.rectangle(overlay, (x, y), (x + w, y + h), (0, 255, 0), 2)
            dist = int(50 * (1.0 - (y + h) / image.shape[0]))
            cv2.putText(overlay, f"{dist}m", (x, y - 5),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
            n_cars += 1
    result = cv2.addWeighted(image, 0.6, overlay, 0.4, 0)
    return result, n_cars


@pytest.fixture
def scene():
    """A class map with noisy road blobs + two car rectangles + a frame."""
    rng = np.random.RandomState(0)
    classes = np.zeros((120, 200), np.uint8)
    classes[60:, 40:160] = 1            # main road
    classes[65:70, 10:20] = 1           # small disconnected road blob
    classes[30:60, 50:90] = 2           # big car (area >> 300)
    classes[10:14, 100:106] = 2         # tiny car (filtered, area < 300)
    classes[20:40, 150:190] = 2         # second big car
    classes[5:15, 5:25] = 6             # sidewalk patch
    noise = rng.randint(0, 10, (120, 200))
    classes[noise == 9] = np.where(classes[noise == 9] == 0, 4,
                                   classes[noise == 9]).astype(np.uint8)
    frame = rng.randint(0, 255, (120, 200, 3), np.uint8)
    return frame, classes


def test_overlay_matches_reference_semantics(scene):
    frame, classes = scene
    ours, det = overlay_predictions(frame, classes)
    ref, n_cars = _reference_overlay(frame, classes)
    np.testing.assert_array_equal(ours, ref)
    assert det["cars"] == n_cars == 2


def test_clean_road_semantics(scene):
    """The reference's cleanup stamps the LARGEST morph-closed component
    back as road; pixels already class 1 are never removed (the copy at
    inference.py:109 keeps them) — so the small blob survives, and any gaps
    inside the main road closed by morphology become road."""
    _, classes = scene
    cleaned = clean_road_mask(classes)
    assert (cleaned[65:70, 10:20] == 1).all()   # small blob kept (by design)
    assert (cleaned[70:, 60:140] == 1).all()    # main road intact
    # a 3px crack inside the main road gets closed into road
    cracked = classes.copy()
    cracked[80:83, 100] = 0
    out = clean_road_mask(cracked)
    assert (out[80:83, 100] == 1).all()


def test_predictor_batched_equals_single():
    pred = Predictor(
        ModelConfig(name="unet", base_filters=4, num_classes=10),
        input_hw=(32, 64),
        batch_size=4,
    )
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (4, 60, 100, 3), np.uint8)
    batched = pred(frames)
    assert batched.shape == (4, 60, 100) and batched.dtype == np.uint8
    for i in range(4):
        single = pred(frames[i : i + 1])[0]
        np.testing.assert_array_equal(batched[i], single)


def test_predictor_host_upscale_equals_device_upscale():
    """upscale_on_host fetches model-res classes and upscales with cv2
    INTER_NEAREST — must be bit-identical to the all-on-device program
    (tpuseg.ops.resize_nearest), including the packed-color plane, at a
    non-integer scale (60/32, 100/64)."""
    cfg = ModelConfig(name="unet", base_filters=4, num_classes=10)
    frames = np.random.RandomState(3).randint(0, 255, (4, 60, 100, 3), np.uint8)
    host = Predictor(cfg, input_hw=(32, 64), batch_size=4,
                     upscale_on_host=True)
    dev = Predictor(cfg, input_hw=(32, 64), batch_size=4,
                    upscale_on_host=False)
    np.testing.assert_array_equal(host(frames), dev(frames))

    host_c = Predictor(cfg, input_hw=(32, 64), batch_size=4,
                       upscale_on_host=True, colorize_on_device=True)
    dev_c = Predictor(cfg, input_hw=(32, 64), batch_size=4,
                      upscale_on_host=False, colorize_on_device=True)
    for a, b in zip(host_c(frames), dev_c(frames)):
        np.testing.assert_array_equal(a, b)


def test_predictor_fetch_pack4_bit_exact():
    """fetch_pack4 (DESIGN §50): two class ids per fetched byte — the
    nibble pack/unpack round trip must be bit-identical to the plain
    fetch through Predictor AND VideoPipeline, and the incompatible
    configs must refuse at construction."""
    import pytest

    cfg = ModelConfig(name="unet", base_filters=4, num_classes=10)
    frames = np.random.RandomState(5).randint(
        0, 255, (4, 60, 100, 3), np.uint8
    )
    plain = Predictor(cfg, input_hw=(32, 64), batch_size=4)
    packed = Predictor(cfg, input_hw=(32, 64), batch_size=4,
                       fetch_pack4=True)
    np.testing.assert_array_equal(plain(frames), packed(frames))

    # the raw helper is an exact inverse for ids < 16
    from tpuseg.infer.predictor import unpack4_host

    ids = np.random.RandomState(1).randint(0, 16, (2, 8, 10), np.uint8)
    nib = (ids[..., 0::2] << 4) | ids[..., 1::2]
    np.testing.assert_array_equal(unpack4_host(nib), ids)

    for bad in (
        dict(device_close=True, upscale_on_host=False),
        dict(colorize_on_device=True),
        dict(upscale_on_host=False),
    ):
        with pytest.raises(ValueError):
            Predictor(cfg, input_hw=(32, 64), batch_size=4,
                      fetch_pack4=True, **bad)
    with pytest.raises(ValueError):
        Predictor(ModelConfig(name="unet", base_filters=4, num_classes=20),
                  input_hw=(32, 64), batch_size=4, fetch_pack4=True)


def test_video_pipeline_fetch_pack4(tmp_path):
    """The batched video pipeline produces identical overlay output with
    and without the packed fetch (the unpack happens in flush before the
    host upscale)."""
    import cv2

    from tpuseg.infer.video import VideoPipeline

    clip = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 24, (100, 60))
    rng = np.random.RandomState(2)
    for _ in range(10):
        w.write(rng.randint(0, 255, (60, 100, 3), np.uint8))
    w.release()

    cfg = ModelConfig(name="unet", base_filters=4, num_classes=10)
    outs = []
    for pack in (False, True):
        pred = Predictor(cfg, input_hw=(32, 64), batch_size=4,
                         fetch_pack4=pack)
        out = str(tmp_path / f"out_{pack}.mp4")
        stats = VideoPipeline(pred).run(clip, output_path=out)
        assert stats["frames"] == 10
        cap = cv2.VideoCapture(out)
        fr = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            fr.append(f)
        cap.release()
        outs.append(np.stack(fr))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_morph_close_matches_cv2():
    """Device 5x5 (and 3x3/7x7) morph-close == cv2.morphologyEx bit-exact,
    including border behavior (cv2's default border is a no-op per pass)."""
    import jax.numpy as jnp

    from tpuseg.ops.morphology import morph_close

    rng = np.random.RandomState(0)
    for h, w, k, p in [(32, 64, 5, 0.5), (17, 23, 5, 0.1), (40, 40, 3, 0.3),
                       (64, 64, 7, 0.02), (60, 100, 5, 0.9)]:
        m = (rng.random_sample((h, w)) < p).astype(np.uint8) * 255
        ker = cv2.getStructuringElement(cv2.MORPH_RECT, (k, k))
        ref = cv2.morphologyEx(m, cv2.MORPH_CLOSE, ker)
        got = np.asarray(morph_close(jnp.asarray(m > 0), k))
        np.testing.assert_array_equal(got.astype(np.uint8) * 255, ref)
    # batched form (the Predictor's shape)
    mb = rng.random_sample((3, 30, 50)) < 0.4
    gb = np.asarray(morph_close(jnp.asarray(mb), 5))
    ker = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    for i in range(3):
        ref = cv2.morphologyEx(mb[i].astype(np.uint8) * 255,
                               cv2.MORPH_CLOSE, ker)
        np.testing.assert_array_equal(gb[i].astype(np.uint8) * 255, ref)


def test_device_close_identical_output():
    """device_close (close on device, packed into the class map's high bit,
    CC keep-largest on host) produces bit-identical overlays and car counts
    to the all-host postprocess path."""
    from tpuseg.infer.postprocess import overlay_predictions

    cfg = ModelConfig(name="unet", base_filters=4, num_classes=10)
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 255, (4, 60, 100, 3), np.uint8)

    host = Predictor(cfg, input_hw=(32, 64), batch_size=4)
    dev = Predictor(cfg, input_hw=(32, 64), batch_size=4,
                    upscale_on_host=False, device_close=True)
    classes_host = host(frames)
    fetched = dev(frames)
    closed = fetched >= 0x80
    classes_dev = fetched & 0x7F
    np.testing.assert_array_equal(classes_dev, classes_host)
    # the packed bit IS the cv2 close of the road plane at frame res
    ker = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    for i in range(4):
        ref_close = cv2.morphologyEx(
            (classes_host[i] == 1).astype(np.uint8) * 255,
            cv2.MORPH_CLOSE, ker)
        np.testing.assert_array_equal(closed[i].astype(np.uint8) * 255,
                                      ref_close)
        # end-to-end overlay equality (full-host vs device-close chain)
        frame_bgr = frames[i][..., ::-1].copy()
        ref_img, ref_det = overlay_predictions(frame_bgr, classes_host[i])
        got_img, got_det = overlay_predictions(
            frame_bgr, classes_dev[i], closed_road=closed[i])
        np.testing.assert_array_equal(got_img, ref_img)
        assert got_det == ref_det
    # reference parity requires the close at frame resolution
    with pytest.raises(ValueError):
        Predictor(cfg, input_hw=(32, 64), batch_size=4,
                  upscale_on_host=True, device_close=True)


def test_video_pipeline_device_close(tmp_path):
    """The full VideoPipeline drives the device_close path (unpack in
    flush) and reports the tunnel acceptance flag."""
    src = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (100, 60))
    rng = np.random.RandomState(2)
    for _ in range(8):
        wr.write(rng.randint(0, 255, (60, 100, 3), np.uint8))
    wr.release()
    pred = Predictor(
        ModelConfig(name="unet", base_filters=4, num_classes=10),
        input_hw=(32, 64), batch_size=4,
        upscale_on_host=False, device_close=True,
    )
    stats = VideoPipeline(pred).run(src, output_path=str(tmp_path / "o.mp4"))
    assert stats["frames"] == 8
    assert isinstance(stats["tunnel_ok"], bool)
    # the fetch-subtracted diagnostic is >= fps and finite
    assert stats["fps_ex_fetch"] >= stats["fps"] > 0


def test_video_pipeline_end_to_end(tmp_path):
    # synthesize a tiny video
    src = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (100, 60))
    rng = np.random.RandomState(1)
    for _ in range(10):
        wr.write(rng.randint(0, 255, (60, 100, 3), np.uint8))
    wr.release()

    pred = Predictor(
        ModelConfig(name="unet", base_filters=4, num_classes=10),
        input_hw=(32, 64),
        batch_size=4,
    )
    pipe = VideoPipeline(pred)
    out = str(tmp_path / "out.mp4")
    stats = pipe.run(src, output_path=out)
    assert stats["frames"] == 10
    assert stats["fps"] > 0
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    cap.release()


def test_process_frame_matches_pipeline_components():
    pred = Predictor(
        ModelConfig(name="unet", base_filters=4, num_classes=10),
        input_hw=(32, 64),
        batch_size=1,
    )
    pipe = VideoPipeline(pred)
    frame = np.random.RandomState(2).randint(0, 255, (60, 100, 3), np.uint8)
    result, det = pipe.process_frame(frame)
    classes = pred(frame[None, ..., ::-1].copy())[0]
    expect, expect_det = overlay_predictions(frame, classes)
    np.testing.assert_array_equal(result, expect)
    assert det == expect_det


def test_predictor_mesh_sharded_equals_single(mesh8):
    """Serving-side data parallelism: a mesh-sharded Predictor returns the
    same class maps as the single-device one (params replicated, batch
    sharded on the "data" axis, XLA partitions the whole program)."""
    cfg = ModelConfig(name="unet", base_filters=4, num_classes=10)
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (8, 60, 100, 3), np.uint8)

    plain = Predictor(cfg, input_hw=(32, 64), batch_size=8)
    sharded = Predictor(cfg, input_hw=(32, 64), batch_size=8, mesh=mesh8)
    # same init seed => same params; outputs must match exactly
    np.testing.assert_array_equal(plain(frames), sharded(frames))

    # device colorize is pure XLA (argmax + palette gather) — it partitions
    # over the mesh and must match the single-chip colorized output exactly
    plain_c = Predictor(cfg, input_hw=(32, 64), batch_size=8,
                        colorize_on_device=True)
    sharded_c = Predictor(cfg, input_hw=(32, 64), batch_size=8, mesh=mesh8,
                          colorize_on_device=True)
    for a, b in zip(plain_c(frames), sharded_c(frames)):
        np.testing.assert_array_equal(a, b)

    # Pallas model kernels are the one thing that cannot partition
    with pytest.raises(ValueError, match="single-chip"):
        Predictor(ModelConfig(name="unet", base_filters=4, num_classes=10,
                              use_pallas=True), mesh=mesh8)


def test_predictor_honors_custom_normalization():
    """Predictor routes normalize_mean/std into the device preprocess —
    training with non-ImageNet normalization must not silently serve with
    ImageNet constants (train/serve skew)."""
    import jax.numpy as jnp

    from tpuseg.data.augment import normalize_images

    cfg = ModelConfig(name="unet", base_filters=4, num_classes=10)
    frames = np.random.RandomState(5).randint(0, 255, (2, 32, 64, 3), np.uint8)
    mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
    pred = Predictor(cfg, input_hw=(32, 64), batch_size=2,
                     normalize_mean=mean, normalize_std=std)
    # same weights, manual custom-normalized forward == Predictor output
    x = normalize_images(jnp.asarray(frames, jnp.float32), mean, std)
    logits = pred.model.apply(
        {"params": pred.variables["params"],
         "batch_stats": pred.variables["batch_stats"]}, x, train=False)
    expect = np.asarray(jnp.argmax(logits, axis=-1), np.uint8)
    # if the Predictor ignored the custom constants it would normalize
    # with ImageNet values and the class maps would disagree
    np.testing.assert_array_equal(pred(frames), expect)


def test_predictor_serves_stablehlo_artifact(tmp_path):
    """Artifact serving: a Predictor fed convert.py's StableHLO export
    (weights baked in, checkpoint ignored) returns the same class maps as
    the live model with the same weights."""
    import jax
    import jax.numpy as jnp

    from tpuseg.export.stablehlo import export_model
    from tpuseg.models.registry import build_model

    cfg = ModelConfig(name="unet", base_filters=4, num_classes=10)
    model = build_model(cfg)
    # same init as Predictor's checkpoint="" path: PRNGKey(0), zeros probe
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)),
                   train=False)
    path = str(tmp_path / "m.stablehlo")
    export_model(
        model, {"params": v["params"], "batch_stats": v["batch_stats"]},
        32, 64, path, batch=-1, fold_bn=False,
    )

    live = Predictor(cfg, input_hw=(32, 64), batch_size=4)
    art = Predictor(cfg, input_hw=(32, 64), batch_size=4, artifact=path)
    frames = np.random.RandomState(0).randint(
        0, 255, (4, 96, 128, 3), np.uint8
    )
    a, b = live(frames), art(frames)
    # identical graphs can still fuse differently across the export
    # round-trip; random-init logits tie often, so gate on agreement
    assert (a == b).mean() > 0.999


def test_predictor_artifact_rejects_mesh(mesh8, tmp_path):
    cfg = ModelConfig(name="unet", base_filters=4, num_classes=10)
    with pytest.raises(ValueError, match="single-chip"):
        Predictor(cfg, input_hw=(32, 64), batch_size=8, mesh=mesh8,
                  artifact=str(tmp_path / "missing.stablehlo"))


def test_inference_cli_artifact(tmp_path):
    """inference.py serves a StableHLO artifact end-to-end via
    --infer.artifact (the deployed-artifact workflow)."""
    import importlib.util
    import json as _json
    import os as _os
    import sys as _sys

    import jax
    import jax.numpy as jnp

    from tpuseg.export.stablehlo import export_model
    from tpuseg.models.registry import build_model

    cfg = ModelConfig(name="unet", base_filters=4, num_classes=10)
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)),
                   train=False)
    art = str(tmp_path / "m.stablehlo")
    export_model(
        model, {"params": v["params"], "batch_stats": v["batch_stats"]},
        32, 64, art, batch=-1, fold_bn=False,
    )

    src = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (100, 60))
    rng = np.random.RandomState(4)
    for _ in range(8):
        wr.write(rng.randint(0, 255, (60, 100, 3), np.uint8))
    wr.release()

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "inference_cli_artifact", _os.path.join(repo, "inference.py"))
    mod = importlib.util.module_from_spec(spec)
    _sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = mod.main([
                "--platform=cpu",
                "--model.name=unet", "--model.base_filters=4",
                "--data.width=64", "--data.height=32",
                f"--infer.video={src}", "--infer.batch_size=4",
                f"--infer.artifact={art}",
            ])
    finally:
        _sys.modules.pop(spec.name, None)
    assert rc == 0
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["frames"] == 8


def test_inference_cli_max_frames(tmp_path):
    """The inference.py entry point honors --infer.max_frames (bounded
    benchmark/smoke runs) end-to-end through its flag system."""
    import importlib.util
    import json as _json
    import os as _os
    import sys as _sys

    src = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (100, 60))
    rng = np.random.RandomState(4)
    for _ in range(12):
        wr.write(rng.randint(0, 255, (60, 100, 3), np.uint8))
    wr.release()

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "inference_cli", _os.path.join(repo, "inference.py"))
    mod = importlib.util.module_from_spec(spec)
    _sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = mod.main([
                "--platform=cpu",
                "--model.name=unet", "--model.base_filters=4",
                "--data.width=64", "--data.height=32",
                f"--infer.video={src}", "--infer.batch_size=4",
                "--infer.max_frames=8",
            ])
    finally:
        _sys.modules.pop(spec.name, None)
    assert rc == 0
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["frames"] == 8


def test_video_pipeline_preprocess_on_host_single_compile(tmp_path):
    """With preprocess_on_host (+ device upscale) the warm-up batch and the
    steady-state batches must hit the SAME jit cache entry — the old path
    keyed the warm-up on frame size but fed model-size batches later,
    compiling a second program inside the timed region and silently
    replacing the device upscale with a host one (review round 2)."""
    src = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (100, 60))
    rng = np.random.RandomState(7)
    for _ in range(12):
        wr.write(rng.randint(0, 255, (60, 100, 3), np.uint8))
    wr.release()

    pred = Predictor(
        ModelConfig(name="unet", base_filters=4, num_classes=10),
        input_hw=(32, 64), batch_size=4,
        preprocess_on_host=True, upscale_on_host=False,
    )
    pipe = VideoPipeline(pred)
    out = str(tmp_path / "out.mp4")
    stats = pipe.run(src, output_path=out)
    assert stats["frames"] == 12
    # one program for the whole run: keyed on the TRUE frame size
    assert list(pred._jitted.keys()) == [(60, 100)]
