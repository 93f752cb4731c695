"""Smoke tests: every diagnostic tool drives end-to-end on CPU at tiny
shapes and prints its record(s).

These guard against bit-rot of the measurement tooling itself — round 2's
phantom 7x train "regression" was a tool bug (host-resident state timed as
step time, DESIGN §22), not a chip or model problem, and none of the
ablation tools had a test that would have caught the pattern.
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_tool(name, argv, monkeypatch, tmp_path):
    """Import tools/<name>.py fresh and run main(argv); return stdout."""
    # never let a cpu smoke run touch the real bench history
    monkeypatch.setenv("TPUSEG_BENCH_HISTORY", str(tmp_path / "hist.json"))
    import sys

    spec = importlib.util.spec_from_file_location(
        f"{name}_smoke", os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    # register so dataclasses/flax can resolve annotations defined in the
    # tool module (sys.modules.get(cls.__module__) during class creation)
    sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
        return mod.main(argv)
    finally:
        sys.modules.pop(spec.name, None)


def test_ablate_train_smoke(monkeypatch, capsys, tmp_path):
    rc = _run_tool(
        "ablate_train",
        ["--batch", "4", "--width", "64", "--height", "32", "--chain", "2"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "{" in out  # per-section JSON records printed


def test_ablate_forward_smoke(monkeypatch, capsys, tmp_path):
    rc = _run_tool(
        "ablate_forward",
        ["--batch", "2", "--size", "64", "--chain", "2"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    assert "{" in capsys.readouterr().out


def test_conv_layout_probe_smoke(monkeypatch, capsys, tmp_path):
    rc = _run_tool(
        "conv_layout_probe",
        ["--batch", "2", "--hw", "32", "--c", "8", "--chain", "2"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    # all four formulations ran and timed
    assert set(rec["results"]) == {"nhwc", "nchw", "gemm_cn", "gemm_sn"}
    assert all(v["ms"] > 0 for v in rec["results"].values())


def test_colorize_bench_smoke(monkeypatch, capsys, tmp_path):
    rc = _run_tool(
        "colorize_bench",
        ["--batch", "2", "--chain", "2", "--width", "64", "--height", "32",
         "--frame_h", "48", "--frame_w", "96",
         "--history", str(tmp_path / "hist.json")],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    assert "{" in capsys.readouterr().out


def test_eval_quantized_smoke(monkeypatch, capsys, tmp_path):
    rc = _run_tool(
        "eval_quantized",
        ["--samples", "8", "--batch", "4", "--width", "64", "--height", "32"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    out = capsys.readouterr().out
    # the quantization gate prints a comparison record per variant
    assert "int8" in out or "fp16" in out


def test_serve_bench_smoke(monkeypatch, capsys, tmp_path):
    """The serving-concurrency benchmark boots the real server and reports
    req/s + percentiles for a (upload, format) configuration."""
    pytest.importorskip("cv2")
    rc = _run_tool(
        "serve_bench",
        ["--model", "unet", "--base_filters", "4",
         "--width", "64", "--height", "32",
         "--upload_width", "100", "--upload_height", "60",
         "--clients", "2", "--requests", "2", "--max_batch", "2",
         "--upload", "raw", "--format", "raw"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    rec = json.loads(
        [l for l in capsys.readouterr().out.splitlines()
         if l.startswith("{")][-1]
    )
    assert rec["n"] == 4 and rec["failures"] == 0
    assert rec["req_per_s"] > 0 and rec["p90_ms"] >= rec["p50_ms"]


def test_make_demo_video_smoke(capsys, tmp_path):
    """The demo-clip generator writes a decodable mp4 with the requested
    geometry (the zero-downloads input for `python inference.py`)."""
    cv2 = pytest.importorskip("cv2")
    import importlib.util as ilu
    import sys

    spec = ilu.spec_from_file_location(
        "make_demo_video_smoke", os.path.join(REPO, "tools", "make_demo_video.py")
    )
    mod = ilu.module_from_spec(spec)
    sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
        out = str(tmp_path / "demo.mp4")
        assert mod.main(out, frames=10, w=64, h=36) == 0
    finally:
        sys.modules.pop(spec.name, None)
    assert "wrote" in capsys.readouterr().out
    cap = cv2.VideoCapture(out)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (36, 64, 3)
        n += 1
    cap.release()
    assert n == 10


def test_video_headline_smoke(monkeypatch, capsys, tmp_path):
    """tools/video_headline.py (VERDICT r4 item 3) drives the gated
    protocol end-to-end on CPU: every attempt carries the tunnel_ok AND
    clause_binding verdicts, a headline requires the consecutive-gated
    streak, and a cpu run never writes history."""
    pytest.importorskip("cv2")
    import importlib.util as ilu
    import json as _json
    import sys as _sys

    hist = tmp_path / "hist.json"
    monkeypatch.setenv("TPUSEG_BENCH_HISTORY", str(hist))

    def load(name):
        spec = ilu.spec_from_file_location(
            f"vh_{name}", os.path.join(REPO, "tools", f"{name}.py")
        )
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    clip = str(tmp_path / "clip.mp4")
    load("make_demo_video").main(clip, frames=12, w=64, h=36)
    vh = load("video_headline")
    # clause_binding is pure arithmetic on the stats dict
    assert vh.clause_binding({"seconds": 2.0}) is True
    assert vh.clause_binding({"seconds": 0.4}) is False

    rc = vh.main([
        "--video", clip, "--checkpoint", "", "--attempts", "2",
        "--required", "1", "--spacing", "0", "--platform", "cpu",
        "--batch", "4", "--width", "64", "--height", "32",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = _json.loads(out)
    assert rec["attempts"] and rec["frames"] == 12
    for a in rec["attempts"]:
        assert set(a) >= {"fps", "tunnel_ok", "clause_binding", "gated"}
        assert a["gated"] == (a["tunnel_ok"] and a["clause_binding"])
    assert rec["earned"] == (rc == 0)
    if rec["earned"]:
        assert len(rec["gated_runs"]) >= 1 and rec["headline_fps"] > 0
    assert not hist.exists()  # cpu runs never pollute history
    _sys.modules.pop("vh_video_headline", None)
    _sys.modules.pop("vh_make_demo_video", None)


def test_eval_quantized_real_dataset(monkeypatch, capsys, tmp_path):
    """--data_dir: the int8 acceptance gate runs on a real dataset layout
    (first-contact checklist step 6) — eval AND calibration read real files."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        cv2.imwrite(str(img_dir / f"{i:03d}.jpg"),
                    rng.randint(0, 255, (60, 100, 3), np.uint8))
        cv2.imwrite(str(mask_dir / f"{i:03d}.png"),
                    rng.randint(0, 20, (60, 100), np.uint8))
    rc = _run_tool(
        "eval_quantized",
        ["--data_dir", str(tmp_path), "--samples", "6", "--batch", "2",
         "--width", "64", "--height", "32",
         "--model", "unet", "--base_filters", "4"],
        monkeypatch, tmp_path,
    )
    out = capsys.readouterr().out
    assert '"int8_full"' in out and '"fp32"' in out
    assert rc == 0, out
    # a missing dataset fails loudly, not silently
    assert _run_tool(
        "eval_quantized", ["--data_dir", str(tmp_path / "nope")],
        monkeypatch, tmp_path,
    ) == 1


def test_pipeline_bench_smoke(monkeypatch, capsys, tmp_path):
    rc = _run_tool(
        "pipeline_bench",
        ["--batch", "4", "--steps", "2", "--width", "64", "--height", "32"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    assert "{" in capsys.readouterr().out


def test_artifact_bench_smoke(monkeypatch, capsys, tmp_path):
    rc = _run_tool(
        "artifact_bench",
        ["--batch", "2", "--chain", "2", "--size", "64x32",
         "--history", str(tmp_path / "hist.json")],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    rec = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert rec["metric"] == "stablehlo_artifact_infer_64x32_fps_per_chip"
    assert rec["artifact_vs_live"] > 0
    # a cpu run must never append to history
    assert not (tmp_path / "hist.json").exists()


def test_export_synthetic_dataset_roundtrip(monkeypatch, capsys, tmp_path):
    """The exported BDD100K-layout dir reproduces the synthetic samples
    bit-exactly through the REAL file path (cv2 decode + LUT remap), and
    eval_miou's north-star command runs end-to-end against it."""
    out = tmp_path / "synth_val"
    rc = _run_tool(
        "export_synthetic_dataset",
        ["--out", str(out), "--num", "3", "--seed", "11"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["count"] == 3

    from tpuseg.data.sources import BDD100KSource, SyntheticSource

    loaded = BDD100KSource(
        str(out / "images"), str(out / "masks"), 256, 128
    )
    ref = SyntheticSource(3, 256, 128, seed=11)
    for i in range(3):
        img, mask = loaded.load(i)
        rimg, rmask = ref.load(i)
        assert (mask == rmask).all()
        assert (img == rimg).all()

    # the exact BASELINE.md north-star invocation (random-init checkpoint)
    rc = _run_tool(
        "eval_miou",
        ["--data_dir", str(out), "--batch", "3", "--width", "64",
         "--height", "32", "--model", "light_unet", "--platform", "cpu"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert res["n_images"] == 3
    assert 0.0 <= res["miou"] <= 1.0


def test_model_bench_smoke(monkeypatch, capsys, tmp_path):
    rc = _run_tool(
        "model_bench",
        ["--model", "unet", "--base_filters", "4", "--batch", "2",
         "--size", "64x32", "--chain", "2", "--platform", "cpu",
         "--history", str(tmp_path / "hist.json")],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["metric"] == "unet_infer_64x32_fps_per_chip"
    assert rec["value"] > 0
    assert rec["config"]["model"] == "unet"
    # cpu smoke runs never append to the bench history
    assert not (tmp_path / "hist.json").exists()


def test_class_stats_tool(monkeypatch, capsys, tmp_path):
    """class_stats on a known on-disk dataset: counts match a direct
    numpy pass, weights follow the median-frequency formula, and the
    printed flag string parses back as valid --train.class_weights."""
    out = tmp_path / "cs_data"
    rc = _run_tool(
        "export_synthetic_dataset",
        ["--out", str(out), "--num", "4", "--seed", "3"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    capsys.readouterr()

    rc = _run_tool(
        "class_stats", ["--data_dir", str(out)], monkeypatch, tmp_path
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["images"] == 4

    import numpy as np

    from tpuseg.data.sources import BDD100KSource

    src = BDD100KSource(str(out / "images"), str(out / "masks"), 256, 128)
    want = np.zeros(10, np.int64)
    for i in range(4):
        _, mask = src.load(i)
        want += np.bincount(mask.ravel().astype(np.int64), minlength=10)[:10]
    assert rec["pixel_counts"] == [int(c) for c in want]
    assert sum(rec["pixel_counts"]) == 4 * 256 * 128

    freq = want / want.sum()
    present = want > 0
    med = np.median(freq[present])
    got_w = np.asarray(rec["class_weights"])
    np.testing.assert_allclose(got_w[present], med / freq[present], rtol=1e-3)
    assert (got_w[~present] == 0).all()

    # the suggested flag round-trips through the config system
    from tpuseg.configs import load_config

    cfg = load_config([rec["flag"]])
    assert len(cfg.train.class_weights) == 10


def test_first_contact_chain_end_to_end(monkeypatch, capsys, tmp_path):
    """The README first-contact checklist as one command (VERDICT r3 item
    6): exporter fixture -> reader smoke -> class stats -> train -> eval ->
    int8 gate -> TTA, each with a recorded PASS, on CPU at tiny shapes.
    When real BDD100K data lands, this chain is the rehearsed path."""
    out = tmp_path / "bdd"
    rc = _run_tool(
        "export_synthetic_dataset",
        ["--out", str(out), "--num", "24", "--width", "64", "--height", "32"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    capsys.readouterr()
    ckpt = tmp_path / "fc_ckpt"
    rc = _run_tool(
        "first_contact",
        ["--data_dir", str(out), "--checkpoint_dir", str(ckpt),
         "--model", "unet", "--base_filters", "8",
         "--width", "64", "--height", "32", "--batch", "8",
         "--epochs", "2", "--smoke_limit", "8", "--loss", "ce+dice"],
        monkeypatch, tmp_path,
    )
    text = capsys.readouterr().out
    rec = json.loads(text.strip().splitlines()[-1])
    assert rc == 0, text
    fc = rec["first_contact"]
    for step in ("1-reader-smoke", "2-class-stats", "4-train",
                 "5-north-star", "6-int8-gate", "7-tta"):
        assert fc[step]["status"] == "PASS", (step, fc)
    assert fc["3-import-pth"]["status"] == "SKIP"  # no .pth in-image
    assert rec["ok"] is True and "miou" in rec
    assert (ckpt / "best").is_dir()


def test_first_contact_apply_weights_refuses_pure_surrogate(
    monkeypatch, capsys, tmp_path
):
    """--apply_weights + the pure-lovász round-5 default loss must fail at
    ARGUMENT time with guidance (the loss has no CE term to weight;
    silently training unweighted, or crashing at step 4, would both
    defeat the measured remedy — DESIGN §47)."""
    with pytest.raises(SystemExit) as exc:
        _run_tool(
            "first_contact",
            ["--data_dir", str(tmp_path), "--apply_weights"],
            monkeypatch, tmp_path,
        )
    assert exc.value.code == 2  # argparse error, before any step ran
    err = capsys.readouterr().err
    assert "ce+lovasz" in err and "apply_weights" in err


def test_convergence_sweep_smoke(monkeypatch, capsys, tmp_path):
    """The protocol sweep runner (tools/convergence_sweep.py): a 2-run grid
    drives end-to-end in one process, writes per-run summaries, and a
    second invocation skips completed runs (the stall-recovery contract)."""
    monkeypatch.setenv("TPUSEG_BENCH_CACHE", "")  # keep the test hermetic
    tiny = [
        "--model.name=unet", "--model.base_filters=4",
        "--data.width=32", "--data.height=16", "--train.batch_size=8",
        "--train.log_every=0",
        '--data.sources=[{"kind":"synthetic","num_samples":24,"weight":1.0}]',
    ]
    # a held-out on-disk dir for the post-eval path (VERDICT r4 item 1:
    # the composed-recipe measurement scores every run's best ckpt on the
    # same fixture, optionally with TTA, all in one client)
    val_dir = tmp_path / "val"
    rc = _run_tool(
        "export_synthetic_dataset",
        ["--out", str(val_dir), "--num", "8", "--seed", "9",
         "--width", "32", "--height", "16"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    runs = [["ce_t", tiny],
            ["dice_t", tiny + ["--train.loss=dice"]]]
    runs_path = tmp_path / "runs.json"
    runs_path.write_text(json.dumps(runs))
    out = tmp_path / "sw"

    rc = _run_tool(
        "convergence_sweep",
        ["--runs", str(runs_path), "--out", str(out), "--epochs", "1",
         "--eval_dir_bal", str(val_dir), "--post_eval_tta", "flip",
         "--eval_args",
         "--model unet --base_filters 4 --width 32 --height 16"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    capsys.readouterr()
    recs = [json.loads(l) for l in (out / "sweep.jsonl").open()]
    assert [r["name"] for r in recs] == ["ce_t", "dice_t"]
    for r in recs:
        assert r["ok"] is True and r["epochs"] == 1
        assert 0.0 <= r["val_miou"] <= 1.0
        assert 0.0 <= r["holdout_miou"] <= 1.0
        assert 0.0 <= r["holdout_miou_flip"] <= 1.0
    assert (out / "dice_t" / "history.jsonl").exists()

    # idempotent: completed runs are skipped, summary not re-appended
    rc = _run_tool(
        "convergence_sweep",
        ["--runs", str(runs_path), "--out", str(out), "--epochs", "1"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    text = capsys.readouterr().out
    assert text.count("already complete, skip") == 2
    assert sum(1 for _ in (out / "sweep.jsonl").open()) == 2


def test_convergence_sweep_list_and_validation(monkeypatch, capsys, tmp_path):
    rc = _run_tool(
        "convergence_sweep", ["--preset", "loss_zoo", "--list"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    names = {r["name"] for r in lines}
    assert {"ce", "dice", "lovasz", "ce_lovasz", "weights_imb"} <= names
    with pytest.raises(SystemExit):
        _run_tool("convergence_sweep", ["--runs", str(tmp_path / "nope"),
                                        "--list"], monkeypatch, tmp_path)

    # the round-5 composed_recipe preset: 3-element entries carry their
    # eval-arm tag through --list, and malformed opts are rejected
    rc = _run_tool(
        "convergence_sweep", ["--preset", "composed_recipe", "--list"],
        monkeypatch, tmp_path,
    )
    assert rc == 0
    rows = {r["name"]: r for r in
            (json.loads(l) for l in capsys.readouterr().out.splitlines())}
    assert {"ce", "lovasz", "lovasz_ema", "ce_lovasz_w_ema_imb"} <= set(rows)
    assert rows["lovasz_imb"]["eval"] == "imb"
    assert "eval" not in rows["lovasz"]

    bad = tmp_path / "bad_runs.json"
    bad.write_text(json.dumps([["x", [], "not-a-dict"]]))
    with pytest.raises(SystemExit):
        _run_tool("convergence_sweep", ["--runs", str(bad), "--list"],
                  monkeypatch, tmp_path)
