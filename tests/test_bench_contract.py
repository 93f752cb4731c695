"""bench.py contract: ONE JSON line, per-size metrics/history hygiene.

The driver runs bench.py at the end of every round and records its single
JSON line; these tests pin the host-side logic (record shape, config
tagging, regression-guard history filter, stale fallback) without touching
a TPU.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _load(monkeypatch, **env):
    for k in list(os.environ):
        if k.startswith("TPUSEG_BENCH"):
            monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    spec = importlib.util.spec_from_file_location("benchmod", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_default_record_shape(monkeypatch):
    m = _load(monkeypatch)
    rec = m._record({"fps": 1000.0, "tflops": 10.0, "mfu_pct": 5.0})
    assert rec["metric"] == "mobilenetv2_unet_infer_512x512_fps_per_chip"
    assert rec["unit"] == "frames/sec"
    assert rec["vs_baseline"] == round(1000.0 / 2.58, 1)
    # the default headline config includes the bf16 head (round 2 flip:
    # 2257.5 -> 2408.9 fps) and is explicitly tagged so the fp32-head era's
    # untagged records can never be conflated with it
    assert rec["config"]["bf16_head"] is True


def test_size_override_tags_config(monkeypatch):
    m = _load(monkeypatch, TPUSEG_BENCH_SIZE="256x128")
    rec = m._record({"fps": 1000.0})
    assert rec["metric"] == "mobilenetv2_unet_infer_256x128_fps_per_chip"
    # denominator switches to the reference CPU fps at that size (18.0)
    assert rec["vs_baseline"] == round(1000.0 / 18.0, 1)
    assert rec["config"]["size"] == "256x128"


def test_history_best_ignores_config_stale_and_other_batches(
    monkeypatch, tmp_path
):
    m = _load(monkeypatch)
    hist = tmp_path / "hist.json"
    cur = {"bf16_head": True, "batch": 256, "size": "512x512"}
    lines = [
        {"metric": "mobilenetv2_unet_infer_512x512_fps_per_chip",
         "value": 2000.0, "batch": 256, "size": "512x512", "config": cur},
        {"metric": "mobilenetv2_unet_infer_512x512_fps_per_chip",
         "value": 9000.0, "batch": 256, "size": "512x512", "stale": True,
         "config": cur},
        # an fp32-head-era (untagged) record must NOT count toward the
        # current bf16-head default — the cross-config leak guard
        # (ADVICE r1 item 2: the 128->256 default switch precedent)
        {"metric": "mobilenetv2_unet_infer_512x512_fps_per_chip",
         "value": 8500.0, "batch": 256, "size": "512x512"},
        # nor a different-batch record
        {"metric": "mobilenetv2_unet_infer_512x512_fps_per_chip",
         "value": 8700.0, "batch": 128, "size": "512x512", "config":
         {"bf16_head": True, "batch": 128, "size": "512x512"}},
        # nor an A/B-toggled one
        {"metric": "mobilenetv2_unet_infer_512x512_fps_per_chip",
         "value": 8800.0, "batch": 256, "size": "512x512",
         "config": {**cur, "pallas": True}},
        {"metric": "mobilenetv2_unet_infer_256x128_fps_per_chip",
         "value": 8000.0, "batch": 256, "size": "256x128",
         "config": {"bf16_head": True, "size": "256x128"}},
    ]
    hist.write_text("\n".join(json.dumps(l) for l in lines) + "\n")
    monkeypatch.setattr(m, "HISTORY", str(hist))
    assert m._history_best() == 2000.0


def test_watchdog_stale_fallback_is_per_metric(monkeypatch, tmp_path):
    """With an instant watchdog trip, each config's fallback reuses only its
    OWN last real record. The child is pinned to the CPU platform
    (TPUSEG_BENCH_PLATFORM): a kill mid-TPU-execution wedges the chip, so
    this test must never let the watchdog reach a TPU-bound child."""
    hist = tmp_path / "hist.json"
    lines = [
        {"metric": "mobilenetv2_unet_infer_512x512_fps_per_chip",
         "value": 1234.5, "tflops": 3.0, "mfu_pct": 1.5,
         "batch": 256, "size": "512x512",
         "config": {"bf16_head": True, "batch": 256, "size": "512x512"}},
        {"metric": "mobilenetv2_unet_infer_64x32_fps_per_chip",
         "value": 77.0, "batch": 256, "size": "64x32",
         "config": {"s2d": False, "pallas": False, "int8": False,
                    "foldbn": False, "subpix": True, "fused_head": False,
                    "bf16_head": True, "batch": 256, "size": "64x32"}},
    ]
    hist.write_text("\n".join(json.dumps(l) for l in lines) + "\n")

    def run(extra_env):
        env = {k: v for k, v in os.environ.items()
               if not k.startswith("TPUSEG_BENCH")}
        env.update({
            "TPUSEG_BENCH_TIMEOUT": "1",
            "TPUSEG_BENCH_PLATFORM": "cpu",
            "TPUSEG_BENCH_HISTORY": str(hist),
            **extra_env,
        })
        out = subprocess.run(
            [sys.executable, BENCH], env=env, capture_output=True,
            text=True, timeout=120, cwd=REPO,
        )
        js = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
        assert len(js) == 1, out.stdout  # the ONE-json-line contract
        return json.loads(js[0])

    rec = run({})
    assert rec["stale"] is True
    assert rec["metric"] == "mobilenetv2_unet_infer_512x512_fps_per_chip"
    assert rec["value"] == 1234.5  # its own last real record

    rec2 = run({"TPUSEG_BENCH_SIZE": "64x32"})
    assert rec2["stale"] is True
    assert rec2["metric"] == "mobilenetv2_unet_infer_64x32_fps_per_chip"
    assert rec2["value"] == 77.0  # the config-tagged record for THIS size

    rec3 = run({"TPUSEG_BENCH_SIZE": "96x48"})
    assert rec3["stale"] is True
    assert rec3["value"] == 0.0  # never borrows another size's number


def test_phases_in_record_and_stall_flag(monkeypatch):
    """VERDICT r3 item 2: phase timings live INSIDE the parsed record, and a
    slow backend_connect is flagged init_stalled (BENCH_r03's 681 s init
    stall was visible only in the stderr tail)."""
    m = _load(monkeypatch)
    rec = m._record({"fps": 1000.0, "phases": {
        "imports": 12.0, "backend_connect": 3.0, "init": 4.0}})
    assert rec["phases"]["backend_connect"] == 3.0
    assert rec["init_stalled"] is False
    rec2 = m._record({"fps": 1000.0, "phases": {
        "imports": 12.0, "backend_connect": 681.3}})
    assert rec2["init_stalled"] is True


def test_parent_retries_on_init_stall(monkeypatch, tmp_path, capfd):
    """A child that reports its imports phase but never backend_connect is
    the DESIGN §37 blocked-client state: the parent must abandon it and
    retry in a fresh child, and the fallback record must carry
    init_retries. Simulated with a fake child that stalls forever (cpu
    platform, so abandoned children are reaped).

    Event-driven (VERDICT r4 item 4 — the first version raced the overall
    watchdog budget against stall-detection latency on the 1-core host and
    failed 2/7 runs): the watchdog budget is set far beyond reach, and the
    parent now abandons a stalled retry child IMMEDIATELY once retries are
    exhausted, so the test keys purely on the stall events."""
    import subprocess as sp

    stall_child = tmp_path / "stall_child.py"
    stall_child.write_text(
        "import os, time\n"
        "p = os.environ['TPUSEG_BENCH_PROGRESS']\n"
        "open(p, 'a').write('PHASE imports 1.0\\n')\n"
        "time.sleep(300)\n"
    )
    hist = tmp_path / "hist.json"
    hist.write_text(json.dumps(
        {"metric": "mobilenetv2_unet_infer_512x512_fps_per_chip",
         "value": 1234.5, "batch": 256, "size": "512x512",
         "config": {"bf16_head": True, "batch": 256, "size": "512x512"}},
    ) + "\n")
    m = _load(
        monkeypatch,
        TPUSEG_BENCH_PLATFORM="cpu",
        TPUSEG_BENCH_HISTORY=str(hist),
        # generous: the stall path must fire long before this; the old
        # value (16 s) could lose the race to stall detection (~10 s after
        # imports + spawn latency) under load
        TPUSEG_BENCH_TIMEOUT="300",
        TPUSEG_BENCH_INIT_TIMEOUT="0",   # stall fires 10 s after imports
        TPUSEG_BENCH_RETRY_SPACING="0",
    )
    spawned = []
    real_popen = sp.Popen

    def fake_popen(cmd, **kw):
        spawned.append(cmd)
        return real_popen([sys.executable, str(stall_child)], **kw)

    monkeypatch.setattr(sp, "Popen", fake_popen)
    m.main()
    out = capfd.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert len(spawned) == 2          # original + one retry
    assert rec["init_retries"] == 1
    assert rec["stale"] is True
    assert rec["value"] == 1234.5     # per-config stale fallback still works


def test_adaptive_init_stall_bar(monkeypatch, tmp_path):
    """VERDICT r4 item 4: the stall bar derives from the recorded healthy
    backend_connect history — max(150, 2x median, 1.5x max) over the last
    10 non-stale records — so a recorded-healthy 143.1 s connect lifts the
    bar to ~215 s instead of sitting 4.6% under a fixed 150 s bar. The env
    override stays verbatim (tests pin it), and the bar used is stamped
    into the record."""
    hist = tmp_path / "hist.json"

    def bar_with(lines, **env):
        hist.write_text("\n".join(json.dumps(l) for l in lines) + "\n")
        m = _load(monkeypatch, TPUSEG_BENCH_HISTORY=str(hist), **env)
        return m

    base = {"metric": "mobilenetv2_unet_infer_512x512_fps_per_chip",
            "value": 2400.0, "batch": 256, "size": "512x512"}

    # no history -> the 150 s floor
    m = bar_with([base])
    assert m.INIT_STALL_S == 150

    # the round-4 reality: healthy connects 0.8 / 143.1 / 45.7 ->
    # 1.5 x max = 214.65 wins over the floor and 2 x median (91.4)
    m = bar_with([
        {**base, "phases": {"backend_connect": 0.8}},
        {**base, "phases": {"backend_connect": 143.1}},
        {**base, "phases": {"backend_connect": 45.7}},
    ])
    assert m.INIT_STALL_S == 215

    # stale records, STALLED records (the feedback loop observed live:
    # a 674 s init_stalled connect would otherwise set a ~1011 s bar and
    # blind the detector), and records without phases don't move the bar
    m = bar_with([
        {**base, "phases": {"backend_connect": 500.0}, "stale": True},
        {**base, "phases": {"backend_connect": 674.3},
         "init_stalled": True, "init_stall_bar": 215},
        {**base, "phases": {"backend_connect": 40.0}},
        base,
    ])
    assert m.INIT_STALL_S == 150

    # only the last 10 records count (an ancient slow era ages out)
    old = [{**base, "phases": {"backend_connect": 400.0}}]
    recent = [{**base, "phases": {"backend_connect": 10.0}}] * 10
    m = bar_with(old + recent)
    assert m.INIT_STALL_S == 150

    # explicit env override is verbatim
    m = bar_with([{**base, "phases": {"backend_connect": 143.1}}],
                 TPUSEG_BENCH_INIT_TIMEOUT="7")
    assert m.INIT_STALL_S == 7

    # the bar used is stamped into any record that carries phases
    rec = m._record({"fps": 1000.0, "phases": {"backend_connect": 3.0}})
    assert rec["init_stall_bar"] == 7
    assert rec["init_stalled"] is False


def test_train_bench_tool_smoke(monkeypatch, capsys, tmp_path):
    """tools/train_bench.py drives end-to-end on CPU at tiny shapes, prints
    one JSON record, and does NOT append history from a cpu run (guards the
    round-2 regression where host-resident state was measured as step
    time — DESIGN §22)."""
    import importlib.util

    hist = tmp_path / "hist.json"
    monkeypatch.setenv("TPUSEG_BENCH_HISTORY", str(hist))
    spec = importlib.util.spec_from_file_location(
        "train_bench_mod", os.path.join(REPO, "tools", "train_bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main([
        "--model", "unet", "--height", "32", "--width", "64",
        "--batch", "4", "--steps", "2", "--bf16_head",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["metric"] == "unet_train_64x32_imgs_per_sec"
    assert rec["value"] > 0 and rec["unit"] == "imgs/sec"
    import math
    assert math.isfinite(rec["loss"])
    assert not hist.exists()  # cpu runs never pollute the history

    # --loss routes a configured loss into the step (DESIGN §44's cost
    # measurement path); lovasz exercises the sort formulation under jit
    rc = mod.main([
        "--model", "unet", "--height", "32", "--width", "64",
        "--batch", "4", "--steps", "2", "--loss", "lovasz",
    ])
    assert rc == 0
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["value"] > 0 and math.isfinite(rec2["loss"])
