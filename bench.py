"""Headline benchmark: flagship inference throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "tflops": N, "mfu_pct": N}

Metric: MobileNetV2UNet (the reference's production model) forward + argmax
at 512x512, bf16 compute incl. the final-upsample contraction (bf16 head),
batch 256 — the BASELINE.md north-star config. Batch swept on-chip three
times: pre-subpixel 64/128/256 -> 1357.7/1765.9/1742.9 (128 best); with the
subpixel decoder 128/256 -> 2208.5/2257.3 (256 best); with the bf16 head
256/512 -> 2408.9/2341.5 (256 stays best).

The bf16 head (docs/DESIGN.md §21) halves the head's HBM traffic for +6.7%
fps (2257.5 -> 2408.9 measured back-to-back fresh); the 2-tap lerp still
accumulates fp32 on the MXU, so logits differ ~2^-9 relative and argmax can
flip only at exact near-ties. This mirrors the reference's own deployment
story (FP16 TensorRT, reference README.md:113-117). The exact-fp32-head
parity config stays the MODEL default (--model.head_fp32, gated by the
torch-parity suite) and stays measured: TPUSEG_BENCH_BF16_HEAD=0.

Measurement method: the forward is chained N times inside one jitted
``lax.scan`` with a data dependency between iterations, and the final scalar
is fetched to host. This is required for honesty on this runtime:
``block_until_ready()`` returns before device execution completes through
the remote-device tunnel, so naive async timing overstates throughput ~100x
(verified: per-call host-synced latency matches the scan-chained number,
not the async one).

A/B toggles (env, for on-chip experiments without editing source):
    TPUSEG_BENCH_S2D=1      space-to-depth stem rewrite
    TPUSEG_BENCH_PALLAS=1   fused Pallas decoder kernels
    TPUSEG_BENCH_BATCH=N    override batch size

Regression guard: if the measured fps falls below 0.8x the best real
(non-stale) measurement in bench_history.json for the same config, the JSON
carries "regression_from_best": <best> and a warning goes to stderr.

Baseline denominator: the reference implementation's single-image CPU
inference (PyTorch eval forward + argmax, 1 thread) measured on this host =
2.58 fps at 512x512 (18.0 fps at its native 256x128). The reference publishes
no numbers (BASELINE.md), so its measured CPU throughput is the denominator,
per BASELINE.json's ">=10x reference CPU video-inference throughput" target.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Measured via tests/torch_ref.TorchMobileNetV2UNet.eval(), batch=1,
# torch.set_num_threads(1), on this host (see module docstring).
REFERENCE_CPU_FPS_512 = 2.58
# Same measurement per input size (W, H) — 256x128 is the reference's
# native input (main.py:23).
REFERENCE_CPU_FPS = {(512, 512): 2.58, (256, 128): 18.0}

# TPU v5e (v5 lite) bf16 peak: 197 TFLOP/s per chip (public spec).
PEAK_BF16_TFLOPS = 197.0

# MobileNetV2UNet forward FLOPs per 512x512 frame (matmul/conv FLOPs from
# XLA cost_analysis of the jitted forward, batch-normalized; recomputed live
# when cost_analysis is available on the backend, this is the fallback).
FLOPS_PER_FRAME_512_FALLBACK = 24.0e9

# Batch sweep on-chip (bench_history.json): with the subpixel decoder the
# knee moved from 128 to 256 (2208.5 vs 2257.3 back-to-back, 2026-08-17).
DEFAULT_BATCH = 256
BATCH = int(os.environ.get("TPUSEG_BENCH_BATCH", str(DEFAULT_BATCH)))
# TPUSEG_BENCH_SIZE="WxH" overrides the input size (e.g. "256x128", the
# reference's native input). Non-default sizes are tagged in "config" so
# the 512x512 regression guard/history stay per-config clean.
DEFAULT_SIZE = (512, 512)
_size = os.environ.get("TPUSEG_BENCH_SIZE", "512x512")
WIDTH, HEIGHT = (int(v) for v in _size.lower().split("x"))
CHAIN = 32

S2D = os.environ.get("TPUSEG_BENCH_S2D", "0") == "1"
PALLAS = os.environ.get("TPUSEG_BENCH_PALLAS", "0") == "1"
INT8 = os.environ.get("TPUSEG_BENCH_INT8", "0") == "1"
FOLDBN = os.environ.get("TPUSEG_BENCH_FOLDBN", "0") == "1"
SUBPIX = os.environ.get("TPUSEG_BENCH_SUBPIX", "1") == "1"  # default ON
# Fused final-upsample+argmax Pallas kernel (upsample2x_argmax): the
# full-resolution logits never reach HBM. Same exact classes.
FUSED_HEAD = os.environ.get("TPUSEG_BENCH_FUSED_HEAD", "0") == "1"
# Pure-XLA phase-decomposed head (upsample2x_argmax_head): four elementwise
# phase lerps each fused into its own argmax — full-res fp32 logits never
# reach HBM either, without Pallas. Same exact classes.
XLA_HEAD = os.environ.get("TPUSEG_BENCH_XLA_HEAD", "0") not in ("0", "")
# bf16 final-upsample contraction (halves the head's HBM traffic; logits
# differ ~2^-9 rel so argmax can flip at exact ties). Default ON since
# round 2: +6.7% measured (2257.5 -> 2408.9 fps back-to-back fresh), the
# deployment-honest analogue of the reference's FP16 TensorRT claim.
# TPUSEG_BENCH_BF16_HEAD=0 measures the exact-fp32-head parity config.
BF16_HEAD = os.environ.get("TPUSEG_BENCH_BF16_HEAD", "1") == "1"


def _flops_per_frame(fwd, variables, x) -> float:
    """Matmul/conv FLOPs per frame from XLA's compiled cost analysis."""
    try:
        cost = fwd.lower(variables, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost["flops"])
        if flops > 0:
            return flops / x.shape[0]
    except Exception:
        pass
    return FLOPS_PER_FRAME_512_FALLBACK * (HEIGHT * WIDTH) / (512 * 512)


HISTORY = os.environ.get(
    "TPUSEG_BENCH_HISTORY",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_history.json"),
)


def _history_records() -> list:
    """Parsed bench_history.json lines (skips blanks and bad JSON)."""
    recs = []
    if os.path.exists(HISTORY):
        with open(HISTORY) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return recs


def _init_stall_bar() -> int:
    """Backend-init stall threshold (seconds), adaptive to this tunnel.

    BENCH_r03's driver run spent 681.3 s in the init phase — the DESIGN
    §37 back-to-back-client-start stall, 17x the warm norm. A child
    completing backend_connect slower than this bar tags its record
    "init_stalled": true; the parent watching the progress file abandons a
    child still short of backend_connect at this age and retries in a
    fresh spaced child (§37: a blocked client never recovers).

    The bar ADAPTS to the recorded healthy-connect history (VERDICT r4
    item 4: a fixed 150 s bar sat 4.6% above a real healthy 143.1 s
    connect — one more slow-but-healthy start and the parent would
    abandon a good TPU child, the precise hazard this machinery exists to
    avoid). A recorded healthy connect proves connects that slow happen in
    health, so the bar must clear the recorded range with margin:
        max(150, 2 x median(recent), 1.5 x max(recent))
    over the last 10 non-stale records carrying a backend_connect phase.
    The bar actually used is stamped into the record ("init_stall_bar").
    TPUSEG_BENCH_INIT_TIMEOUT overrides verbatim (tests pin it).
    """
    env = os.environ.get("TPUSEG_BENCH_INIT_TIMEOUT")
    if env is not None:
        return int(env)
    connects = [
        float(rec["phases"]["backend_connect"])
        for rec in _history_records()
        if not rec.get("stale")
        # a stalled-but-completed child's record (init_stalled: true, e.g.
        # the 674 s §37 connect of 2026-08-21) must NOT feed the bar: one
        # stall would otherwise inflate it to 1.5x the stall and blind the
        # detector for the next ten runs (observed live before this filter)
        and not rec.get("init_stalled")
        and isinstance(rec.get("phases"), dict)
        and rec["phases"].get("backend_connect") is not None
    ][-10:]
    bar = 150.0
    if connects:
        ordered = sorted(connects)
        median = ordered[len(ordered) // 2]
        bar = max(bar, 2.0 * median, 1.5 * max(ordered))
    return int(round(bar))


INIT_STALL_S = _init_stall_bar()
# Spacing before the retry child (CLAUDE.md back-to-back-start hazard).
RETRY_SPACING_S = int(os.environ.get("TPUSEG_BENCH_RETRY_SPACING", "90"))

_PHASES: "dict[str, float]" = {}


def _trace(label: str, t0: float) -> float:
    """Phase timing: stderr + the _PHASES dict (shipped in the JSON record)
    + the progress file the parent watchdog polls for init-stall detection."""
    now = time.perf_counter()
    _PHASES[label] = round(now - t0, 1)
    print(f"bench phase {label}: {now - t0:.1f}s", file=sys.stderr)
    progress = os.environ.get("TPUSEG_BENCH_PROGRESS")
    if progress:
        try:
            with open(progress, "a") as f:
                f.write(f"PHASE {label} {now - t0:.1f}\n")
        except OSError:
            pass
    return now


def _measure() -> dict:
    t0 = time.perf_counter()
    import jax

    # TPUSEG_BENCH_PLATFORM=cpu runs the measurement off-TPU (tests, logic
    # checks). Must be applied before backend init; the env var alone is
    # not enough (sitecustomize appends the axon platform).
    platform = os.environ.get("TPUSEG_BENCH_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    else:
        # Keep the env-selected platform (axon TPU) as the default backend
        # but ALSO register the host cpu backend: model init runs there
        # (see below) to avoid per-op tunnel round trips.
        from tpuseg.core.device_io import ensure_cpu_backend

        ensure_cpu_backend()
    # Persistent XLA compilation cache: a fresh `python bench.py` process
    # reuses the compiled program instead of paying the full model compile
    # every run — the round-1 driver bench timed out twice on exactly that
    # cold-compile cost (VERDICT r1).
    from tpuseg.core.platform import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet

    t0 = _trace("imports", t0)

    # Force the default-backend (TPU) client connect HERE, in its own named
    # phase, with a real host round trip (block_until_ready returns early
    # through the tunnel; a scalar fetch does not). BENCH_r03's 681 s init
    # stall (DESIGN §37) hid inside the init phase because the connect
    # happened wherever the first default-device op landed; now the stall
    # has exactly one attributable name, the record carries it, and the
    # parent watchdog can see it live via the progress file.
    float(jax.device_put(jnp.float32(0), jax.devices()[0]))
    t0 = _trace("backend_connect", t0)

    model = MobileNetV2UNet(
        output_channels=10,
        dtype=jnp.bfloat16,
        use_pallas=PALLAS,
        stem_s2d=S2D,
        up_subpixel=SUBPIX,
        upsample_head=not (FUSED_HEAD or XLA_HEAD),
        head_fp32=not BF16_HEAD,
    )
    if FUSED_HEAD:
        from tpuseg.ops.pallas_kernels import upsample2x_argmax

        def classes_of(params, x):
            return upsample2x_argmax(model.apply(params, x, train=False))
    elif XLA_HEAD:
        from tpuseg.ops.resize import upsample2x_argmax_head

        # TPUSEG_BENCH_XLA_HEAD=2 -> int32 phase outputs (A/B: uint8
        # interleave forces an 8-bit relayout on TPU)
        head_dtype = (jnp.int32 if os.environ.get(
            "TPUSEG_BENCH_XLA_HEAD") == "2" else jnp.uint8)

        def classes_of(params, x):
            return upsample2x_argmax_head(
                model.apply(params, x, train=False), out_dtype=head_dtype
            )
    else:
        def classes_of(params, x):
            return jnp.argmax(model.apply(params, x, train=False), axis=-1)
    # Init on the HOST CPU as ONE jitted program (eager init is hundreds
    # of tiny dispatches — 250+ s measured), then ship the tree in one
    # packed transfer (per-leaf device_put measured 526 s through the
    # tunnel). Shared helpers: tpuseg.core.device_io.
    from tpuseg.core.device_io import device_put_packed, init_on_host

    def _init(key):
        return model.init(key, jnp.zeros((1, 128, 256, 3)), train=False)

    variables = init_on_host(_init, jax.random.PRNGKey(0))
    t0 = _trace("init", t0)
    variables = device_put_packed(variables)
    t0 = _trace("params_to_device", t0)
    if FOLDBN:  # exact BN fold (deployment inference config)
        from tpuseg.export.quantize import fold_batchnorm

        variables = fold_batchnorm(variables)
    if INT8:  # calibrated full-int8 path (export.int8_full)
        from tpuseg.export.int8_full import calibrate

        calib = [jnp.asarray(
            np.random.RandomState(7).rand(4, HEIGHT, WIDTH, 3), jnp.float32
        )]
        variables = dict(variables)
        variables["quant"] = calibrate(model, variables, calib)

    @jax.jit
    def fwd(params, x):
        return classes_of(params, x)

    @jax.jit
    def bench_fn(params, x):
        def body(carry, _):
            inp = x + carry * 1e-9  # data dependency defeats overlap
            out = classes_of(params, inp)
            return jnp.sum(out.astype(jnp.float32)), ()

        s, _ = lax.scan(body, jnp.float32(0), None, length=CHAIN)
        return s

    # Generate the input batch ON the device: at the headline config it is
    # 805 MB of fp32 — tens of seconds through the ~30 MB/s tunnel (plus the
    # host-side RNG fill) for data whose values the measurement doesn't
    # depend on. One tiny key transfer + one cached uniform program instead.
    x = jax.jit(
        lambda k: jax.random.uniform(
            k, (BATCH, HEIGHT, WIDTH, 3), jnp.float32
        )
    )(jax.device_put(jax.random.PRNGKey(0), jax.devices()[0]))
    t0 = _trace("input_gen", t0)
    flops_frame = _flops_per_frame(fwd, variables, x)
    t0 = _trace("cost_analysis", t0)
    float(bench_fn(variables, x))  # compile + warm
    t0 = _trace("compile_warm", t0)
    fps_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_fn(variables, x))  # host fetch = true sync
        dt = time.perf_counter() - t0
        fps_runs.append(BATCH * CHAIN / dt)
    fps = max(fps_runs)
    tflops = fps * flops_frame / 1e12
    return {
        "fps": fps,
        "runs": [round(f, 1) for f in fps_runs],
        "flops_per_frame": flops_frame,
        "tflops": tflops,
        "mfu_pct": 100.0 * tflops / PEAK_BF16_TFLOPS,
        "phases": dict(_PHASES),
    }


def _config_tag() -> dict:
    return {"s2d": S2D, "pallas": PALLAS, "int8": INT8, "foldbn": FOLDBN,
            "subpix": SUBPIX, "fused_head": FUSED_HEAD,
            "xla_head": XLA_HEAD, "bf16_head": BF16_HEAD, "batch": BATCH,
            "size": f"{WIDTH}x{HEIGHT}"}


def _record(m: dict, stale: bool = False) -> dict:
    ref_fps = REFERENCE_CPU_FPS.get((WIDTH, HEIGHT), REFERENCE_CPU_FPS_512)
    rec = {
        "metric": f"mobilenetv2_unet_infer_{WIDTH}x{HEIGHT}_fps_per_chip",
        "value": round(m["fps"], 1),
        "unit": "frames/sec",
        "vs_baseline": round(m["fps"] / ref_fps, 1),
        "tflops": round(m.get("tflops", 0.0), 2),
        "mfu_pct": round(m.get("mfu_pct", 0.0), 2),
        # batch/size ALWAYS recorded top-level so history filtering never
        # conflates configs when a default changes (ADVICE r1 item 2: the
        # 128->256 default switch made old untagged batch-128 records look
        # current; history is retro-tagged and filters match on these)
        "batch": BATCH,
        "size": f"{WIDTH}x{HEIGHT}",
    }
    if m.get("runs"):
        rec["runs"] = m["runs"]
    # Phase timings INSIDE the parsed artifact (VERDICT r3 item 2: the
    # 681 s init stall was visible only in the stderr tail), plus the
    # compile-cache probe status and an explicit stall verdict so a
    # headline can't silently ride a degraded start.
    if m.get("phases"):
        rec["phases"] = m["phases"]
        connect = m["phases"].get("backend_connect")
        if connect is not None:
            rec["init_stalled"] = bool(connect > INIT_STALL_S)
            rec["init_stall_bar"] = INIT_STALL_S
    if stale:
        rec["stale"] = True
    cfg = _config_tag()
    if any(
        cfg[k]
        for k in ("s2d", "pallas", "int8", "foldbn", "fused_head",
                  "xla_head", "bf16_head")
    ) or not cfg["subpix"] or cfg["batch"] != DEFAULT_BATCH \
            or (WIDTH, HEIGHT) != DEFAULT_SIZE:
        rec["config"] = cfg
    return rec


def _ab_toggles(rec: dict) -> tuple:
    """Normalized A/B toggle state of a record (defaults when untagged)."""
    cfg = rec.get("config") or {}
    return tuple(
        bool(cfg.get(k))
        for k in ("s2d", "pallas", "int8", "foldbn", "fused_head",
                  "xla_head", "bf16_head")
    ) + (bool(cfg.get("subpix", True)),)


def _same_measurement(rec: dict, expected: dict) -> bool:
    """Same metric, same batch, same size, same A/B toggles."""
    return (
        rec.get("metric") == expected["metric"]
        and rec.get("batch") == expected["batch"]
        and rec.get("size") == expected["size"]
        and _ab_toggles(rec) == _ab_toggles(expected)
    )


def _history_best() -> float:
    """Best real (non-stale) fps recorded for the CURRENT config
    (same batch, size, and A/B toggles — retro-tagged history included)."""
    expected = _record({"fps": 0.0})
    best = 0.0
    for rec in _history_records():
        if rec.get("stale") or not _same_measurement(rec, expected):
            continue
        best = max(best, float(rec.get("value", 0.0)))
    return best


def _child() -> None:
    """Measure, append the record to history, print the JSON line.

    History is written by the CHILD so that a run the parent watchdog gave
    up waiting for still records its (real) measurement once it finishes —
    the next invocation's stale fallback then reports it instead of an
    older number."""
    rec = _record(_measure())
    try:
        from tpuseg.core.platform import cache_status

        rec["cache_status"] = cache_status()
    except Exception:
        pass
    best = _history_best()
    if best > 0 and rec["value"] < 0.8 * best:
        rec["regression_from_best"] = best
        print(
            f"WARNING: fps {rec['value']} < 0.8x historical best {best} "
            "— perf regression", file=sys.stderr,
        )
    with open(HISTORY, "a") as f:
        f.write(json.dumps({**rec, "t": time.time()}) + "\n")
    print(json.dumps(rec))


def main() -> None:
    """Measure in a child process behind a NON-KILLING watchdog.

    The round-1 failure mode, twice over: the driver's fresh bench blew the
    480 s watchdog on cold compile + the tunnel's first-dispatch cost
    (~160-350 s measured), and the watchdog's kill() landed mid-TPU-execution
    and wedged the chip for hours (CLAUDE.md's own never-kill rule). So:

    - ONE long attempt (default 2400 s; the persistent compile cache in
      _measure keeps warm runs far under that);
    - on timeout the child is ABANDONED, never killed: the parent prints the
      last real same-config measurement marked "stale": true and exits,
      while the child runs to completion in the background and appends its
      real record to bench_history.json for the next caller.
    """
    import subprocess
    import tempfile

    if os.environ.get("TPUSEG_BENCH_CHILD"):
        _child()
        return

    env = dict(os.environ, TPUSEG_BENCH_CHILD="1")
    watchdog_s = int(os.environ.get("TPUSEG_BENCH_TIMEOUT", "2400"))
    # If this host isn't recorded compatible with the cache's AOT artifacts,
    # the child will probe (one CPU subprocess) and may cold-compile in a
    # per-host cache subdir — widen the (non-killing) watchdog so the fresh
    # measurement still lands instead of falling back to a stale record.
    # Loaded from the file directly: the parent must stay jax-import-free.
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_tpuseg_platform",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tpuseg", "core", "platform.py"),
        )
        _plat = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_plat)
        status = _plat.cache_status()
        if status != "compatible" and "TPUSEG_BENCH_TIMEOUT" not in os.environ:
            widened = max(watchdog_s, 3600)
            print(
                f"bench: compile cache status {status!r} for this host — "
                f"watchdog {watchdog_s}s -> {widened}s (probe and/or cold "
                "compile ahead)", file=sys.stderr,
            )
            watchdog_s = widened
    except Exception:
        pass  # widening is best-effort; the stale fallback still exists
    is_cpu = os.environ.get("TPUSEG_BENCH_PLATFORM") == "cpu"

    def _spawn():
        out_file = tempfile.NamedTemporaryFile(
            mode="w+", suffix=".bench.json", delete=False
        )
        child_env = dict(env, TPUSEG_BENCH_PROGRESS=out_file.name + ".progress")
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=child_env, stdout=out_file, stderr=sys.stderr,
            start_new_session=True,  # survives parent exit (abandon, not kill)
        )
        return child, out_file

    def _abandon(child, out_file, why: str) -> None:
        if is_cpu:
            # a CPU child cannot wedge a chip — reap it (tests use this)
            child.kill()
            child.wait()
            print(f"bench: {why} (cpu child killed)", file=sys.stderr)
            out_file.close()
            for path in (out_file.name, out_file.name + ".progress"):
                try:
                    os.unlink(path)
                except OSError:
                    pass
        else:
            # abandoned child still owns its stdout/progress files and will
            # append its real record to bench_history.json if it completes
            print(
                f"bench: {why} — child left running (never kill "
                "mid-TPU-execution)", file=sys.stderr,
            )
            out_file.close()

    # Init-stall watch (VERDICT r3 item 2): the parent polls the child's
    # progress file; a child that reported its imports phase but not
    # backend_connect within INIT_STALL_S is the DESIGN §37 blocked-client
    # state, which never recovers — abandon it and retry ONCE in a fresh
    # child after RETRY_SPACING_S (the documented cure). The overall
    # watchdog still bounds each attempt, and the stale-fallback path
    # records how many inits stalled.
    init_retries = 0
    max_init_retries = int(os.environ.get("TPUSEG_BENCH_INIT_RETRIES", "1"))
    result_line = None
    while True:
        child, out_file = _spawn()
        progress = out_file.name + ".progress"
        started = time.time()
        imports_seen_at = None
        connected = False
        verdict = None  # "exit" | "timeout" | "init_stall"
        while True:
            if child.poll() is not None:
                verdict = "exit"
                break
            now = time.time()
            if now - started > watchdog_s:
                verdict = "timeout"
                break
            if not connected:
                try:
                    with open(progress) as pf:
                        txt = pf.read()
                except OSError:
                    txt = ""
                if "PHASE backend_connect" in txt:
                    connected = True
                elif imports_seen_at is None and "PHASE imports" in txt:
                    imports_seen_at = now
                if (not connected and imports_seen_at is not None
                        and now - imports_seen_at > INIT_STALL_S + 10):
                    verdict = "init_stall"
                    break
            time.sleep(2)
        if verdict == "exit":
            out_file.seek(0)
            for line in out_file.read().splitlines():
                line = line.strip()
                if line.startswith("{"):
                    result_line = line
                    break
            out_file.close()
            try:
                os.unlink(out_file.name)
                os.unlink(progress)
            except OSError:
                pass
            if result_line is None:
                print("bench child produced no record", file=sys.stderr)
            break
        if verdict == "init_stall":
            if init_retries < max_init_retries:
                init_retries += 1
                _abandon(
                    child, out_file,
                    f"backend init exceeded {INIT_STALL_S}s (DESIGN §37 "
                    f"stall) — retry {init_retries}/{max_init_retries} "
                    f"after {RETRY_SPACING_S}s spacing",
                )
                time.sleep(RETRY_SPACING_S)
                continue
            # retries exhausted and the retry child stalled too: a blocked
            # client never recovers (§37), so waiting out the full watchdog
            # would only delay the stale fallback — abandon NOW. (This also
            # makes the retry test event-driven instead of racing the
            # watchdog budget; VERDICT r4 item 4.)
            _abandon(
                child, out_file,
                f"backend init exceeded {INIT_STALL_S}s again after "
                f"{init_retries} retry(ies) — reporting last real "
                "measurement as stale",
            )
            break
        # overall timeout
        _abandon(child, out_file,
                 f"timed out after {watchdog_s}s; reporting last real "
                 "measurement as stale")
        break
    if result_line is not None:
        if init_retries:
            rec = json.loads(result_line)
            rec["init_retries"] = init_retries
            result_line = json.dumps(rec)
        print(result_line)
        return
    # Timed out (or no record): report the last real measurement for THIS
    # exact (batch, size, A/B-toggle) measurement, marked stale.
    expected = _record({"fps": 0.0})
    last = None
    for rec in reversed(_history_records()):
        if not rec.get("stale") and _same_measurement(rec, expected):
            last = rec
            break
    if last:
        stale_rec = _record(
            {"fps": last["value"], "tflops": last.get("tflops", 0.0),
             "mfu_pct": last.get("mfu_pct", 0.0)}, stale=True)
    else:
        stale_rec = _record({"fps": 0.0}, stale=True)
    if init_retries:
        stale_rec["init_retries"] = init_retries
    print(json.dumps(stale_rec))


if __name__ == "__main__":
    main()
