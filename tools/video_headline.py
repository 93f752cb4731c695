#!/usr/bin/env python
"""Video-headline protocol runner: N gated runs or no headline.

VERDICT r4 item 3: the 294.8 fps video headline was n=1, admitted through
the tunnel gate's 50 ms absolute floor (fetch_wait was 12% of a 0.407 s
wall — on a 120-frame clip the wall is so short the floor ALWAYS dominates
the 5%-of-wall clause). This tool makes the gate binding and the headline
reproducible:

  - protocol clip: assets/demo_long.mp4 (600 frames — at ~300 fps the wall
    is ~2 s, so 5% of wall is ~100 ms > the 50 ms floor: the clause binds);
  - ONE process = ONE TPU client (back-to-back client starts are the
    DESIGN §37 hazard), pipeline/jit state shared across attempts;
  - a headline requires >= --required CONSECUTIVE runs with
    tunnel_ok=true AND the 5% clause binding (0.05*wall > 0.05 s); runs
    are spaced --spacing s apart because the tunnel oscillates on
    ~minutes timescales (round 4 drew fetch_wait 0.001-1.07 s across
    eleven spaced attempts of the identical program);
  - output: one JSON line with every attempt's stats plus, when earned,
    {"headline_fps": mean, "spread": max-min, "gated_runs": [...]}.

The loop being beaten is the reference's frame-serial CPU video loop
(/root/reference/inference.py:151-176, measured 2.58 fps @512x512 — the
BASELINE denominator).

    python tools/video_headline.py --checkpoint checkpoints/best \
        [--attempts 12] [--required 3] [--spacing 45] [--write_output]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def clause_binding(stats: dict) -> bool:
    """True when the 5%-of-wall clause (not the 50 ms floor) is what the
    run's tunnel_ok verdict was judged against — i.e. the clip is long
    enough that 5% of the wall exceeds the floor."""
    return 0.05 * stats.get("seconds", 0.0) > 0.05


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--video", default=os.path.join(REPO, "assets",
                                                   "demo_long.mp4"))
    p.add_argument("--checkpoint", default="checkpoints/best")
    p.add_argument("--attempts", type=int, default=12,
                   help="max protocol runs before giving up on a headline")
    p.add_argument("--required", type=int, default=3,
                   help="consecutive gated runs needed for a headline")
    p.add_argument("--spacing", type=float, default=45.0,
                   help="seconds between attempts (tunnel state oscillates "
                        "on ~minutes timescales; same client throughout, "
                        "so this is pacing, not the §37 start hazard)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--no_preprocess_on_host", action="store_true",
                   help="measure the default arm instead of the "
                        "preprocess_on_host protocol arm")
    p.add_argument("--pack4", dest="pack4", action="store_true",
                   default=True,
                   help="fetch_pack4 arm (PROTOCOL DEFAULT — it earned "
                        "the round-5 headline): two class ids per fetched "
                        "byte, halving the tunnel fetch the gate watches "
                        "(DESIGN §50)")
    p.add_argument("--no_pack4", dest="pack4", action="store_false",
                   help="measure the unpacked-fetch arm (1 gated run in "
                        "27 attempts across the round-5 windows)")
    p.add_argument("--write_output", action="store_true",
                   help="write the overlay video each run (the protocol "
                        "includes the encode phase; off only for debugging)")
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)

    from tpuseg.core.platform import (
        enable_compile_cache,
        env_platform_override,
    )

    platform = args.platform or env_platform_override()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    enable_compile_cache()

    if not os.path.exists(args.video):
        # regenerate the protocol clip deterministically (committed asset,
        # but a fresh clone of tools/ alone can rebuild it)
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_mdv", os.path.join(REPO, "tools", "make_demo_video.py")
        )
        mdv = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mdv)
        mdv.main(args.video, frames=600)

    from tpuseg.configs import ModelConfig
    from tpuseg.infer.predictor import Predictor
    from tpuseg.infer.video import VideoPipeline

    predictor = Predictor(
        ModelConfig(compute_dtype="bfloat16"),
        checkpoint=args.checkpoint,
        input_hw=(args.height, args.width),
        batch_size=args.batch,
        preprocess_on_host=not args.no_preprocess_on_host,
        fetch_pack4=args.pack4,
    )
    pipeline = VideoPipeline(predictor)

    out_path = ""
    if args.write_output:
        out_path = os.path.join("/tmp", "video_headline_out.mp4")

    attempts = []
    streak = []  # consecutive gated runs' stats
    for i in range(args.attempts):
        if i:
            time.sleep(args.spacing)
        stats = pipeline.run(args.video, output_path=out_path)
        stats["clause_binding"] = clause_binding(stats)
        gated = bool(stats["tunnel_ok"] and stats["clause_binding"])
        stats["gated"] = gated
        attempts.append(stats)
        print(
            f"attempt {i + 1}/{args.attempts}: {stats['fps']:.1f} fps, "
            f"fetch_wait {stats['phases']['fetch_wait']:.3f}s of "
            f"{stats['seconds']:.3f}s wall, tunnel_ok={stats['tunnel_ok']}, "
            f"clause_binding={stats['clause_binding']}",
            file=sys.stderr, flush=True,
        )
        streak = streak + [stats] if gated else []
        if len(streak) >= args.required:
            break

    rec = {
        "metric": f"video_e2e_{os.path.basename(args.video)}_fps",
        "attempts": [
            {k: s[k] for k in
             ("fps", "seconds", "tunnel_ok", "clause_binding", "gated",
              "fps_ex_fetch", "phases")}
            for s in attempts
        ],
        "frames": attempts[0]["frames"] if attempts else 0,
        "required": args.required,
        "preprocess_on_host": not args.no_preprocess_on_host,
        "fetch_pack4": bool(args.pack4),
        "earned": len(streak) >= args.required,
    }
    if rec["earned"]:
        fpss = [s["fps"] for s in streak]
        rec["headline_fps"] = round(sum(fpss) / len(fpss), 1)
        rec["gated_runs"] = [round(f, 1) for f in fpss]
        rec["spread"] = round(max(fpss) - min(fpss), 1)
    # auditable history, same file bench.py uses; never from a cpu run
    import jax

    history = os.environ.get(
        "TPUSEG_BENCH_HISTORY", os.path.join(REPO, "bench_history.json")
    )
    if history and jax.devices()[0].platform != "cpu":
        with open(history, "a") as f:
            f.write(json.dumps({**rec, "t": time.time()}) + "\n")
    print(json.dumps(rec))
    return 0 if rec["earned"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
