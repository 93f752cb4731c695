#!/usr/bin/env python
"""On-chip A/B: Pallas fused argmax+colorize vs argmax-only (host colorize).

The last Pallas kernel shipped without an on-chip measurement (VERDICT r1
weak item 5): ``argmax_colorize`` emits the packed-BGR overlay on device so
the host video loop skips its palette pass. This times the full Predictor
program both ways with the same honesty protocol as bench.py (lax.scan
chain + scalar fetch — block_until_ready returns early through the remote
tunnel).

    python tools/colorize_bench.py [--batch 64] [--chain 32]
        [--width 256 --height 128] [--frame_h 360 --frame_w 640]

Prints one JSON line per variant and appends them to bench_history.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--chain", type=int, default=32)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--frame_h", type=int, default=360)
    p.add_argument("--frame_w", type=int, default=640)
    p.add_argument("--platform", default="")
    p.add_argument("--variants", default="",
                   help="comma list: argmax_only,argmax_colorize,"
                        "argmax_colorize_xla (default: all)")
    p.add_argument("--history", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_history.json"))
    args = p.parse_args(argv)

    import jax

    from tpuseg.core.platform import env_platform_override

    platform = args.platform or env_platform_override()
    if platform:
        jax.config.update("jax_platforms", platform)
    from tpuseg.core.platform import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpuseg.data.augment import normalize_images
    from tpuseg.data.class_maps import COLOR_MAP_BGR
    from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet
    from tpuseg.ops.resize import resize_bilinear, resize_nearest

    model = MobileNetV2UNet(output_channels=10, dtype=jnp.bfloat16)
    # host init + packed transfer (see core/device_io: eager remote init
    # costs a tunnel round trip per op)
    from tpuseg.core.device_io import (
        device_put_packed, ensure_cpu_backend, init_on_host)

    ensure_cpu_backend()
    variables = init_on_host(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.height, args.width, 3)),
        train=False,
    ))
    variables = device_put_packed(variables)
    interpret = jax.devices()[0].platform == "cpu"

    def classes_only(frames):
        x = resize_bilinear(frames.astype(jnp.float32), args.height,
                            args.width, align_corners=False)
        logits = model.apply(variables, normalize_images(x), train=False)
        classes = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return resize_nearest(classes, args.frame_h, args.frame_w)

    def classes_colorize(frames):
        from tpuseg.ops.pallas_kernels import argmax_colorize

        x = resize_bilinear(frames.astype(jnp.float32), args.height,
                            args.width, align_corners=False)
        logits = model.apply(variables, normalize_images(x), train=False)
        classes, packed = argmax_colorize(
            logits, COLOR_MAP_BGR, interpret=interpret, prefer_pallas=True
        )
        return (resize_nearest(classes, args.frame_h, args.frame_w),
                resize_nearest(packed, args.frame_h, args.frame_w))

    def classes_colorize_xla(frames):
        from tpuseg.ops.pallas_kernels import argmax_colorize_reference

        x = resize_bilinear(frames.astype(jnp.float32), args.height,
                            args.width, align_corners=False)
        logits = model.apply(variables, normalize_images(x), train=False)
        classes, packed = argmax_colorize_reference(logits, COLOR_MAP_BGR)
        return (resize_nearest(classes, args.frame_h, args.frame_w),
                resize_nearest(packed, args.frame_h, args.frame_w))

    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (args.batch, args.frame_h, args.frame_w, 3), np.uint8))

    variants = {"argmax_only": classes_only,
                "argmax_colorize": classes_colorize,
                "argmax_colorize_xla": classes_colorize_xla}
    names = (args.variants.split(",") if args.variants
             else list(variants))
    results = {}
    for name in names:
        fn = variants[name]
        @jax.jit
        def bench_fn(frames, fn=fn):
            def body(carry, _):
                out = fn(jnp.clip(frames + carry, 0, 255))
                head = out[0] if isinstance(out, tuple) else out
                s = jnp.sum(head.astype(jnp.uint32) & 0xFF)
                return (s % 2).astype(jnp.uint8), ()

            s, _ = lax.scan(body, jnp.uint8(0), None, length=args.chain)
            return s

        int(bench_fn(frames))  # compile + warm
        fps_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(bench_fn(frames))
            dt = time.perf_counter() - t0
            fps_runs.append(args.batch * args.chain / dt)
        rec = {
            "metric": f"predictor_{name}_{args.width}x{args.height}"
                      f"_to_{args.frame_w}x{args.frame_h}_fps",
            "value": round(max(fps_runs), 1),
            "unit": "frames/sec",
            "runs": [round(f, 1) for f in fps_runs],
            "batch": args.batch,
        }
        results[name] = rec["value"]
        # cpu runs (tests/smoke) never pollute the auditable history the
        # A/B decisions cite; TPUSEG_BENCH_HISTORY overrides the target
        # like bench.py/train_bench
        history = os.environ.get("TPUSEG_BENCH_HISTORY", args.history)
        if history and jax.devices()[0].platform != "cpu":
            with open(history, "a") as f:
                f.write(json.dumps({**rec, "t": time.time()}) + "\n")
        print(json.dumps(rec))
    if "argmax_only" in results:
        base = max(results["argmax_only"], 1e-9)
        ratios = {f"{k}_vs_argmax_only": round(v / base, 4)
                  for k, v in results.items() if k != "argmax_only"}
        if ratios:
            print(json.dumps(ratios))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
