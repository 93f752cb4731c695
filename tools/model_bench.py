#!/usr/bin/env python
"""Inference throughput for ANY registry model — the family comparator.

bench.py is the driver's flagship headline (MobileNetV2UNet only); this
generalizes its measurement core so new families (mobilenetv2_fpn, unet,
light_unet, width_mult variants) get honest on-chip numbers with the same
protocol: state packed to device first (DESIGN §22), scan-chained calls
with a data dependency, scalar fetch to sync (block_until_ready returns
early through the remote tunnel), best of 3 timed runs.

    python tools/model_bench.py --model mobilenetv2_fpn --batch 256 \
        --size 512x512 [--platform cpu] [--base_filters N] [--fp32]

Real-TPU runs append a config-tagged record to bench_history.json.
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
    p.add_argument("--model", default="mobilenetv2_fpn")
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--base_filters", type=int, default=0)
    p.add_argument("--width_mult", type=float, default=1.0)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", default="512x512")
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--fp32", action="store_true",
                   help="fp32 compute (default bf16, the serving dtype)")
    p.add_argument("--platform", default="")
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
    from jax import lax

    from tpuseg.configs import ModelConfig
    from tpuseg.core.device_io import device_put_packed, init_on_host
    from tpuseg.models.registry import build_model

    width, height = (int(v) for v in args.size.lower().split("x"))
    cfg = ModelConfig(
        name=args.model,
        num_classes=args.num_classes,
        base_filters=args.base_filters,
        width_mult=args.width_mult,
        compute_dtype="float32" if args.fp32 else "bfloat16",
    )
    model = build_model(cfg)

    def _init(key):
        return model.init(
            key, jnp.zeros((1, height, width, 3)), train=False
        )

    variables = init_on_host(_init, jax.random.PRNGKey(0))
    dev_vars = device_put_packed(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    )

    @jax.jit
    def bench(x):
        def body(carry, _):
            out = model.apply(dev_vars, x + carry * 1e-9, train=False)
            return jnp.sum(
                jnp.argmax(out, axis=-1).astype(jnp.float32)
            ), ()

        s, _ = lax.scan(body, jnp.float32(0), None, length=args.chain)
        return s

    x = jax.jit(
        lambda k: jax.random.uniform(
            k, (args.batch, height, width, 3), jnp.float32
        )
    )(jax.device_put(jax.random.PRNGKey(0), jax.devices()[0]))

    float(bench(x))  # compile + warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench(x))
        runs.append(
            round(args.batch * args.chain / (time.perf_counter() - t0), 1)
        )

    rec = {
        "metric": f"{args.model}_infer_{width}x{height}_fps_per_chip",
        "value": max(runs),
        "unit": "frames/sec",
        "runs": runs,
        "batch": args.batch,
        "size": f"{width}x{height}",
        "config": {
            "model": args.model, "batch": args.batch,
            "size": f"{width}x{height}",
            "dtype": cfg.compute_dtype,
            "base_filters": args.base_filters,
            "width_mult": args.width_mult,
        },
    }
    if jax.devices()[0].platform not in ("cpu",):
        with open(args.history, "a") as f:
            f.write(json.dumps({**rec, "t": time.time()}) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
