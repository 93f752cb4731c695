#!/usr/bin/env python
"""Serving throughput of the exported StableHLO artifact vs the live model.

The deployment question bench.py doesn't answer: after `convert.py` writes
the portable artifact (tpuseg/export/stablehlo.py — the ONNX-analogue
contract, reference convert.py:29-42), does a consumer that deserializes and
jits `exported.call` get the same throughput as the live `model.apply`?
Two things could diverge: the artifact bakes the weights in as constants,
and `export_model` folds BatchNorm by default — and the BN-folded graph
measured 25% SLOWER than the live model on this chip (docs/DESIGN.md §24,
BASELINE.md "Apply-time path A/Bs"), so the fold default matters for TPU
serving, not just artifact size.

    python tools/artifact_bench.py [--platform cpu] [--batch N]
        [--size WxH] [--fold_bn | --no-fold_bn] [--chain N]

Protocol = bench.py's: scan-chained calls with a data dependency + a scalar
fetch (block_until_ready returns early through the remote tunnel). Records
append to bench_history.json only for real-TPU runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default="")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", default="512x512")
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--fold_bn", action="store_true", default=False,
                   help="export with BN folded (convert.py's default)")
    p.add_argument("--history", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_history.json"))
    args = p.parse_args(argv)

    import jax

    from tpuseg.core.platform import env_platform_override

    platform = args.platform or env_platform_override()
    if platform:
        jax.config.update("jax_platforms", platform)
    else:
        from tpuseg.core.device_io import ensure_cpu_backend

        ensure_cpu_backend()
    from tpuseg.core.platform import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    from jax import lax

    from tpuseg.core.device_io import device_put_packed, init_on_host
    from tpuseg.export.stablehlo import export_model, load_exported
    from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet

    width, height = (int(v) for v in args.size.lower().split("x"))
    model = MobileNetV2UNet(output_channels=10, dtype=jnp.bfloat16)

    def _init(key):
        return model.init(key, jnp.zeros((1, 64, 128, 3)), train=False)

    variables = init_on_host(_init, jax.random.PRNGKey(0))

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.stablehlo")
        # export runs host-side from the host variables (constants are baked
        # into the artifact); the live comparator gets a packed device copy
        export_model(
            model, variables, height, width, path,
            batch=args.batch, fold_bn=args.fold_bn,
        )
        call = load_exported(path)
        dev_vars = device_put_packed(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
        )

        def live_fn(x):
            return model.apply(dev_vars, x, train=False)

        def chained(fn):
            @jax.jit
            def bench(x):
                def body(carry, _):
                    out = fn(x + carry * 1e-9)
                    return jnp.sum(
                        jnp.argmax(out, axis=-1).astype(jnp.float32)
                    ), ()

                s, _ = lax.scan(body, jnp.float32(0), None, length=args.chain)
                return s

            return bench

        x = jax.jit(
            lambda k: jax.random.uniform(
                k, (args.batch, height, width, 3), jnp.float32
            )
        )(jax.device_put(jax.random.PRNGKey(0), jax.devices()[0]))

        results = {}
        for name, fn in (("artifact", call), ("live", live_fn)):
            bench = chained(fn)
            float(bench(x))  # compile + warm
            fps_runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(bench(x))
                fps_runs.append(
                    args.batch * args.chain / (time.perf_counter() - t0)
                )
            results[name] = max(fps_runs)

    rec = {
        "metric": f"stablehlo_artifact_infer_{width}x{height}_fps_per_chip",
        "value": round(results["artifact"], 1),
        "unit": "frames/sec",
        "live_fps": round(results["live"], 1),
        "artifact_vs_live": round(results["artifact"] / results["live"], 3),
        "batch": args.batch,
        "size": f"{width}x{height}",
        "config": {"fold_bn": args.fold_bn, "batch": args.batch,
                   "size": f"{width}x{height}"},
    }
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if on_tpu:
        with open(args.history, "a") as f:
            f.write(json.dumps({**rec, "t": time.time()}) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
