#!/usr/bin/env python
"""Training-throughput microbenchmark (imgs/sec/chip — BASELINE.md target).

Measures the steady-state jitted train step (fwd + CE + bwd + Adam) with
device-resident batches, isolating device throughput from the single-core
host input pipeline. The step is chained ``--steps`` times inside ONE jitted
``lax.scan`` (state threads the data dependency) and the final loss is
fetched to host — the same honesty method as bench.py: per-step dispatch
through the remote tunnel adds ~100 ms latency per call, which understates
device throughput ~6x (measured 574 vs chained imgs/sec @256x128), and
``block_until_ready`` returns early so only a host fetch is a true sync.

    python tools/train_bench.py [--batch 64] [--width 256] [--height 128]
        [--dtype bfloat16] [--steps 10] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e bf16 peak TFLOP/s and HBM bandwidth GB/s per chip (public spec).
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--model", default="mobilenetv2_unet")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the encoder: on an HBM-bound step, "
                        "recomputing activations can beat storing them")
    p.add_argument("--loss", default="",
                   help="configured loss for the step ('' = the default "
                        "plain-CE path): ce|focal|dice|ce+dice|lovasz|"
                        "ce+lovasz — measures the device-side cost of the "
                        "loss itself (lovasz sorts H*W errors per class; "
                        "DESIGN §45)")
    p.add_argument("--lovasz_bins", type=int, default=256,
                   help="level-set resolution for --loss lovasz/ce+lovasz "
                        "(0 = the exact-sort path: the measured 26x A/B)")
    p.add_argument("--eval", action="store_true",
                   help="benchmark the eval step (fwd + loss + confusion "
                        "matrix) instead of the train step")
    p.add_argument("--tta", default="",
                   choices=["", "flip", "ms", "flip+ms"],
                   help="with --eval: measure the TTA step's real cost "
                        "(DESIGN §43 quotes FLOPs multiples; this measures "
                        "imgs/s)")
    p.add_argument("--ms_scales", default="0.75,1.25",
                   help="multi-scale TTA factors for --tta ms|flip+ms")
    p.add_argument("--mu_dtype", default="",
                   help="storage dtype for Adam's first moment (optax "
                        "mu_dtype; '' = fp32 parity; 'bfloat16' measured "
                        "NOISE on this model — the mu tree is 0.04% of "
                        "step traffic, DESIGN §46)")
    p.add_argument("--grads_bf16", action="store_true",
                   help="cast gradients to bf16 between backward and the "
                        "optimizer update (measured LOSING 4-6%: breaks "
                        "backward->Adam fusion; DESIGN §46)")
    p.add_argument("--bf16_head", action="store_true",
                   help="run the final x2 upsample contraction in the "
                        "compute dtype (model.head_fp32=false): halves the "
                        "full-res logit traffic of an HBM-bound step at "
                        "bf16-rounding tolerance (DESIGN §21)")
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)
    if args.eval and args.loss:
        # the eval step runs a fixed CE+confusion program; accepting --loss
        # here would write a falsely-tagged record into bench_history.json
        p.error("--loss configures the TRAIN step; drop it with --eval")
    if args.tta and not args.eval:
        p.error("--tta measures the EVAL step; add --eval")

    from tpuseg.core.platform import env_platform_override

    platform = args.platform or env_platform_override()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from tpuseg.core.platform import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpuseg.configs import ModelConfig
    from tpuseg.models.registry import build_model
    from tpuseg.train.train_step import create_train_state, make_train_step

    model = build_model(
        ModelConfig(name=args.model, compute_dtype=args.dtype,
                    head_fp32=not args.bf16_head)
    )
    tx = None
    if args.mu_dtype:
        import optax

        # same construction as Trainer._build_optimizer's mu_dtype branch
        tx = optax.adam(1.5e-4, mu_dtype=jnp.dtype(args.mu_dtype))
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, args.height, args.width, 3),
        tx=tx,
    )
    # create_train_state returns HOST (numpy) leaves — the Trainer packs
    # them to the device; a bench must too, or every timed chain call
    # re-uploads ~300 leaves through the tunnel at one RPC each (~2 s,
    # measured: 640-img chain 2.1 s host-state vs 0.27 s device-state).
    from tpuseg.core.device_io import device_put_packed

    state = device_put_packed(state)
    # scan threads state; no donation
    if args.eval:
        from tpuseg.train.train_step import make_eval_step

        eval_step = make_eval_step(
            10, tta=args.tta,
            ms_scales=tuple(float(s) for s in args.ms_scales.split(",")
                            if s.strip()),
        )

        # The eval step is stateless, so the scan threads a scalar carry
        # INTO the inputs (bench.py's honesty trick) — otherwise XLA hoists
        # the loop-invariant computation out and the chain measures nothing.
        def step(st, xx, yy, carry=None):
            if carry is not None:
                xx = xx + carry * 1e-9
            out = eval_step(st, xx, yy, jnp.int32(xx.shape[0]))
            # per-image loss (loss_sum/batch) so the record compares with
            # the train rows; the confusion term only threads a data dep
            dep = out["loss_sum"] / xx.shape[0] + jnp.sum(
                out["confusion"]).astype(jnp.float32) * 1e-20
            return st, {"loss": dep}

        cost_lowered = lambda: eval_step.lower(
            state, x, y, jnp.int32(args.batch))
    else:
        loss_fn = None
        if args.loss:
            from tpuseg.train.loss import make_loss_fn

            loss_fn = make_loss_fn(args.loss, lovasz_bins=args.lovasz_bins)
        step = make_train_step(donate=False, remat=args.remat,
                               loss_fn=loss_fn, grads_bf16=args.grads_bf16)
        cost_lowered = lambda: step.lower(state, x, y)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, args.height, args.width, 3),
                    jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, (args.batch, args.height, args.width)),
                    jnp.int32)

    if args.eval:
        @jax.jit
        def chain(st, xx, yy):
            def body(carry, _):
                s, prev = carry
                s2, m = step(s, xx, yy, prev)
                return (s2, m["loss"]), m["loss"]

            (_, _), losses = lax.scan(
                body, (st, jnp.float32(0)), None, length=args.steps
            )
            return st, losses[-1]
    else:
        @jax.jit
        def chain(st, xx, yy):
            def body(s, _):
                s2, m = step(s, xx, yy)
                return s2, m["loss"]

            s2, losses = lax.scan(body, st, None, length=args.steps)
            return s2, losses[-1]

    flops_per_img = 0.0
    bytes_per_step = 0.0
    try:
        cost = cost_lowered().compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_img = float(cost["flops"]) / args.batch
        # XLA's post-fusion HBM traffic estimate. A depthwise-heavy model is
        # bandwidth-bound, so report how much of the step time the minimum
        # HBM time explains (roofline %): MFU alone under-states how close
        # the step is to its real ceiling.
        bytes_per_step = float(cost.get("bytes accessed", 0.0))
    except Exception:
        pass

    st2, loss = chain(state, x, y)      # compile
    float(loss)                         # true sync
    t0 = time.perf_counter()
    st2, loss = chain(state, x, y)
    loss = float(loss)                  # sync: fetch forces completion
    dt = time.perf_counter() - t0
    imgs_per_sec = args.batch * args.steps / dt
    mode = "eval" if args.eval else "train"
    rec = {
        "metric":
            f"{args.model}_{mode}_{args.width}x{args.height}_imgs_per_sec",
        "value": round(imgs_per_sec, 1),
        "unit": "imgs/sec",
        "loss": loss,
    }
    if flops_per_img > 0:
        tflops = imgs_per_sec * flops_per_img / 1e12
        rec["tflops"] = round(tflops, 2)
        rec["mfu_pct"] = round(100.0 * tflops / PEAK_BF16_TFLOPS, 2)
    if bytes_per_step > 0:
        step_s = dt / args.steps
        rec["hbm_gb_per_step"] = round(bytes_per_step / 1e9, 2)
        rec["hbm_gbps"] = round(bytes_per_step / 1e9 / step_s, 1)
        rec["hbm_roofline_pct"] = round(
            100.0 * (bytes_per_step / 1e9 / PEAK_HBM_GBPS) / step_s, 1
        )
    # Append to the same auditable history bench.py uses (config-tagged so
    # filters never conflate configs). CPU runs (tests/smoke) don't record;
    # TPUSEG_BENCH_HISTORY="" disables explicitly.
    history = os.environ.get(
        "TPUSEG_BENCH_HISTORY",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench_history.json"),
    )
    platform = jax.devices()[0].platform
    if history and platform != "cpu":
        tagged = {
            **rec,
            "batch": args.batch,
            "size": f"{args.width}x{args.height}",
            "config": {
                "model": args.model, "dtype": args.dtype,
                "remat": bool(args.remat), "eval": bool(args.eval),
                "bf16_head": bool(args.bf16_head), "steps": args.steps,
                "loss_name": args.loss or "ce_default",
                "lovasz_bins": args.lovasz_bins,
                "mu_dtype": args.mu_dtype,
                "grads_bf16": bool(args.grads_bf16),
                "tta": args.tta,
                "ms_scales": args.ms_scales if "ms" in args.tta else "",
            },
            "t": time.time(),
        }
        with open(history, "a") as f:
            f.write(json.dumps(tagged) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
