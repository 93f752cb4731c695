#!/usr/bin/env python
"""Training-throughput microbenchmark (imgs/sec/chip — BASELINE.md target).

Measures the steady-state jitted train step (fwd + CE + bwd + Adam) with
device-resident batches, isolating device throughput from the single-core
host input pipeline. Uses the same scan-chaining + host-fetch sync as
bench.py (block_until_ready returns early through the remote tunnel).

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


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--model", default="mobilenetv2_unet")
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.configs import ModelConfig
    from tpuseg.models.registry import build_model
    from tpuseg.train.train_step import create_train_state, make_train_step

    model = build_model(
        ModelConfig(name=args.model, compute_dtype=args.dtype)
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, args.height, args.width, 3)
    )
    step = make_train_step(donate=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, args.height, args.width, 3),
                    jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, (args.batch, args.height, args.width)),
                    jnp.int32)

    state, m = step(state, x, y)        # compile
    float(m["loss"])                    # true sync
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, x, y)
    loss = float(m["loss"])             # sync: fetch forces completion
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"{args.model}_train_{args.width}x{args.height}_imgs_per_sec",
        "value": round(args.batch * args.steps / dt, 1),
        "unit": "imgs/sec",
        "loss": loss,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
