#!/usr/bin/env python
"""Train-step time breakdown on the chip (training-MFU attack map).

Scan-chained timings (bench.py method) of nested pieces of the jitted
train step — the counterpart of tools/ablate_forward.py for training
(reference loop: /root/reference/src/train.py:31-39). Rows:

    fwd_eval    forward (BN running stats) + CE loss
    fwd_train   forward with BN batch statistics (train mode) + CE loss
    grad_evalbn value_and_grad, BN in eval mode (no stat computation)
    grad        value_and_grad, BN train mode (the real backward)
    full        grad + Adam update + BN stat swap (== train_step)

Deltas attribute wall-clock: (fwd_train - fwd_eval) = BN-stats cost,
(grad - fwd_train) = backward cost, (full - grad) = optimizer cost.

    python tools/ablate_train.py [--batch 64] [--width 256] [--height 128]
        [--chain 8] [--platform cpu]
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
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)
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
    from tpuseg.train.loss import cross_entropy_loss
    from tpuseg.train.train_step import create_train_state, make_train_step

    model = build_model(ModelConfig(compute_dtype=args.dtype))
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, args.height, args.width, 3)
    )
    # host (numpy) leaves -> one packed device transfer; otherwise every
    # timed call re-uploads the state tree leaf-by-leaf (see train_bench)
    from tpuseg.core.device_io import device_put_packed

    state = device_put_packed(state)
    step = make_train_step(donate=False)

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.rand(args.batch, args.height, args.width, 3), jnp.float32
    )
    y = jnp.asarray(
        rng.randint(0, 10, (args.batch, args.height, args.width)), jnp.int32
    )

    def loss_of(params, batch_stats, images, labels, train):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=train,
            mutable=["batch_stats"] if train else False,
        )
        logits = out[0] if train else out
        return cross_entropy_loss(logits, labels)

    def fwd_eval(st, xx, yy):
        return loss_of(st.params, st.batch_stats, xx, yy, False)

    def fwd_train(st, xx, yy):
        return loss_of(st.params, st.batch_stats, xx, yy, True)

    def _grad_scalar(st, xx, yy, train):
        loss, grads = jax.value_and_grad(loss_of)(
            st.params, st.batch_stats, xx, yy, train
        )
        # consume every grad leaf so XLA cannot DCE the backward
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss + gsum * 1e-20

    def grad_evalbn(st, xx, yy):
        return _grad_scalar(st, xx, yy, False)

    def grad(st, xx, yy):
        return _grad_scalar(st, xx, yy, True)

    results = {}
    for name, fn in (
        ("fwd_eval", fwd_eval),
        ("fwd_train", fwd_train),
        ("grad_evalbn", grad_evalbn),
        ("grad", grad),
    ):
        @jax.jit
        def chain(st, xx, yy, fn=fn):
            def body(c, _):
                s = fn(st, xx + c * 1e-12, yy)
                return s * 1e-12, ()

            r, _ = lax.scan(body, jnp.float32(0), None, length=args.chain)
            return r

        float(chain(state, x, y))  # compile + warm
        t0 = time.perf_counter()
        float(chain(state, x, y))
        dt = (time.perf_counter() - t0) / args.chain
        results[name] = round(dt * 1000, 3)
        print(f"{name}: {dt*1000:.3f} ms/iter ({args.batch/dt:.0f} imgs/s)",
              flush=True)

    @jax.jit
    def chain_full(st, xx, yy):
        def body(s, _):
            s2, m = step(s, xx, yy)
            return s2, m["loss"]

        s2, losses = lax.scan(body, st, None, length=args.chain)
        return losses[-1]

    float(chain_full(state, x, y))
    t0 = time.perf_counter()
    float(chain_full(state, x, y))
    dt = (time.perf_counter() - t0) / args.chain
    results["full"] = round(dt * 1000, 3)
    print(f"full: {dt*1000:.3f} ms/iter ({args.batch/dt:.0f} imgs/s)",
          flush=True)
    print(json.dumps({"ms_per_iter": results, "batch": args.batch,
                      "size": [args.height, args.width]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
