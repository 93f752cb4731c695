#!/usr/bin/env python
"""Forward-pass time breakdown on the chip (MFU attack map).

Scan-chained timings (bench.py method) of nested prefixes of the flagship
inference program @512x512 bf16:

    encoder            -> taps only
    +decoder           -> up1..up4 + outconv logits @256x256
    +final_upsample    -> logits @512x512 (align_corners=True matrix path)
    +argmax            -> the full bench.py program

Deltas between rows attribute wall-clock to each stage; results feed
docs/DESIGN.md and decide where Pallas/layout effort goes.

    python tools/ablate_forward.py [--batch 64] [--chain 16]
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
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--subpixel", type=int, default=1,
                   help="decoder subpixel rewrite (model default: on)")
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

    from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet
    from tpuseg.models.mobilenetv2 import MobileNetV2Encoder
    from tpuseg.models.blocks import OutConv, Up
    from tpuseg.ops.resize import upsample2x_bilinear

    model = MobileNetV2UNet(output_channels=10, dtype=jnp.bfloat16)
    # one host-side init program + one packed transfer (eager init on the
    # remote device is minutes of per-op round trips — core/device_io)
    from tpuseg.core.device_io import (
        device_put_packed, ensure_cpu_backend, init_on_host)

    ensure_cpu_backend()
    variables = init_on_host(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)), train=False
    ))
    variables = device_put_packed(variables)

    import flax.linen as nn

    class Partial(nn.Module):
        """Same module tree / variable names as MobileNetV2UNet, truncated
        after ``stage`` so each prefix binds the full model's variables."""

        stage: str
        subpixel: bool = True

        @nn.compact
        def __call__(self, x):
            taps = MobileNetV2Encoder(dtype=jnp.bfloat16, name="backbone")(
                x, False
            )
            if self.stage == "encoder":
                return sum(jnp.sum(t.astype(jnp.float32)) for t in taps)
            x1, x2, x3, x4, x5 = taps
            sp = self.subpixel
            y = Up(256, dtype=jnp.bfloat16, subpixel=sp, name="up1")(
                x5, x4, False)
            y = Up(128, dtype=jnp.bfloat16, subpixel=sp, name="up2")(
                y, x3, False)
            y = Up(64, dtype=jnp.bfloat16, subpixel=sp, name="up3")(
                y, x2, False)
            y = Up(32, dtype=jnp.bfloat16, subpixel=sp, name="up4")(
                y, x1, False)
            y = OutConv(10, dtype=jnp.bfloat16, name="outc")(y, False)
            if self.stage == "decoder":
                return jnp.sum(y.astype(jnp.float32))
            y = upsample2x_bilinear(y.astype(jnp.float32), align_corners=True)
            if self.stage == "final_up":
                return jnp.sum(y)
            return jnp.sum(jnp.argmax(y, axis=-1)).astype(jnp.float32)

    def stage_fn(stage):
        part = Partial(stage=stage, subpixel=bool(args.subpixel))

        def fwd(v, x):
            return part.apply(v, x)

        return fwd

    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rng.rand(args.batch, args.size, args.size, 3), jnp.float32
    ))
    results = {}
    for stage in ("encoder", "decoder", "final_up", "argmax"):
        fwd = stage_fn(stage)

        @jax.jit
        def chain(v, xx):
            def body(c, _):
                s = fwd(v, xx + c * 1e-12)
                return s * 1e-12, ()

            r, _ = lax.scan(body, jnp.float32(0), None, length=args.chain)
            return r

        float(chain(variables, x))  # compile + warm
        t0 = time.perf_counter()
        float(chain(variables, x))
        dt = (time.perf_counter() - t0) / args.chain
        results[stage] = round(dt * 1000, 3)
        print(f"{stage}: {dt*1000:.3f} ms/iter "
              f"({args.batch/dt:.0f} imgs/s)", flush=True)
    print(json.dumps({"ms_per_iter": results, "batch": args.batch}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
