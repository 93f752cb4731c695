#!/usr/bin/env python
"""Thin-channel conv layout probe: is XLA's conv emitter the bottleneck?

DESIGN §17 closed the *reformulation* space for the decoder's thin
full-resolution convs (conv2 of each Up block, 32-64 output channels):
every exact FLOP-neutral rewrite is deployed. This probe closes the
*layout* space — the remaining "maybe" was that the MXU's lanes are filled
by output channels in NHWC (32/128 = 25%), so a formulation that puts
SPATIAL in the GEMM's N dim could fill all 128 lanes:

    nhwc     lax.conv NHWC                     (the production path)
    nchw     lax.conv NCHW dimension numbers   (layout-hint probe)
    gemm_cn  im2col patches -> einsum, N=C     (thin-N control)
    gemm_sn  im2col patches -> einsum, N=B*H*W (spatial in lanes)

Measured @32ch 256x256 batch 128 bf16 (2026-08-18, v5e):

    nhwc 5.611 ms (14.0% MFU) | nchw 5.591 (14.0, identical — XLA
    canonicalizes layouts; dimension numbers are not a lever) |
    gemm_cn 23.831 (3.3%) | gemm_sn 23.699 (3.3%)

Both GEMM forms lose 4.2x: the im2col patches [B,H,W,9C] are 9x the
activation bytes, and XLA materializes them in HBM (a concat of 9 shifted
slices cannot fuse into a dot operand), so the lane win drowns in traffic.
A Pallas kernel could build patches in VMEM — but the systolic-array
geometry caps it regardless: with Cout=32, EVERY same-FLOPs single-conv
formulation has 32 of one MXU matrix dim (N=32 -> 25% lane fill with W
stationary; M=32 -> ~20% pipeline fill with patches stationary), so the
theoretical kernel ceiling is ~25-30% MFU vs the ~14-23% XLA already gets
— at most ~1.7x on ~23% of the forward, before Mosaic codegen losses that
sank five prior kernels (DESIGN §10/13/13c/14/18). Sixth and final head/
decoder data point: thin-channel conv cost is an ARRAY-GEOMETRY limit, and
the subpixel rewrite (make Cout 4x wider at same FLOPs, §12) was the
correct and only fix. The chain here is x -> conv(x) -> conv(conv(x))
(shape-preserving, natural data dependency, no per-iteration epilogue).

    python tools/conv_layout_probe.py [--c 32] [--hw 256] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFLOPS = 197.0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--c", type=int, default=32)
    p.add_argument("--chain", type=int, default=16)
    p.add_argument("--variants", default="nhwc,nchw,gemm_cn,gemm_sn")
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

    B, H, W, C = args.batch, args.hw, args.hw, args.c
    flops = B * H * W * 9 * C * C * 2

    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16))
    # scale keeps chained activations from overflowing bf16 (9*C taps/pixel)
    k = jax.device_put(jnp.asarray(
        (rng.rand(3, 3, C, C) - 0.5) * (2.0 / (3 * np.sqrt(C))),
        jnp.bfloat16,
    ))

    def nhwc(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def nchw(x, k):
        xt = x.transpose(0, 3, 1, 2)
        kt = k.transpose(3, 2, 0, 1)
        y = lax.conv_general_dilated(
            xt, kt, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y.transpose(0, 2, 3, 1)

    def _patches(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            xp[:, dy:dy + H, dx:dx + W, :]
            for dy in range(3) for dx in range(3)
        ]
        return jnp.concatenate(cols, axis=-1)  # [B,H,W,9C]

    def gemm_cn(x, k):
        pat = _patches(x)
        kk = k.reshape(9 * C, C)
        return jnp.einsum("bhwk,kc->bhwc", pat, kk).astype(jnp.bfloat16)

    def gemm_sn(x, k):
        pat = _patches(x)
        kk = k.reshape(9 * C, C)
        y = jnp.einsum("ck,bhwk->cbhw", kk.T, pat).astype(jnp.bfloat16)
        return y.transpose(1, 2, 3, 0)

    fns = {"nhwc": nhwc, "nchw": nchw, "gemm_cn": gemm_cn, "gemm_sn": gemm_sn}

    out = {}
    for name in args.variants.split(","):
        fn = fns[name]

        @jax.jit
        def chain(xx, kk):
            def body(c, _):
                return fn(c, kk), ()

            r, _ = lax.scan(body, xx, None, length=args.chain)
            return jnp.sum(r.astype(jnp.float32))

        float(chain(x, k))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(x, k))  # host fetch = true sync (bench.py method)
            times.append((time.perf_counter() - t0) / args.chain)
        dt = min(times)
        tflops = flops / dt / 1e12
        out[name] = {
            "ms": round(dt * 1e3, 3),
            "tflops": round(tflops, 1),
            "mfu_pct": round(100 * tflops / PEAK_BF16_TFLOPS, 1),
        }
        print(name, json.dumps(out[name]), flush=True)

    rec = {
        "metric": f"conv_layout_probe_{C}ch_{H}x{W}",
        "value": out.get("nhwc", {}).get("ms", 0.0),
        "unit": "ms/conv",
        "batch": B,
        "size": f"{W}x{H}",
        "config": {"c": C, "chain": args.chain},
        "results": out,
    }
    history = os.environ.get(
        "TPUSEG_BENCH_HISTORY",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench_history.json"),
    )
    if history and jax.devices()[0].platform != "cpu":
        with open(history, "a") as f:
            f.write(json.dumps({**rec, "t": time.time()}) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
