"""Headline benchmark: flagship inference throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: MobileNetV2UNet (the reference's production model) forward + argmax
at 512x512, bf16 compute, batch 64 — the BASELINE.md north-star config.

Measurement method: the forward is chained N times inside one jitted
``lax.scan`` with a data dependency between iterations, and the final scalar
is fetched to host. This is required for honesty on this runtime:
``block_until_ready()`` returns before device execution completes through
the remote-device tunnel, so naive async timing overstates throughput ~100x
(verified: per-call host-synced latency matches the scan-chained number,
not the async one).

Baseline denominator: the reference implementation's single-image CPU
inference (PyTorch eval forward + argmax, 1 thread) measured on this host =
2.58 fps at 512x512 (18.0 fps at its native 256x128). The reference publishes
no numbers (BASELINE.md), so its measured CPU throughput is the denominator,
per BASELINE.json's ">=10x reference CPU video-inference throughput" target.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Measured via tests/torch_ref.TorchMobileNetV2UNet.eval(), batch=1,
# torch.set_num_threads(1), on this host (see module docstring).
REFERENCE_CPU_FPS_512 = 2.58

BATCH = 64
HEIGHT = WIDTH = 512
CHAIN = 32


def main() -> None:
    from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet

    model = MobileNetV2UNet(output_channels=10, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)), train=False
    )

    @jax.jit
    def bench_fn(params, x):
        def body(carry, _):
            inp = x + carry * 1e-9  # data dependency defeats overlap
            out = jnp.argmax(model.apply(params, inp, train=False), axis=-1)
            return jnp.sum(out).astype(jnp.float32), ()

        s, _ = lax.scan(body, jnp.float32(0), None, length=CHAIN)
        return s

    x = jax.device_put(
        jnp.asarray(
            np.random.RandomState(0).rand(BATCH, HEIGHT, WIDTH, 3), jnp.float32
        )
    )
    float(bench_fn(variables, x))  # compile + warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_fn(variables, x))  # host fetch = true sync
        dt = time.perf_counter() - t0
        best = max(best, BATCH * CHAIN / dt)
    print(
        json.dumps(
            {
                "metric": "mobilenetv2_unet_infer_512x512_fps_per_chip",
                "value": round(best, 1),
                "unit": "frames/sec",
                "vs_baseline": round(best / REFERENCE_CPU_FPS_512, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
