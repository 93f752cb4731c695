"""Quantization-aware training (QAT) primitives.

The reference deploys with a qualitative "FP16/TensorRT" claim
(/root/reference/README.md:113-117). tpuseg's measurable int8 deployment
path (tpuseg.export.int8_full) quantizes post-training (PTQ); this module
adds the training-time half: every ConvBNAct conv runs *fake-quantized* —
the activation and kernel are rounded to the exact int8 grids the deployed
graph will use, while gradients pass straight through — so the weights
adapt to deployment numerics during training instead of meeting them for
the first time at export.

Design (TPU-native):
- Pure functions inside the jitted train step: no new trainable state, no
  parameter-tree change (CLAUDE.md invariant — quant/qat are apply-time
  paths gated inside ConvBNAct).
- Gating reuses the "quant"-collection idiom of int8_full: the Trainer
  binds a tiny "qat" marker collection (built here from the params tree)
  and ConvBNAct switches on ``has_variable("qat", "on")`` — zero attribute
  threading through the model zoo.
- Kernel fake-quant is bit-identical to export.int8_full.calibrate's
  per-output-channel quantization (same scale formula, same round/clip), so
  the rounding noise trained against IS the deployed kernel error
  (pinned by tests/test_qat.py).
- Activation fake-quant uses the current tensor's absmax (dynamic range)
  per step; nothing clips during training, so the straight-through
  estimator is exact over the whole domain. Deployment uses a static
  calibrated scale (int8_full.calibrate after QAT training) — absmax is
  stable across batches, so the trained-against noise matches in
  distribution.

Straight-through estimator: fq(x) = x + stop_gradient(q(x) - x) — forward
value is the quantize-dequantize, gradient is identity (the standard QAT
formulation; scale gradients are intentionally stopped).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def fake_quant_act(x: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor symmetric int8 fake-quant with dynamic (absmax) range.

    Matches the deployed input quantization of int8_full: round(x/s) on a
    127-level symmetric grid. Returns x's dtype; the rounding happens in
    fp32 regardless of compute dtype (bf16 represents integers <= 127 and
    the rescale exactly enough, but the division is done in fp32 to keep
    the grid uniform).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    q = jnp.round(xf / scale) * scale  # absmax scale => nothing clips
    return (xf + jax.lax.stop_gradient(q - xf)).astype(x.dtype)


def fake_quant_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel symmetric int8 fake-quant of a conv kernel (HWIO).

    Scale formula is bit-identical to export.int8_full.calibrate:
    s_c = absmax_c / 127 (1.0 for all-zero channels), q = clip(round(k/s)).
    """
    kf = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kf.reshape(-1, kf.shape[-1])), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    scale = scale.reshape((1,) * (kf.ndim - 1) + (-1,))  # explicit broadcast
    q = jnp.clip(jnp.round(kf / scale), -127, 127) * scale
    return (kf + jax.lax.stop_gradient(q - kf)).astype(kernel.dtype)


def build_qat_markers(params: Dict) -> Dict:
    """Mirror the params tree with an {"on": int8(1)} marker at every
    ConvBNAct scope (a node holding both a "conv" submodule with a kernel
    and a "bn") — the same conv set int8_full.calibrate quantizes (its taps
    are sown by ConvBNAct; OutConv's bare logits conv stays fp32 in both).

    Bind as ``model.apply({..., "qat": markers}, ...)``; ConvBNAct checks
    ``has_variable("qat", "on")`` in its own scope.
    """

    def walk(node: Dict) -> Dict:
        out: Dict = {}
        for key, value in node.items():
            if not isinstance(value, dict):
                continue
            conv = value.get("conv")
            if isinstance(conv, dict) and "kernel" in conv and "bn" in value:
                out[key] = {"on": np.int8(1)}
            else:
                sub = walk(value)
                if sub:
                    out[key] = sub
        return out

    markers = walk(params)
    if not markers:
        raise ValueError("params tree contains no ConvBNAct scopes to QAT")
    return markers


def count_qat_markers(markers: Dict) -> int:
    n = 0
    for key, value in markers.items():
        if key == "on":
            return 1
        if isinstance(value, dict):
            n += count_qat_markers(value)
    return n
