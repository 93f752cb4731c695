"""Inference-time graph surgery: BN folding + quantization.

Replaces the deployment story of the reference's convert.py (ONNX opset 12 +
README's qualitative "FP16/TensorRT" claim, convert.py:29-42, README:113-117)
with TPU-native transforms on the Flax variable tree:

- ``fold_batchnorm``: folds BatchNorm (scale, bias, running stats) into the
  preceding conv's kernel/bias and resets the BN to an exact identity —
  the MODEL CODE IS UNCHANGED; XLA constant-folds the identity BN away.
  Numerically identical inference, one fused conv per block.
- ``quantize_int8`` / ``dequantize_int8``: per-output-channel symmetric int8
  weight quantization (weight-only PTQ). The artifact stores int8 kernels +
  fp32 scales (4x smaller); dequantize on load. Acceptance per SURVEY.md:
  <=1 mIoU point off FP32 — weight-only is comfortably inside that.
- ``cast_params``: fp16/bf16 weight cast for the FP16 deployment claim.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


def _is_conv_bn(node: dict) -> bool:
    return (
        isinstance(node, dict)
        and "conv" in node
        and "bn" in node
        and isinstance(node["conv"], dict)
        and "kernel" in node["conv"]
    )


def fold_batchnorm(variables: Dict[str, Any], eps: float = BN_EPS) -> dict:
    """Fold every conv->bn pair; returns new {"params", "batch_stats"}.

    kernel' = kernel * gamma / sqrt(var + eps)        (per out-channel)
    shift   = beta + (bias - mean) * gamma / sqrt(var + eps)
    bn      -> pass-through-plus-shift (scale=1, bias=shift, mean=0,
               var=1-eps); any existing conv bias zeroes out.

    The shift lives in the BN bias, NOT a conv bias: most convs here are
    ``use_bias=False`` (the whole MobileNetV2 encoder), and Flax silently
    ignores a 'bias' param the module never declared — the shift would
    vanish. Keeping it in BN also leaves the param-tree STRUCTURE unchanged
    (the invariant apply-time paths rely on).
    """

    def walk(params: dict, stats: dict) -> Tuple[dict, dict]:
        new_p, new_s = {}, {}
        for key, p_node in params.items():
            s_node = stats.get(key, {}) if isinstance(stats, dict) else {}
            if _is_conv_bn(p_node) and "bn" in s_node:
                kernel = np.asarray(p_node["conv"]["kernel"], np.float64)
                bias = np.asarray(
                    p_node["conv"].get("bias", np.zeros(kernel.shape[-1])),
                    np.float64,
                )
                gamma = np.asarray(p_node["bn"]["scale"], np.float64)
                beta = np.asarray(p_node["bn"]["bias"], np.float64)
                mean = np.asarray(s_node["bn"]["mean"], np.float64)
                var = np.asarray(s_node["bn"]["var"], np.float64)
                factor = gamma / np.sqrt(var + eps)
                shift = (beta + (bias - mean) * factor).astype(np.float32)
                new_conv = {"kernel": (kernel * factor).astype(np.float32)}
                if "bias" in p_node["conv"]:
                    c_bias = np.zeros(kernel.shape[-1], np.float32)
                    new_conv["bias"] = c_bias
                c = kernel.shape[-1]
                new_p[key] = {
                    "conv": new_conv,
                    "bn": {
                        "scale": np.ones(c, np.float32),
                        "bias": shift,
                    },
                }
                new_s[key] = {
                    "bn": {
                        "mean": np.zeros(c, np.float32),
                        "var": np.full(c, 1.0 - eps, np.float32),
                    }
                }
            elif isinstance(p_node, dict):
                sub_p, sub_s = walk(p_node, s_node if isinstance(s_node, dict) else {})
                new_p[key] = sub_p
                if sub_s:
                    new_s[key] = sub_s
            else:
                new_p[key] = p_node
        # carry over stats-only subtrees that had no param sibling
        if isinstance(stats, dict):
            for key, s_node in stats.items():
                if key not in new_s and key not in params:
                    new_s[key] = s_node
        return new_p, new_s

    params, stats = walk(variables["params"], variables.get("batch_stats", {}))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# int8 weight-only PTQ


def quantize_int8(params: Dict[str, Any]) -> dict:
    """fp32 param tree -> {"values": int8, "scales": fp32} per kernel leaf.

    Symmetric per-output-channel: scale_c = max|W[..., c]| / 127. Biases and
    BN params stay fp32 (negligible size, precision-critical).
    """

    def quant_leaf(path_key: str, x):
        arr = np.asarray(x)
        if path_key == "kernel" and arr.ndim >= 2:
            absmax = np.max(np.abs(arr.reshape(-1, arr.shape[-1])), axis=0)
            scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
            q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
            return {"__int8__": q, "__scale__": scale}
        return arr

    def walk(node):
        if isinstance(node, dict):
            return {k: quant_leaf(k, v) if not isinstance(v, dict) else walk(v)
                    for k, v in node.items()}
        return node

    return walk(params)


def dequantize_int8(qparams: Dict[str, Any]) -> dict:
    """Inverse of quantize_int8 -> fp32 param tree."""

    def walk(node):
        if isinstance(node, dict):
            if "__int8__" in node:
                return (
                    node["__int8__"].astype(np.float32) * node["__scale__"]
                )
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(qparams)


def cast_params(params: Dict[str, Any], dtype) -> dict:
    """fp16/bf16 weight cast (the README's FP16 deployment claim)."""
    import jax

    return jax.tree.map(
        lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating
        ) else x,
        params,
    )
