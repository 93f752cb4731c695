"""Execute a tpuseg-emitted ONNX file — the round-trip self-check backend.

Neither ``onnx`` nor ``onnxruntime`` exists in this environment, so the
export validation (the analogue of the reference's onnx.checker call,
reference convert.py:47-55) parses the serialized protobuf back
(tpuseg.export.onnx_proto.parse_model) and executes the graph with this
minimal interpreter. It implements exactly the op set the exporter emits —
Conv / BatchNormalization / Relu / Clip / Add / Concat / MaxPool /
GlobalAveragePool / Resize (linear + nearest) / Identity — from the ONNX
operator spec (opset 12), independently of the
Flax modules, so agreement with ``model.apply`` validates both the wire
encoding and the emitted graph topology/weights.

Resize is implemented from the spec's coordinate-transformation formulas
(pytorch_half_pixel / align_corners), not by calling tpuseg.ops.resize.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Union

import numpy as np

from tpuseg.export.onnx_proto import parse_model


def _conv(x, w, b, attrs):
    from jax import lax
    import jax.numpy as jnp

    pads = attrs.get("pads", [0, 0, 0, 0])
    y = lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(w, jnp.float32),
        window_strides=tuple(attrs.get("strides", [1, 1])),
        padding=((pads[0], pads[2]), (pads[1], pads[3])),
        rhs_dilation=tuple(attrs.get("dilations", [1, 1])),
        feature_group_count=int(attrs.get("group", 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        y = y + jnp.asarray(b, jnp.float32).reshape(1, -1, 1, 1)
    return np.asarray(y)


def _batch_norm(x, scale, bias, mean, var, attrs):
    eps = attrs.get("epsilon", 1e-5)
    shape = (1, -1, 1, 1)
    inv = 1.0 / np.sqrt(var.astype(np.float64) + eps)
    return (
        (x - mean.reshape(shape))
        * (scale * inv).astype(np.float32).reshape(shape)
        + bias.reshape(shape)
    ).astype(np.float32)


def _max_pool(x, attrs):
    kh, kw = attrs["kernel_shape"]
    sh, sw = attrs.get("strides", attrs["kernel_shape"])
    n, c, h, w = x.shape
    oh, ow = (h - kh) // sh + 1, (w - kw) // sw + 1
    out = np.full((n, c, oh, ow), -np.inf, np.float32)
    for dy in range(kh):
        for dx in range(kw):
            out = np.maximum(
                out, x[:, :, dy : dy + oh * sh : sh, dx : dx + ow * sw : sw]
            )
    return out


def _linear_coords(out_size: int, in_size: int, scale: float, mode: str):
    """ONNX Resize coordinate transform -> (idx0, idx1, frac) arrays."""
    i = np.arange(out_size, dtype=np.float64)
    if mode == "align_corners":
        x = i * (in_size - 1) / max(out_size - 1, 1)
    elif mode in ("pytorch_half_pixel", "half_pixel"):
        if mode == "pytorch_half_pixel" and out_size <= 1:
            x = np.zeros_like(i)
        else:
            x = (i + 0.5) / scale - 0.5
    elif mode == "asymmetric":
        x = i / scale
    else:
        raise NotImplementedError(f"coordinate mode {mode!r}")
    x0 = np.floor(x)
    frac = (x - x0).astype(np.float32)
    i0 = np.clip(x0, 0, in_size - 1).astype(np.int64)
    i1 = np.clip(x0 + 1, 0, in_size - 1).astype(np.int64)
    return i0, i1, frac


def _resize(x, scales, attrs):
    if not (scales[0] == scales[1] == 1.0):
        raise NotImplementedError("batch/channel Resize scales must be 1")
    coord = attrs.get("coordinate_transformation_mode", "half_pixel")
    n, c, h, w = x.shape
    oh, ow = int(round(h * scales[2])), int(round(w * scales[3]))
    mode = attrs.get("mode", "nearest")
    if mode == "nearest":
        # the exporter emits asymmetric+floor only (== jnp.repeat for
        # integer upscales; == broadcast from a 1x1 input)
        if coord != "asymmetric" or attrs.get("nearest_mode") != "floor":
            raise NotImplementedError(
                "only asymmetric/floor nearest Resize is emitted"
            )
        r = np.clip(
            np.floor(np.arange(oh) / scales[2]), 0, h - 1
        ).astype(np.int64)
        cc = np.clip(
            np.floor(np.arange(ow) / scales[3]), 0, w - 1
        ).astype(np.int64)
        return x[:, :, r, :][:, :, :, cc]
    if mode != "linear":
        raise NotImplementedError(f"Resize mode {mode!r}")
    # separable bilinear: rows then columns
    r0, r1, rf = _linear_coords(oh, h, scales[2], coord)
    rf = rf.reshape(1, 1, -1, 1)
    x = x[:, :, r0, :] * (1.0 - rf) + x[:, :, r1, :] * rf
    c0, c1, cf = _linear_coords(ow, w, scales[3], coord)
    cf = cf.reshape(1, 1, 1, -1)
    return (x[:, :, :, c0] * (1.0 - cf) + x[:, :, :, c1] * cf).astype(
        np.float32
    )


def run_model(
    model: Union[bytes, Dict[str, Any]], feeds: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Execute a parsed (or serialized) model; returns {output_name: value}."""
    if isinstance(model, (bytes, bytearray)):
        model = parse_model(bytes(model))
    graph = model["graph"]
    env: Dict[str, np.ndarray] = dict(graph["initializers"])
    for vi in graph["inputs"]:
        name = vi["name"]
        if name not in feeds:
            raise KeyError(f"missing graph input {name!r}")
        env[name] = np.asarray(feeds[name], np.float32)

    for node in graph["nodes"]:
        op_type = node["op_type"]
        # "" marks an omitted optional input (Resize's roi slot)
        ins = [env[i] if i else None for i in node["input"]]
        attrs = node["attrs"]
        if op_type == "Conv":
            out = _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, attrs)
        elif op_type == "BatchNormalization":
            out = _batch_norm(ins[0], ins[1], ins[2], ins[3], ins[4], attrs)
        elif op_type == "Relu":
            out = np.maximum(ins[0], 0.0)
        elif op_type == "Clip":
            out = np.clip(ins[0], ins[1], ins[2])
        elif op_type == "Add":
            out = ins[0] + ins[1]
        elif op_type == "Concat":
            out = np.concatenate(ins, axis=attrs["axis"])
        elif op_type == "MaxPool":
            out = _max_pool(ins[0], attrs)
        elif op_type == "GlobalAveragePool":
            out = ins[0].mean(axis=(2, 3), keepdims=True).astype(np.float32)
        elif op_type == "Resize":
            out = _resize(ins[0], np.asarray(ins[2], np.float64), attrs)
        elif op_type == "Identity":
            out = ins[0]
        else:
            raise NotImplementedError(f"op {op_type!r}")
        env[node["output"][0]] = out

    return {vi["name"]: env[vi["name"]] for vi in graph["outputs"]}


def check_model(model: Union[bytes, Dict[str, Any]]) -> List[str]:
    """Structural validation (the onnx.checker analogue): every node input
    resolves to a prior value, nodes are topologically ordered, the graph
    outputs are produced, and initializer dtypes are supported. Returns a
    list of problems (empty == valid)."""
    if isinstance(model, (bytes, bytearray)):
        model = parse_model(bytes(model))
    problems: List[str] = []
    graph = model["graph"]
    known = set(graph["initializers"]) | {v["name"] for v in graph["inputs"]}
    for node in graph["nodes"]:
        for i in node["input"]:
            if i and i not in known:
                problems.append(
                    f"node {node['name'] or node['op_type']}: "
                    f"unresolved input {i!r}"
                )
        for o in node["output"]:
            known.add(o)
    for vi in graph["outputs"]:
        if vi["name"] not in known:
            problems.append(f"graph output {vi['name']!r} never produced")
    if not model.get("opset_import"):
        problems.append("missing opset_import")
    return problems
