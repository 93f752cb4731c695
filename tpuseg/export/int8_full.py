"""Full int8 inference: static activation calibration + int8 MXU convs.

Goes beyond weight-only PTQ (tpuseg.export.quantize): after a calibration
pass records per-conv input ranges, every ConvBNAct in the network executes
as an int8 x int8 -> int32 convolution, with per-tensor activation scales
and per-output-channel kernel scales. The reference's deployment story stops
at a qualitative "FP16/TensorRT" claim (README.md:113-117); this is the
measurable TPU equivalent.

Speed, measured honestly (bench.py TPUSEG_BENCH_INT8=1, 512x512 batch 64,
v5e): **789.8 fps int8 vs 1357.7 fps bf16** — int8 LOSES 1.7x end-to-end
here despite the MXU's 2x int8 peak, because each conv pays fp32->int8
round/clip/cast on its input and int32->fp32 rescale on its output, and this
model is bandwidth/lane-bound, not MXU-peak-bound. The path exists for
deployment compatibility and accuracy experiments (tools/eval_quantized.py:
int8 within 0.2 mIoU pts), not for speed on this hardware.

Mechanics: ConvBNAct sows its conv input into the "intermediates" collection
(calibration taps) and switches to the quantized path whenever a "quant"
variable collection is bound — model code and the fp32 path are unchanged,
and BatchNorm/activations/residual adds stay fp32 (standard conv-only int8).

    quant = calibrate(model, variables, calib_batches)
    logits = model.apply({**variables, "quant": quant}, x, train=False)
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _collect_absmax(tree: Dict, out: Dict, prefix=()) -> None:
    """Walk an intermediates tree, recording max |conv_in| per module path.

    The tree is reduced to SCALARS on device first (one jitted program) and
    fetched as one host transfer — a float() per conv per batch would pay
    the remote tunnel's ~50-100 ms round trip ~60x per calibration batch.
    """
    leaves, treedef = jax.tree.flatten(tree)
    packed = np.asarray(jax.jit(
        lambda ls: jnp.stack(
            [jnp.abs(l).max().astype(jnp.float32) for l in ls]
        )
    )(leaves))  # ONE device->host transfer for all ~60 conv taps
    flat = jax.tree.unflatten(treedef, [float(v) for v in packed])

    def walk(node, prefix):
        for key, value in node.items():
            if key == "conv_in":
                m = max(float(np.asarray(v)) for v in value)
                out[prefix] = max(out.get(prefix, 0.0), m)
            elif isinstance(value, dict):
                walk(value, prefix + (key,))

    walk(flat, prefix)


def _params_node(params: Dict, path) -> Optional[Dict]:
    node = params
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node if isinstance(node, dict) else None


def calibrate(
    model,
    variables: Dict[str, Any],
    calib_batches: Iterable[jnp.ndarray],
    percentile_headroom: float = 1.0,
) -> Dict:
    """Run calibration batches, return the "quant" variable collection.

    ``percentile_headroom`` scales the recorded absmax (1.0 = exact absmax;
    <1.0 clips outliers for tighter scales).
    """
    absmax: Dict[tuple, float] = {}
    bound = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    for x in calib_batches:
        _, inter = model.apply(
            bound, x, train=False, mutable=["intermediates"]
        )
        _collect_absmax(inter["intermediates"], absmax)
    if not absmax:
        raise ValueError("calibration captured no conv inputs")

    quant: Dict = {}
    for path, amax in absmax.items():
        pnode = _params_node(variables["params"], path)
        if pnode is None or "conv" not in pnode:
            continue
        kernel = np.asarray(pnode["conv"]["kernel"], np.float32)
        k_absmax = np.max(
            np.abs(kernel.reshape(-1, kernel.shape[-1])), axis=0
        )
        k_scale = np.where(k_absmax > 0, k_absmax / 127.0, 1.0).astype(
            np.float32
        )
        kernel_q = np.clip(
            np.round(kernel / k_scale), -127, 127
        ).astype(np.int8)
        node: Dict = {
            "kernel_q": kernel_q,
            "kernel_scale": k_scale,
            "act_scale": np.float32(
                max(amax * percentile_headroom, 1e-8) / 127.0
            ),
        }
        if "bias" in pnode["conv"]:
            node["bias"] = np.asarray(pnode["conv"]["bias"], np.float32)
        target = quant
        for p in path[:-1]:
            target = target.setdefault(p, {})
        target[path[-1]] = node
    return quant


def quantized_apply_fn(model, variables: Dict[str, Any], quant: Dict):
    """Jitted int8 forward: x -> logits."""

    @jax.jit
    def fn(x):
        return model.apply(
            {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "quant": quant,
            },
            x,
            train=False,
        )

    return fn


def save_quantized(path: str, variables: Dict[str, Any], quant: Dict) -> None:
    """Persist a calibrated int8 model as a step-0 Orbax checkpoint.

    The artifact carries {"params", "batch_stats", "quant"}; load_variables
    (tpuseg/infer/predictor.py) surfaces the quant collection and Predictor
    switches every ConvBNAct to the int8 MXU path automatically."""
    from tpuseg.core.checkpoint import CheckpointManager

    with CheckpointManager(path, max_to_keep=1) as mgr:
        mgr.save(
            0,
            {
                "state": {
                    "params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {}),
                    "quant": quant,
                }
            },
            force=True,
        )


def count_quantized_convs(quant: Dict) -> int:
    n = 0
    for key, value in quant.items():
        if key == "kernel_q":
            return 1
        if isinstance(value, dict):
            n += count_quantized_convs(value)
    return n
