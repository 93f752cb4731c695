"""StableHLO export with a symbolic batch dimension.

The TPU-native replacement for convert.py's ONNX path: the jitted apply-fn is
exported via ``jax.export`` to a serialized StableHLO artifact with a symbolic
batch axis (the reference declares ``dynamic_axes={'input': {0: 'batch'}}``,
convert.py:36-41). The artifact round-trips with ``load_exported`` and can be
invoked from any JAX process (or lowered further by downstream toolchains —
the StableHLO bytes are the portable contract, like the ONNX graph was).

Export dtype options mirror the README's deployment claims (fp32 / fp16
weights / int8 weight-only — see tpuseg.export.quantize).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from tpuseg.export.quantize import cast_params, fold_batchnorm


def make_serving_fn(model, variables: dict, fold_bn: bool = True):
    """(variables, serving_fn(x) -> logits) with BN folded for inference."""
    if fold_bn and variables.get("batch_stats"):
        variables = fold_batchnorm(variables)

    def serving(x):
        return model.apply(
            {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
            x,
            train=False,
        )

    return variables, serving


def export_model(
    model,
    variables: dict,
    height: int,
    width: int,
    path: str,
    batch: int = -1,
    dtype: str = "float32",
    fold_bn: bool = True,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
) -> Tuple[bytes, Any]:
    """Serialize the forward to StableHLO; batch=-1 => symbolic batch dim.

    The artifact is lowered for ``platforms`` (default cpu+tpu) so the same
    file serves anywhere — a cpu-only export raises
    "exported for ('cpu',) but used on ('tpu',)" the moment it reaches a
    chip, which is exactly the deploy-from-workstation flow
    (convert.py --platform=cpu -> inference.py --infer.artifact on TPU).

    Returns (serialized bytes, the Exported object). Writes to ``path``.
    """
    # Fold FIRST, cast SECOND: fold_batchnorm re-materializes folded
    # kernels/biases as float32, so casting before folding would ship an
    # "fp16" artifact whose constants are all 4-byte fp32 (fp16-rounded) —
    # and fold on pre-rounded kernels besides.
    variables, serving = make_serving_fn(model, variables, fold_bn=fold_bn)
    if dtype in ("float16", "bfloat16"):
        variables = dict(variables)
        variables["params"] = cast_params(
            variables["params"],
            jnp.float16 if dtype == "float16" else jnp.bfloat16,
        )
        _, serving = make_serving_fn(model, variables, fold_bn=False)

    if batch == -1:
        (b,) = jax_export.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, height, width, 3), jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)

    exported = jax_export.export(
        jax.jit(serving), platforms=tuple(platforms)
    )(x_spec)
    data = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
    return data, exported


def load_exported(path: str):
    """Deserialize a StableHLO artifact; returns a callable exported.call."""
    with open(path, "rb") as f:
        data = f.read()
    exported = jax_export.deserialize(bytearray(data))
    return exported.call
