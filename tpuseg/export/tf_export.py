"""SavedModel / TFLite export via jax2tf.

Completes the ExportConfig format matrix ("stablehlo" | "tflite" |
"savedmodel" — configs.py). The reference ships an ONNX artifact for a
TensorRT pipeline (convert.py:29-42, README.md:113-117); the TPU-native
deployment counterparts are:

- SavedModel: TF-Serving / tf.saved_model consumers. The jitted apply-fn is
  converted with jax2tf (native_serialization: the StableHLO program is
  embedded in an XlaCallModule op) and saved with a serving signature.
- TFLite: edge deployment (the closest analogue of the reference's
  TensorRT-edge claim). Conversion goes through jax2tf with
  native_serialization disabled (TFLite's converter needs plain TF ops),
  optionally with float16 weight quantization.

TensorFlow is imported lazily so the rest of tpuseg never pays for it.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def _tf():
    import tensorflow as tf  # lazy: only export paths need TF

    return tf


def _tf_fn(model, variables: dict, height: int, width: int, batch: int,
           native: bool):
    from jax.experimental import jax2tf

    from tpuseg.export.stablehlo import make_serving_fn

    variables, serving = make_serving_fn(model, variables, fold_bn=True)
    bdim = None if batch == -1 else batch
    tf = _tf()
    fn = jax2tf.convert(
        serving,
        polymorphic_shapes=["(b, _, _, _)"] if bdim is None else None,
        native_serialization=native,
    )
    return tf.function(
        fn,
        input_signature=[
            tf.TensorSpec((bdim, height, width, 3), tf.float32, name="input")
        ],
        autograph=False,
    )


def export_savedmodel(
    model, variables: dict, height: int, width: int, path: str,
    batch: int = -1,
) -> str:
    """Write a TF SavedModel whose serving_default runs the forward."""
    tf = _tf()
    tf_f = _tf_fn(model, variables, height, width, batch, native=True)
    module = tf.Module()
    module.f = tf_f
    os.makedirs(path, exist_ok=True)
    tf.saved_model.save(
        module, path,
        signatures={"serving_default": tf_f.get_concrete_function()},
    )
    return path


def export_tflite(
    model, variables: dict, height: int, width: int, path: str,
    batch: int = 1, dtype: str = "float32",
) -> bytes:
    """Write a .tflite flatbuffer. batch must be static (>=1); dtype
    "float16" enables fp16 weight quantization."""
    tf = _tf()
    if batch == -1:
        batch = 1  # TFLite needs static shapes
    tf_f = _tf_fn(model, variables, height, width, batch, native=False)
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_f.get_concrete_function()]
    )
    if dtype == "bfloat16":
        raise ValueError(
            "TFLite weight quantization is float16-only; pass "
            "dtype='float16' explicitly (bf16 and fp16 round/overflow "
            "differently, so a silent substitution would mislead)"
        )
    if dtype == "float16":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    data = converter.convert()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return data


def run_savedmodel(path: str, x: np.ndarray) -> np.ndarray:
    """Load + run a SavedModel's serving signature (round-trip check)."""
    tf = _tf()
    loaded = tf.saved_model.load(path)
    sig = loaded.signatures["serving_default"]
    out = sig(tf.constant(np.asarray(x, np.float32)))
    return list(out.values())[0].numpy()


def run_tflite(path_or_bytes, x: np.ndarray) -> np.ndarray:
    """Run a TFLite flatbuffer with the TF interpreter (round-trip check)."""
    tf = _tf()
    if isinstance(path_or_bytes, (bytes, bytearray)):
        interp = tf.lite.Interpreter(model_content=bytes(path_or_bytes))
    else:
        interp = tf.lite.Interpreter(model_path=path_or_bytes)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], np.asarray(x, np.float32))
    interp.invoke()
    return interp.get_tensor(out["index"])
