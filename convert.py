#!/usr/bin/env python
"""Export entry point — counterpart of the reference convert.py.

The reference exports ONNX opset 12 with a dynamic batch axis and validates
with onnx.checker (convert.py:29-55). The TPU-native artifact is serialized
StableHLO via jax.export with a symbolic batch dimension, with optional
FP16 weight cast or int8 weight-only PTQ (README.md:113-117's deployment
claims), and a round-trip self-check (exported output == jitted output):

    python convert.py --export.checkpoint=checkpoints \
        --export.output=exported/model.stablehlo --export.dtype=float16

``--export.format=onnx`` emits the reference's exact artifact — an ONNX
opset-12 graph with dynamic batch, input "input" [batch,3,H,W], output
"output" — via tpuseg's own protobuf codec (the onnx package isn't
installed here), validated structurally and by executed round-trip
(tpuseg.export.onnx_run). savedmodel/tflite/quantized cover the other
deployment targets.
"""

from __future__ import annotations

import logging
import sys

import numpy as np


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    logging.getLogger("absl").setLevel(logging.WARNING)

    import jax.numpy as jnp

    from tpuseg.core.platform import apply_platform_flag

    argv = apply_platform_flag(argv if argv is not None else sys.argv[1:])

    from tpuseg.configs import load_config
    from tpuseg.export.stablehlo import export_model, load_exported
    from tpuseg.infer.predictor import load_variables
    from tpuseg.models.registry import build_model

    cfg = load_config(argv)
    model = build_model(cfg.model)

    def init_fn():
        # one host-side init program; eager init on the remote device costs
        # a tunnel round trip per op (CLAUDE.md / core.device_io)
        from tpuseg.core.device_io import init_variables_on_host

        return init_variables_on_host(model, cfg.data.height, cfg.data.width)

    variables = load_variables(cfg.export.checkpoint, cfg.model.name, init_fn)
    if "quant" in variables and cfg.export.format != "quantized":
        # the StableHLO/TF serving fn binds only params/batch_stats, so the
        # calibrated int8 path would be silently dropped and an fp32 graph
        # shipped as "validated"
        print(
            "ERROR: checkpoint carries a calibrated 'quant' collection "
            f"(full-int8 artifact) — format {cfg.export.format!r} would "
            "silently export its fp32 weights instead. Serve it directly "
            "with inference.py --infer.checkpoint=<dir>, or re-export from "
            "the original fp32 checkpoint."
        )
        return 1

    if cfg.export.dtype == "int8":
        from tpuseg.export.quantize import dequantize_int8, quantize_int8

        variables = {
            "params": dequantize_int8(quantize_int8(variables["params"])),
            "batch_stats": variables["batch_stats"],
        }
        export_dtype = "float32"  # int8 is weight-storage; graph runs fp32
    else:
        export_dtype = cfg.export.dtype

    if cfg.export.format in ("savedmodel", "tflite"):
        return _export_tf(cfg, model, variables, export_dtype)
    if cfg.export.format == "quantized":
        return _export_quantized(cfg, model, variables)
    if cfg.export.format == "onnx":
        return _export_onnx(cfg, model, variables, export_dtype)
    if cfg.export.format != "stablehlo":
        print(f"ERROR: unknown export format {cfg.export.format!r}")
        return 1

    data, _ = export_model(
        model,
        variables,
        cfg.data.height,
        cfg.data.width,
        cfg.export.output,
        batch=cfg.export.batch,
        dtype=export_dtype,
        fold_bn=cfg.export.fold_bn,
    )
    print(f"Exported {len(data)} bytes of StableHLO to {cfg.export.output}")

    # round-trip self-check (the reference's onnx.checker analogue); a
    # static-batch artifact only accepts exactly its exported batch size
    call = load_exported(cfg.export.output)
    check_batch = 2 if cfg.export.batch == -1 else cfg.export.batch
    x = jnp.asarray(
        np.random.RandomState(0).rand(
            check_batch, cfg.data.height, cfg.data.width, 3
        ),
        jnp.float32,
    )
    out = call(x)
    direct = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        x,
        train=False,
    )
    err = float(jnp.abs(out - direct).max())
    rel = err / max(float(jnp.abs(direct).max()), 1e-9)
    print(f"Round-trip check: max diff {err:.3e} (rel {rel:.3e})")
    # bf16 compute: the exported program and the live jit fuse differently,
    # and each fusion boundary rounds bf16 intermediates (~2^-8 rel worst
    # case; folding shifts them further) — measured 7e-3 rel on identical
    # graphs, so bit-level agreement is only expected at fp32 compute
    exact = (export_dtype == "float32"
             and cfg.model.compute_dtype == "float32")
    if not (rel < 1e-5 if exact else rel < 1e-2):
        print("ERROR: exported model diverges from source model")
        return 1
    print("Export is valid!")
    return 0


def _export_quantized(cfg, model, variables) -> int:
    """Full-int8 artifact: calibrate activation scales, save an Orbax
    checkpoint carrying the "quant" collection, verify mask agreement.

    The artifact is directly consumable by inference.py
    (``--infer.checkpoint=<dir>``): Predictor detects the quant collection
    and runs every conv as int8 x int8 -> int32 on the MXU."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpuseg.data.augment import normalize_images
    from tpuseg.data.sources import SyntheticSource
    from tpuseg.export.int8_full import (
        calibrate,
        count_quantized_convs,
        save_quantized,
    )
    from tpuseg.models.registry import build_model

    # calibrate with apply-time rewrites off so EVERY conv sows its input
    # (the subpixel path bypasses the materialized conv1 input); the
    # resulting artifact works under any consumer config.
    model = build_model(
        dataclasses.replace(cfg.model, up_subpixel=False, use_pallas=False)
    )

    h, w = cfg.data.height, cfg.data.width
    batch = 8
    src = SyntheticSource(batch * cfg.export.calib_batches, w, h, seed=77)
    calib = [
        normalize_images(jnp.asarray(np.stack(
            [src.load(i)[0] for i in range(b, b + batch)]
        )))
        for b in range(0, batch * cfg.export.calib_batches, batch)
    ]
    quant = calibrate(model, variables, calib)
    save_quantized(cfg.export.output, variables, quant)
    n = count_quantized_convs(quant)
    print(f"Calibrated {n} convs; wrote int8 checkpoint to {cfg.export.output}")

    # self-check: int8 mask agreement vs fp32 on held-out synthetic frames
    check = SyntheticSource(batch, w, h, seed=123)
    x = normalize_images(jnp.asarray(np.stack(
        [check.load(i)[0] for i in range(batch)]
    )))
    bound = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
    fp32_pred = jnp.argmax(model.apply(bound, x, train=False), axis=-1)
    int8_pred = jnp.argmax(
        model.apply({**bound, "quant": quant}, x, train=False), axis=-1
    )
    agreement = float((fp32_pred == int8_pred).mean())
    print(f"Round-trip check: int8 vs fp32 mask agreement {agreement:.4f}")
    # Guard against a broken artifact (agreement would be near-random).
    # Honest quantization noise flips only near-tie pixels; with random init
    # logits tie often, with trained weights agreement is >0.99
    # (tools/eval_quantized.py measures the mIoU delta properly).
    if agreement < 0.9:
        print("ERROR: int8 masks diverge from fp32 beyond tolerance")
        return 1
    print("Export is valid!")
    return 0


def _export_onnx(cfg, model, variables, export_dtype: str) -> int:
    """ONNX opset-12 export (the reference's artifact, convert.py:29-42)
    with structural validation + an executed round-trip self-check — both
    run by tpuseg's own codec/interpreter, since neither onnx nor
    onnxruntime is installed here."""
    import dataclasses

    import jax.numpy as jnp

    from tpuseg.export.onnx_export import export_onnx
    from tpuseg.export.onnx_run import check_model, run_model
    from tpuseg.models.registry import build_model

    if export_dtype != "float32":
        print("ERROR: the ONNX exporter emits float32 graphs only; "
              "downstream toolchains own FP16/int8 (README.md:113-117)")
        return 1
    # the ONNX graph is fp32 semantics of the (fp32-stored) weights, so the
    # round-trip comparator is the fp32-compute build even when the live
    # serving config is bf16
    if cfg.model.compute_dtype != "float32":
        model = build_model(
            dataclasses.replace(cfg.model, compute_dtype="float32")
        )

    h, w = cfg.data.height, cfg.data.width
    data = export_onnx(
        model, variables, h, w, path=cfg.export.output, batch=cfg.export.batch
    )
    print(f"Exported {len(data)} bytes of ONNX to {cfg.export.output}")

    problems = check_model(data)
    if problems:
        print("ERROR: structural check failed: " + "; ".join(problems))
        return 1

    check_batch = 2 if cfg.export.batch == -1 else cfg.export.batch
    x = np.random.RandomState(0).rand(check_batch, h, w, 3).astype(np.float32)
    out = run_model(data, {"input": x.transpose(0, 3, 1, 2)})["output"]
    direct = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        jnp.asarray(x), train=False,
    )
    direct = np.asarray(direct).transpose(0, 3, 1, 2)
    err = float(np.abs(out - direct).max())
    rel = err / max(float(np.abs(direct).max()), 1e-9)
    print(f"Round-trip check: max diff {err:.3e} (rel {rel:.3e})")
    if not rel < 1e-5:
        print("ERROR: exported model diverges from source model")
        return 1
    print("Export is valid!")
    return 0


def _export_tf(cfg, model, variables, export_dtype: str) -> int:
    """SavedModel / TFLite export with the same round-trip self-check."""
    import jax.numpy as jnp

    from tpuseg.export import tf_export

    h, w = cfg.data.height, cfg.data.width
    fmt = cfg.export.format
    if fmt == "savedmodel":
        tf_export.export_savedmodel(
            model, variables, h, w, cfg.export.output, batch=cfg.export.batch
        )
        print(f"Exported SavedModel to {cfg.export.output}")
        run = lambda x: tf_export.run_savedmodel(cfg.export.output, x)
        check_batch = 2
    else:
        batch = cfg.export.batch if cfg.export.batch != -1 else 1
        data = tf_export.export_tflite(
            model, variables, h, w, cfg.export.output,
            batch=batch, dtype=export_dtype,
        )
        print(f"Exported {len(data)} bytes of TFLite to {cfg.export.output}")
        run = lambda x: tf_export.run_tflite(cfg.export.output, x)
        check_batch = batch

    x = np.random.RandomState(0).rand(check_batch, h, w, 3).astype(np.float32)
    out = run(x)
    direct = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        jnp.asarray(x), train=False,
    )
    err = float(jnp.abs(jnp.asarray(out) - direct).max())
    rel = err / max(float(jnp.abs(direct).max()), 1e-9)
    print(f"Round-trip check: max diff {err:.3e} (rel {rel:.3e})")
    exact = (export_dtype == "float32"
             and cfg.model.compute_dtype == "float32")
    if not (rel < 1e-3 if exact else rel < 1e-2):
        print("ERROR: exported model diverges from source model")
        return 1
    print("Export is valid!")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
