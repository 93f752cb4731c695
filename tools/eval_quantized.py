#!/usr/bin/env python
"""Quantization accuracy harness: fp32 vs BN-folded vs int8 vs fp16 mIoU.

SURVEY.md acceptance: int8 PTQ within <=1 mIoU point of FP32 (the reference
claims FP16/TensorRT deployment qualitatively, README.md:113-117, with no
accuracy number — this harness produces the number).

    python tools/eval_quantized.py --platform cpu \
        [--checkpoint ckpt_dir_or_pth] [--samples 64] \
        [--data_dir /data/bdd100k [--kind bdd100k|carla|seame]]

With no checkpoint it evaluates a randomly-initialized model on synthetic
val data — the DELTAS between variants are still meaningful (same inputs,
same weights modulo quantization). With --data_dir (first-contact
checklist, README), eval AND int8 activation calibration both read the
real files.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="")
    p.add_argument("--model", default="mobilenetv2_unet")
    p.add_argument("--base_filters", type=int, default=0,
                   help="family width knob (0 = registry default)")
    p.add_argument("--data_dir", default="",
                   help="real dataset root with images/ + masks/ (bdd100k "
                        "layout) — eval AND int8 calibration both read real "
                        "images (default: synthetic scenes)")
    p.add_argument("--img_dir", default="")
    p.add_argument("--mask_dir", default="")
    p.add_argument("--annotation_file", default="", help="seame JSONL")
    p.add_argument("--kind", default="bdd100k",
                   choices=["bdd100k", "carla", "seame"],
                   help="loader for --data_dir/--img_dir")
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
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

    from tpuseg.configs import ModelConfig
    from tpuseg.data.augment import normalize_images
    from tpuseg.data.sources import SyntheticSource
    from tpuseg.export.quantize import (
        cast_params,
        dequantize_int8,
        fold_batchnorm,
        quantize_int8,
    )
    from tpuseg.infer.predictor import load_variables
    from tpuseg.models.registry import build_model
    from tpuseg.train.metrics import confusion_matrix, mean_iou

    # apply-time rewrites off so calibration sees every conv input
    model = build_model(ModelConfig(
        name=args.model, base_filters=args.base_filters, up_subpixel=False
    ))

    def init_fn():
        from tpuseg.core.device_io import init_variables_on_host

        return init_variables_on_host(model, args.height, args.width)

    base = load_variables(args.checkpoint, args.model, init_fn)
    # a calibrated int8_full artifact carries a "quant" collection; the
    # fp32 BASELINE must not bind it (predict() binds quant whenever the
    # key exists, so every delta would compare int8 against int8)
    base = {"params": base["params"],
            "batch_stats": base.get("batch_stats", {})}

    variants = {
        "fp32": base,
        "bn_folded": fold_batchnorm(base),
        "int8_weights": {
            "params": dequantize_int8(quantize_int8(base["params"])),
            "batch_stats": base["batch_stats"],
        },
        "fp16_weights": {
            "params": jax.tree.map(
                lambda x: jnp.asarray(x, jnp.float16).astype(jnp.float32),
                base["params"],
            ),
            "batch_stats": base["batch_stats"],
        },
    }

    # Eval + calibration sources: a real dataset when given (first-contact
    # checklist — activation ranges must be calibrated on REAL images, not
    # synthetic scenes), else the synthetic fallback.
    real_src = None
    if args.data_dir or args.img_dir:
        from tpuseg.configs import DatasetSourceConfig
        from tpuseg.data.sources import build_source

        src_cfg = DatasetSourceConfig(
            kind=args.kind,
            img_dir=args.img_dir or os.path.join(args.data_dir, "images"),
            mask_dir=args.mask_dir or os.path.join(args.data_dir, "masks"),
            annotation_file=args.annotation_file, weight=1.0,
        )
        try:
            real_src = build_source(src_cfg, args.width, args.height)
        except (FileNotFoundError, NotADirectoryError, OSError) as e:
            print(f"ERROR: cannot open dataset: {e}", file=sys.stderr)
            return 1
        if len(real_src) == 0:
            print("ERROR: no samples found", file=sys.stderr)
            return 1
        args.samples = min(args.samples, len(real_src))

    # full int8 (calibrated activations + int8 convs)
    from tpuseg.export.int8_full import calibrate

    if real_src is None:
        calib_src = SyntheticSource(args.batch * 2, args.width, args.height,
                                    seed=77)
        calib_imgs = [calib_src.load(i)[0] for i in range(args.batch * 2)]
    else:
        # calibrate on evenly-strided real images (may overlap eval — fine:
        # calibration only reads activation ranges, not labels); skip
        # unreadable files, repeat to fill if the tail is short
        calib_idx = np.linspace(
            0, len(real_src) - 1, args.batch * 2
        ).astype(int)
        calib_imgs = [pr[0] for pr in (real_src.load(int(i))
                                       for i in calib_idx) if pr is not None]
        if not calib_imgs:
            print("ERROR: no readable calibration images", file=sys.stderr)
            return 1
        n_readable = len(calib_imgs)
        while len(calib_imgs) < args.batch * 2:
            calib_imgs.append(calib_imgs[len(calib_imgs) % n_readable])
    calib = [
        normalize_images(jnp.asarray(np.stack(
            calib_imgs[b : b + args.batch])))
        for b in (0, args.batch)
    ]
    quant = calibrate(model, base, calib)
    variants["int8_full"] = {**base, "quant": quant}

    @jax.jit
    def predict(variables, x):
        bound = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
        if "quant" in variables:
            bound["quant"] = variables["quant"]
        logits = model.apply(bound, x, train=False)
        return jnp.argmax(logits, axis=-1)

    src = real_src if real_src is not None else SyntheticSource(
        args.samples, args.width, args.height, seed=123
    )
    results = {}
    cms = {k: np.zeros((10, 10), np.int64) for k in variants}
    agree = {k: [0, 0] for k in variants}
    for start in range(0, args.samples, args.batch):
        pairs = [src.load(i) for i in
                 range(start, min(start + args.batch, args.samples))]
        pairs = [pr for pr in pairs if pr is not None]  # skip unreadable
        if not pairs:
            continue
        imgs, masks = zip(*pairs)
        x = normalize_images(jnp.asarray(np.stack(imgs)))
        y = jnp.asarray(np.stack(masks), jnp.int32)
        ref_pred = None
        for name, v in variants.items():
            pred = predict(v, x)
            cms[name] += np.asarray(confusion_matrix(pred, y, 10), np.int64)
            if name == "fp32":
                ref_pred = pred
            else:
                agree[name][0] += int((pred == ref_pred).sum())
                agree[name][1] += int(pred.size)

    fp32_miou = mean_iou(cms["fp32"])
    for name in variants:
        miou = mean_iou(cms[name])
        results[name] = {
            "miou": round(miou, 5),
            "delta_miou_pts": round((miou - fp32_miou) * 100, 4),
            "mask_agreement": (
                round(agree[name][0] / agree[name][1], 6)
                if agree[name][1] else 1.0
            ),
        }
    print(json.dumps(results, indent=2))
    worst = min(r["delta_miou_pts"] for r in results.values())
    ok = worst >= -1.0
    print(f"acceptance (all variants within 1 mIoU point): {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
