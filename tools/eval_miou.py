#!/usr/bin/env python
"""Eval-only entry point: dataset dir + checkpoint -> mIoU (one JSON line).

The north-star metric (BASELINE.md "mIoU on BDD100K val") is one command
away the moment a real dataset lands on disk:

    python tools/eval_miou.py --data_dir /path/to/bdd100k \
        --checkpoint checkpoints [--platform cpu]

``--data_dir`` expects the BDD100K layout the reference trains from
(src/BDD100KDataset.py: images/ + masks/ subdirectories; override with
--img_dir/--mask_dir, or --kind carla|seame|synthetic for the other
sources). The checkpoint may be an Orbax dir (main.py output, including
checkpoints/best), or a torch .pth (the reference's artifact, imported via
tpuseg.core.torch_import).

Uses the production eval path end-to-end: InputPipeline.eval_batches
(threaded decode, padded final batch) + make_eval_step (on-device confusion
matrix) + tpuseg.train.metrics — the same code Trainer.evaluate runs.

Prints ONE JSON line: {"miou": ..., "pixel_acc": ..., "iou_per_class":
[...], "n_images": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="",
                   help="dataset root with images/ + masks/ (bdd100k layout)")
    p.add_argument("--img_dir", default="")
    p.add_argument("--mask_dir", default="")
    p.add_argument("--annotation_file", default="", help="seame JSONL")
    p.add_argument("--kind", default="bdd100k",
                   choices=["bdd100k", "carla", "seame", "synthetic"])
    p.add_argument("--checkpoint", default="",
                   help="Orbax dir or torch .pth ('' = random init)")
    p.add_argument("--model", default="mobilenetv2_unet")
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--base_filters", type=int, default=0)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--samples", type=int, default=64,
                   help="synthetic only: number of val samples")
    p.add_argument("--limit", type=int, default=0,
                   help="evaluate only N images, evenly strided across the "
                        "dataset (deterministic) — the first-contact smoke "
                        "run on a large val set (0 = all)")
    p.add_argument("--holdout_val_split", type=float, default=0.0,
                   help="carve the SAME seeded train/val split the Trainer "
                        "uses (--data.val_split) and evaluate ONLY the "
                        "held-out side — the honest score when --data_dir "
                        "is the training directory (0 = score everything)")
    p.add_argument("--holdout_seed", type=int, default=42,
                   help="split seed; must match training's --data.seed")
    p.add_argument("--normalize_mean", default="",
                   help='comma-separated, e.g. "0.5,0.5,0.5" — must match '
                        "the training normalization (default: ImageNet)")
    p.add_argument("--normalize_std", default="")
    p.add_argument("--ms_scales", default="0.75,1.25",
                   help="multi-scale TTA scale factors (comma floats, "
                        "snapped to the encoder's /32 pyramid); 0.5,1.5 "
                        "lands on MXU-friendlier shapes — measured A/B in "
                        "DESIGN §43c")
    p.add_argument("--tta", default="", choices=["", "flip", "ms", "flip+ms"],
                   help="test-time augmentation: 'flip' averages logits "
                        "with the horizontally-mirrored forward (+0.43 "
                        "mIoU pts at a MEASURED 1.66x eval wall-clock; "
                        "valid for left/right-symmetric classes); 'ms' "
                        "averages forwards at 0.75/1.0/1.25 scale (+0.87 "
                        "pts at 4.75x — upper-scale pixel count + fp32 "
                        "logit resize/accumulate HBM traffic, so wall-clock "
                        "far exceeds the ~2.1x FLOPs; DESIGN §43c); "
                        "'flip+ms' composes both (+1.14 pts at 6.76x). "
                        "DESIGN §43/§43b/§43c")
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)

    from tpuseg.core.platform import env_platform_override

    platform = args.platform or env_platform_override()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from tpuseg.core.platform import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from tpuseg.configs import DatasetSourceConfig, ModelConfig
    from tpuseg.data.combined import CombinedDataset
    from tpuseg.data.pipeline import InputPipeline
    from tpuseg.data.sources import build_source
    from tpuseg.infer.predictor import load_variables
    from tpuseg.models.registry import build_model
    from tpuseg.train.metrics import (
        iou_from_confusion,
        mean_iou,
        pixel_accuracy_from_confusion,
        tree_sum,
    )
    from tpuseg.train.train_step import TrainState, make_eval_step

    img_dir = args.img_dir or os.path.join(args.data_dir, "images")
    mask_dir = args.mask_dir or os.path.join(args.data_dir, "masks")
    src_cfg = DatasetSourceConfig(
        kind=args.kind, img_dir=img_dir, mask_dir=mask_dir,
        annotation_file=args.annotation_file, num_samples=args.samples,
        weight=1.0,
    )
    try:
        source = build_source(src_cfg, args.width, args.height)
    except (FileNotFoundError, NotADirectoryError, OSError) as e:
        print(f"ERROR: cannot open dataset: {e}", file=sys.stderr)
        return 1
    if len(source) == 0:
        print(f"ERROR: no samples found under {img_dir!r}", file=sys.stderr)
        return 1
    if args.limit and args.holdout_val_split:
        print("ERROR: --limit and --holdout_val_split carve the dataset "
              "differently from the trainer's split — use one or the other",
              file=sys.stderr)
        return 1
    if args.limit and args.limit < len(source):
        # Deterministic evenly-strided subsample: representative across the
        # (sorted) dataset order, reproducible run to run — the smoke-check
        # mode for first contact with a real val set (README checklist).
        idx = np.linspace(0, len(source) - 1, args.limit).astype(int)
        base = source

        class _Strided:
            def __len__(self_inner):
                return len(idx)

            def load(self_inner, i):
                return base.load(int(idx[i]))

        source = _Strided()
    if args.holdout_val_split:
        # reproduce the Trainer's seeded split (tpuseg/data/combined.py)
        # and evaluate only its held-out val side — identical file set to
        # what training's in-loop eval saw
        combined = CombinedDataset(
            [source], val_split=args.holdout_val_split,
            seed=args.holdout_seed,
        )
        if combined.val_size == 0:
            print("ERROR: holdout split is empty", file=sys.stderr)
            return 1
    else:
        # val_split=1.0: the WHOLE dataset is the (deterministic) eval split
        combined = CombinedDataset([source], val_split=1.0)
    pipeline = InputPipeline(
        combined, batch_size=args.batch, height=args.height, width=args.width
    )

    model = build_model(
        ModelConfig(name=args.model, num_classes=args.num_classes,
                    base_filters=args.base_filters)
    )

    def init_fn():
        # one host-side program (eager remote init = per-op round trips)
        from tpuseg.core.device_io import init_variables_on_host

        return init_variables_on_host(model, args.height, args.width)

    variables = load_variables(args.checkpoint, args.model, init_fn)
    if "quant" in variables:
        # make_eval_step binds only params/batch_stats — the int8 path
        # would silently not run and the printed mIoU would be the fp32
        # weights' score attributed to the quantized artifact
        print(
            "ERROR: checkpoint carries a calibrated 'quant' collection — "
            "evaluate int8 accuracy with tools/eval_quantized.py instead",
            file=sys.stderr,
        )
        return 1
    if not args.checkpoint:
        print(
            "WARNING: no --checkpoint — evaluating a randomly initialized "
            "model (smoke test only)", file=sys.stderr,
        )
    # pack the restored host tree to the device in ONE transfer — a
    # host-resident tree re-uploads per eval_step call through the remote
    # tunnel at one RPC per leaf (DESIGN §22)
    from tpuseg.core.device_io import device_put_packed

    variables = device_put_packed(variables)
    state = TrainState(
        step=0, apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=None, opt_state=None,
    )
    from tpuseg.data.class_maps import IMAGENET_MEAN, IMAGENET_STD

    mean = (tuple(float(v) for v in args.normalize_mean.split(","))
            if args.normalize_mean else tuple(IMAGENET_MEAN.tolist()))
    std = (tuple(float(v) for v in args.normalize_std.split(","))
           if args.normalize_std else tuple(IMAGENET_STD.tolist()))
    # normalize + cast fused into the jitted step: eager per-batch ops cost
    # a remote-tunnel dispatch each (DESIGN §22)
    eval_step = make_eval_step(
        args.num_classes, normalize=(mean, std), tta=args.tta,
        ms_scales=tuple(
            float(s) for s in args.ms_scales.split(",") if s.strip()
        ),
    )

    outs = []
    for images, masks, n_valid in pipeline.eval_batches():
        outs.append(eval_step(state, images, masks, jnp.asarray(n_valid)))
    if not outs:
        print("ERROR: empty val split", file=sys.stderr)
        return 1
    # one jitted reduction instead of 3 eager device adds per batch
    tot = tree_sum(outs)
    cm, loss_sum, n = tot["confusion"], tot["loss_sum"], float(tot["n"])
    iou = np.asarray(iou_from_confusion(cm))
    print(json.dumps({
        "miou": float(mean_iou(cm)),
        "pixel_acc": float(pixel_accuracy_from_confusion(cm)),
        "val_loss": float(loss_sum) / max(n, 1.0),
        "iou_per_class": [None if np.isnan(v) else round(float(v), 4)
                          for v in iou],
        "n_images": int(n),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
