#!/usr/bin/env python
"""Render synthetic road scenes to an ON-DISK dataset in a real source layout.

The north-star mIoU command (tools/eval_miou.py, BASELINE.md) expects the
reference's BDD100K directory layout (src/BDD100KDataset.py:17-20: images/ +
masks/ with SOURCE label ids that the loader remaps to the 10-class scheme).
No real dataset ships in this environment, so this tool writes procedurally
generated scenes (tpuseg.data.sources.SyntheticSource) through the INVERSE
of the source's class map — the resulting directory exercises the whole real
file path end-to-end: cv2 decode, LUT remap, resize, eval batching.

    python tools/export_synthetic_dataset.py --out /tmp/synth_val \
        --num 256 --seed 7 --width 256 --height 128
    python tools/eval_miou.py --data_dir /tmp/synth_val --checkpoint ...

``--seed`` selects a disjoint sample universe from a training run's
(SyntheticSource default seed 0), so the export is a genuinely held-out set.
Masks are PNG (lossless ids); images PNG by default, ``--jpeg`` for the
reference's .jpg flavor (src/BDD100KDataset.py:17 accepts both).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def inverse_lut(class_map: dict) -> np.ndarray:
    """ours -> a source id that maps back; unmapped classes -> an id the
    forward LUT sends to 0 (background)."""
    from tpuseg.data.class_maps import NUM_CLASSES, build_lut

    fwd = build_lut(class_map)
    # 255 is outside every reference map -> remaps to background
    inv = np.full(NUM_CLASSES, 255, dtype=np.uint8)
    for src_id, ours in sorted(class_map.items(), reverse=True):
        # reverse-sorted so the SMALLEST source id wins for each class,
        # deterministically (e.g. road: bdd 0, carla 1)
        inv[ours] = src_id
    assert (fwd[inv[1:]] == np.arange(1, NUM_CLASSES)).all()
    return inv


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--kind", default="bdd100k", choices=["bdd100k", "carla"])
    p.add_argument("--num", type=int, default=64)
    p.add_argument("--seed", type=int, default=7,
                   help="sample universe; != a train run's seed (0) => held out")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--jpeg", action="store_true",
                   help="write .jpg images (lossy) instead of .png")
    p.add_argument("--car_prob", type=float, default=1.0,
                   help="imbalanced-arm rehearsal: probability a scene "
                        "draws cars (protocol: 0.12 — DESIGN §38)")
    p.add_argument("--car_scale", type=float, default=1.0,
                   help="imbalanced-arm car size multiplier (protocol: "
                        "0.45; with car_prob 0.12 the car class is 0.067% "
                        "of pixels)")
    args = p.parse_args(argv)

    import cv2

    from tpuseg.data.class_maps import BDD100K_CLASS_MAP, CARLA_CLASS_MAP
    from tpuseg.data.sources import SyntheticSource

    class_map = BDD100K_CLASS_MAP if args.kind == "bdd100k" else CARLA_CLASS_MAP
    inv = inverse_lut(class_map)
    src = SyntheticSource(args.num, args.width, args.height, seed=args.seed,
                          car_prob=args.car_prob, car_scale=args.car_scale)

    img_dir = os.path.join(args.out, "images")
    mask_dir = os.path.join(args.out, "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    ext = ".jpg" if args.jpeg else ".png"
    for i in range(args.num):
        image, mask = src.load(i)  # RGB uint8, ours-ids uint8
        if mask.max() >= len(inv):
            raise ValueError(f"sample {i}: mask id {mask.max()} out of scheme")
        ok = cv2.imwrite(
            os.path.join(img_dir, f"{i:05d}{ext}"), image[..., ::-1]
        ) and cv2.imwrite(os.path.join(mask_dir, f"{i:05d}.png"), inv[mask])
        if not ok:
            print(f"ERROR: imwrite failed for sample {i}", file=sys.stderr)
            return 1
    meta = {
        "kind": args.kind, "count": args.num, "seed": args.seed,
        "width": args.width, "height": args.height,
        "car_prob": args.car_prob, "car_scale": args.car_scale,
        "classes_present": sorted(
            int(c) for c in np.unique(src.load(0)[1])
        ),
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps({"out": args.out, **meta}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
