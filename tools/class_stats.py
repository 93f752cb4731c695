#!/usr/bin/env python
"""Per-class pixel statistics + suggested --train.class_weights.

The reference trains unweighted CE on a heavily imbalanced 10-class road
scene (background/road dominate; lights, signs, riders are rare — the very
imbalance tpuseg's weighted-CE/focal options exist for, tpuseg/train/loss.py).
This tool turns a dataset into the numbers those knobs want:

    python tools/class_stats.py --data_dir /data/bdd100k [--kind bdd100k]
        [--samples N] [--scheme median|inverse] [--num_classes 10]

Prints one JSON line: per-class pixel counts, frequencies, image-presence
counts, and suggested weights —

- "median" (default): median-frequency balancing (Eigen & Fergus):
  w_c = median(freq)/freq_c over present classes; absent classes get 0.
- "inverse": plain 1/freq_c normalized to mean 1 over present classes.

Host-side only (pure numpy over the source's load() path — the same
cv2-decode + LUT-remap pipeline training reads through); no device work.

Training can also resolve these weights itself at startup:
``--train.class_weights=auto`` (median) / ``auto:inverse`` — same
implementation (tpuseg/data/class_stats.py), scanned over the run's own
train split. This tool remains the offline/inspection path and prints the
explicit list that freezes them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Shared implementation with --train.class_weights=auto (the Trainer's
# startup resolution path): tpuseg/data/class_stats.py.
from tpuseg.data.class_stats import compute_stats, suggest_weights  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="")
    p.add_argument("--img_dir", default="")
    p.add_argument("--mask_dir", default="")
    p.add_argument("--annotation_file", default="", help="seame JSONL")
    p.add_argument("--kind", default="bdd100k",
                   choices=["bdd100k", "carla", "seame", "synthetic",
                            "packed"])
    p.add_argument("--packed_dir", default="")
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--samples", type=int, default=0,
                   help="cap on images scanned (0 = all)")
    p.add_argument("--scheme", default="median",
                   choices=["median", "inverse"])
    p.add_argument("--car_prob", type=float, default=1.0,
                   help="synthetic only: imbalance rehearsal knob")
    p.add_argument("--car_scale", type=float, default=1.0,
                   help="synthetic only: imbalance rehearsal knob")
    args = p.parse_args(argv)

    from tpuseg.configs import DatasetSourceConfig
    from tpuseg.data.sources import build_source

    img_dir = args.img_dir or (
        os.path.join(args.data_dir, "images") if args.data_dir else ""
    )
    mask_dir = args.mask_dir or (
        os.path.join(args.data_dir, "masks") if args.data_dir else ""
    )
    cfg = DatasetSourceConfig(
        kind=args.kind, img_dir=img_dir, mask_dir=mask_dir,
        annotation_file=args.annotation_file, packed_dir=args.packed_dir,
        num_samples=args.samples or 64, weight=1.0,
        car_prob=args.car_prob, car_scale=args.car_scale,
    )
    try:
        source = build_source(cfg, args.width, args.height)
    except (FileNotFoundError, NotADirectoryError, OSError, KeyError) as e:
        print(f"ERROR: cannot open dataset: {e}", file=sys.stderr)
        return 1
    if len(source) == 0:
        print("ERROR: no samples found", file=sys.stderr)
        return 1

    counts, present, read = compute_stats(
        source, args.num_classes, args.samples
    )
    weights = suggest_weights(counts, args.scheme)
    total = int(counts.sum())
    print(json.dumps({
        "images": read,
        "pixel_counts": [int(c) for c in counts],
        "pixel_freq": [round(float(c) / max(total, 1), 6) for c in counts],
        "images_present": [int(c) for c in present],
        "scheme": args.scheme,
        "class_weights": [round(float(w), 4) for w in weights],
        "flag": "--train.class_weights=" + ",".join(
            f"{w:.4f}" for w in weights
        ),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
