#!/usr/bin/env python
"""Pack any configured source into the memory-mapped training format.

Runs the host decode path (decode + LUT remap + resize — the work that caps
a decode-bound host at train time, BASELINE.md) ONCE, offline, and writes:

    <out>/images.npy   uint8 [N, H, W, 3] RGB
    <out>/masks.npy    uint8 [N, H, W]
    <out>/meta.json    {"width", "height", "count", "kind"}

Train from it with ``--data.sources`` kind="packed", packed_dir=<out> —
``tpuseg.data.sources.PackedSource`` memmaps the arrays, so per-sample load
is a slice copy served by the OS page cache. Unreadable samples are skipped
(logged), matching the pipeline's skip-with-redraw policy (SURVEY.md §5.3).

    python tools/pack_dataset.py --kind bdd100k --img_dir ... --mask_dir ...
        --out /data/bdd_packed --width 256 --height 128
    python tools/pack_dataset.py --kind synthetic --num_samples 512 --out ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["bdd100k", "carla", "seame", "synthetic"])
    p.add_argument("--img_dir", default="")
    p.add_argument("--mask_dir", default="")
    p.add_argument("--annotation_file", default="")
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--out", required=True)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    args = p.parse_args(argv)

    from tpuseg.configs import DatasetSourceConfig
    from tpuseg.data.sources import build_source

    src = build_source(
        DatasetSourceConfig(
            kind=args.kind, img_dir=args.img_dir, mask_dir=args.mask_dir,
            annotation_file=args.annotation_file,
            num_samples=args.num_samples,
        ),
        args.width, args.height,
    )
    n = len(src)
    if n == 0:
        print("source is empty — nothing to pack", file=sys.stderr)
        return 1
    os.makedirs(args.out, exist_ok=True)
    # open_memmap streams samples straight to disk: packing never needs the
    # whole dataset in RAM (BDD100K at 256x128 is ~7 GB packed)
    from numpy.lib.format import open_memmap

    images = open_memmap(
        os.path.join(args.out, "images.npy"), mode="w+", dtype=np.uint8,
        shape=(n, args.height, args.width, 3),
    )
    masks = open_memmap(
        os.path.join(args.out, "masks.npy"), mode="w+", dtype=np.uint8,
        shape=(n, args.height, args.width),
    )
    kept = 0
    for i in range(n):
        sample = src.load(i)
        if sample is None:  # unreadable: skip (SURVEY.md §5.3)
            print(f"skipping unreadable sample {i}", file=sys.stderr)
            continue
        images[kept], masks[kept] = sample
        kept += 1
        if kept % 500 == 0:
            print(f"packed {kept}/{n}", flush=True)
    images.flush()
    masks.flush()
    if kept < n:  # truncate the skipped tail by rewriting the headers
        del images, masks
        for name, shape in (
            ("images.npy", (kept, args.height, args.width, 3)),
            ("masks.npy", (kept, args.height, args.width)),
        ):
            path = os.path.join(args.out, name)
            full = np.load(path, mmap_mode="r")
            trimmed = open_memmap(
                path + ".tmp", mode="w+", dtype=np.uint8, shape=shape
            )
            trimmed[:] = full[:kept]
            trimmed.flush()
            del full, trimmed
            os.replace(path + ".tmp", path)
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump({
            "width": args.width, "height": args.height,
            "count": kept, "kind": args.kind,
        }, f)
    print(json.dumps({"packed": kept, "skipped": n - kept, "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
