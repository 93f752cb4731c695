#!/usr/bin/env python
"""Host input-pipeline throughput: quantifies the 1-core host ceiling.

The TPU consumes batches far faster than a single-core host can decode; this
tool measures the InputPipeline's sustained batches/sec (and the implied
imgs/sec) for a synthetic source (pure numpy generation) and, when given
dirs, the real decode path — so training-throughput regressions can be
attributed to host vs device.

    python tools/pipeline_bench.py [--batch 64] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--img_dir", default="")
    p.add_argument("--mask_dir", default="")
    p.add_argument("--cache_mb", type=int, default=0,
                   help="decoded-sample RAM cache budget (0 = off)")
    p.add_argument("--platform", default="cpu")
    args = p.parse_args(argv)

    import jax

    from tpuseg.core.platform import env_platform_override

    platform = args.platform or env_platform_override()
    if platform:
        jax.config.update("jax_platforms", platform)

    from tpuseg.configs import DatasetSourceConfig
    from tpuseg.data.combined import CombinedDataset
    from tpuseg.data.pipeline import InputPipeline
    from tpuseg.data.sources import build_source

    if args.img_dir:
        cfg = DatasetSourceConfig(
            kind="bdd100k", img_dir=args.img_dir, mask_dir=args.mask_dir
        )
    else:
        cfg = DatasetSourceConfig(kind="synthetic", num_samples=256)
    src = build_source(cfg, args.width, args.height)
    pipe = InputPipeline(
        CombinedDataset([src]),
        batch_size=args.batch,
        height=args.height,
        width=args.width,
        cache_bytes=args.cache_mb << 20,
    )
    if args.cache_mb:  # warm pass so the steady-state (cached) rate is shown
        for _ in pipe.train_batches(args.steps):
            pass
    n = 0
    t0 = time.perf_counter()
    for images, masks in pipe.train_batches(args.steps):
        n += 1
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "host_pipeline_imgs_per_sec",
        "value": round(args.batch * n / dt, 1),
        "unit": "imgs/sec",
        "source": cfg.kind,
        "batch": args.batch,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
