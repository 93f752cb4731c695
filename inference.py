#!/usr/bin/env python
"""Video inference entry point — counterpart of the reference inference.py.

The reference runs a frame-serial batch-1 loop with a hard-coded checkpoint
and video path (inference.py:24,149); here the pipeline is batched and
double-buffered (decode thread -> device batch -> postprocess overlap) and
everything is a flag:

    python inference.py --infer.video=assets/road2.mp4 \
        --infer.checkpoint=checkpoints --infer.output=out.mp4
    python inference.py --infer.checkpoint=model_epoch_172.pth  # torch import
    python inference.py --infer.artifact=exported/model.stablehlo  # serve the
        deployed StableHLO artifact (weights baked in; convert.py output)

Postprocess semantics are identical to the reference: road morphology close +
keep-largest component, car contour boxes with distance labels, 0.6/0.4
blend. Accepts Orbax checkpoint dirs or reference .pth files.
"""

from __future__ import annotations

import json
import logging
import sys


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    logging.getLogger("absl").setLevel(logging.WARNING)

    from tpuseg.core.platform import apply_platform_flag

    argv = apply_platform_flag(argv if argv is not None else sys.argv[1:])

    from tpuseg.configs import load_config
    from tpuseg.infer.predictor import Predictor
    from tpuseg.infer.video import VideoPipeline

    cfg = load_config(argv)
    predictor = Predictor(
        cfg.model,
        checkpoint=cfg.infer.checkpoint,
        artifact=cfg.infer.artifact,
        input_hw=(cfg.data.height, cfg.data.width),
        batch_size=cfg.infer.batch_size,
        colorize_on_device=cfg.infer.colorize_on_device,
        upscale_on_host=cfg.infer.upscale_on_host,
        preprocess_on_host=cfg.infer.preprocess_on_host,
        device_close=cfg.infer.device_close,
        fetch_pack4=cfg.infer.fetch_pack4,
        normalize_mean=cfg.data.normalize_mean,
        normalize_std=cfg.data.normalize_std,
    )
    pipeline = VideoPipeline(
        predictor,
        road_cleanup=cfg.infer.road_cleanup,
        car_boxes=cfg.infer.car_boxes,
        min_car_area=cfg.infer.min_car_area,
        blend_alpha=cfg.infer.blend_alpha,
        pipeline_depth=cfg.infer.pipeline_depth,
    )
    stats = pipeline.run(
        cfg.infer.video,
        output_path=cfg.infer.output,
        display=cfg.infer.display,
        max_frames=cfg.infer.max_frames or None,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
