#!/usr/bin/env python
"""Convert a PyTorch ``.pth`` checkpoint into a train-ready Orbax checkpoint.

One command from a downloaded state_dict to a checkpoint that ``main.py``
(``--train.init_checkpoint``), ``inference.py`` and ``convert.py``
(``--infer/--export.checkpoint``) can consume:

    python tools/import_pretrained.py --pth mobilenet_v2-imagenet.pth \
        --out checkpoints/pretrained

Two input flavors are auto-detected:

- a torchvision ImageNet ``mobilenet_v2`` state_dict (``features.N...`` keys,
  ``classifier.*`` ignored): imports the ENCODER and leaves the decoder at
  its random init — the reference's pretrained-at-construction behavior
  (src/unet.py:12);
- a full reference-model state_dict (``backbone.features.*`` + ``upK``/
  ``outc``): imports everything (FP32-parity path, tests/test_torch_parity).

The output checkpoint stores {"state": {"params", "batch_stats"}} at step 0,
the shape load_variables (tpuseg/infer/predictor.py) and the trainer's
``init_checkpoint`` both understand.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True, help="input .pth state_dict")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--model", default="mobilenetv2_unet",
                    help="tpuseg model registry name")
    ap.add_argument("--num-classes", type=int, default=10)
    ap.add_argument("--platform", default="",
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args(argv)

    from tpuseg.core.platform import env_platform_override

    platform = args.platform or env_platform_override()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from tpuseg.configs import ModelConfig
    from tpuseg.core.checkpoint import CheckpointManager
    from tpuseg.core.torch_import import (
        import_state_dict,
        import_torchvision_encoder,
        merge_variables,
    )
    from tpuseg.models.registry import build_model

    raw = torch.load(args.pth, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    sd = {k: v.detach().cpu().numpy() for k, v in raw.items()}

    full_model = any(k.startswith(("up1.", "outc.")) for k in sd)
    if full_model:
        print(f"full-model state_dict ({len(sd)} tensors): importing all")
        variables = import_state_dict(sd, args.model)
    else:
        print(f"encoder-only state_dict ({len(sd)} tensors): importing "
              "MobileNetV2 features, decoder stays at random init")
        if args.model != "mobilenetv2_unet":
            print("ERROR: encoder-only import needs --model=mobilenetv2_unet")
            return 1
        model = build_model(
            ModelConfig(name=args.model, num_classes=args.num_classes)
        )
        from tpuseg.core.device_io import init_on_host

        # one host-side init program (eager remote init = minutes of
        # per-op tunnel round trips, CLAUDE.md / core.device_io)
        init = init_on_host(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)), train=False
        ))
        enc = import_torchvision_encoder(sd)
        variables = {
            "params": merge_variables(
                jax.tree.map(np.asarray, init["params"]), enc["params"]
            ),
            "batch_stats": merge_variables(
                jax.tree.map(np.asarray, init["batch_stats"]),
                enc["batch_stats"],
            ),
        }

    with CheckpointManager(args.out, max_to_keep=1) as mgr:
        mgr.save(
            0,
            {
                "state": {
                    "params": variables["params"],
                    "batch_stats": variables["batch_stats"],
                }
            },
            force=True,
        )
    n = len(jax.tree.leaves(variables["params"]))
    print(f"Wrote step-0 checkpoint ({n} param tensors) to {args.out}")
    print("Use with: python main.py --train.init_checkpoint="
          f"{args.out}  (or --infer/--export.checkpoint)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
