"""The device side of inference: preprocess + forward + argmax, one program.

The reference runs per-frame: cv2.resize -> BGR2RGB -> ToTensor+Normalize ->
forward -> torch.max -> .cpu() -> cv2 nearest resize back to frame size
(inference.py:28-70), with a host<->device round trip per step. Here the whole
chain — normalize, forward, argmax, nearest upscale to the output frame size —
is ONE jitted XLA program over a BATCH of frames; the host only decodes video
and runs the irregular cv2 postprocess (SURVEY.md §3.2).

Checkpoint sources: an Orbax directory from tpuseg training, a reference
``.pth`` state_dict, or fresh random init.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.configs import ModelConfig
from tpuseg.data.augment import normalize_images
from tpuseg.models.registry import build_model
from tpuseg.ops.resize import resize_bilinear, resize_nearest


def load_variables(checkpoint: str, model_name: str, init_fn) -> dict:
    """Resolve a checkpoint path into {"params", "batch_stats"} variables."""
    if not checkpoint:
        return init_fn()
    if checkpoint.endswith(".pth"):
        from tpuseg.core.torch_import import load_pth

        return load_pth(checkpoint, model_name)
    if os.path.isdir(checkpoint):
        from tpuseg.core.checkpoint import CheckpointManager

        with CheckpointManager(checkpoint) as mgr:
            restored = mgr.restore()
        state = restored["state"] if "state" in restored else restored
        out = {
            "params": state["params"],
            "batch_stats": state.get("batch_stats", {}),
        }
        if state.get("quant"):  # calibrated int8 artifact (export.int8_full)
            out["quant"] = state["quant"]
        return out
    raise FileNotFoundError(f"checkpoint {checkpoint!r} not found")


class Predictor:
    """Batched jitted (frames -> class maps) with fixed shapes.

    ``__call__`` takes uint8 RGB frames [B, H, W, 3] at ANY fixed source size
    and returns uint8 class maps [B, H, W] at that same size: the model-size
    resize (bilinear, cv2 convention) and the nearest upscale both run on
    device as part of the single program.
    """

    def __init__(
        self,
        model_cfg: ModelConfig,
        checkpoint: str = "",
        input_hw: Tuple[int, int] = (128, 256),
        batch_size: int = 8,
        colorize_on_device: bool = False,
        mesh=None,
    ):
        """``mesh``: a ``jax.sharding.Mesh`` with a "data" axis shards each
        batch over the chips (params replicated, XLA partitions the whole
        program) — serving-side data parallelism, the inference counterpart
        of the sharded train step. ``colorize_on_device`` uses the pure-XLA
        argmax+palette gather (measured FREE on v5e: 10,498 vs 10,445 fps
        argmax-only — tools/colorize_bench.py), which partitions fine;
        only the Pallas model kernels (``use_pallas``) are single-chip."""
        if mesh is not None and model_cfg.use_pallas:
            raise ValueError(
                "use_pallas is single-chip only; Pallas kernels are not "
                "partitionable across a mesh"
            )
        if mesh is not None:
            n_data = mesh.shape.get("data", 1)
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh's "
                    f"data axis ({n_data} devices)"
                )
        self.model = build_model(model_cfg)
        self.mesh = mesh
        self.input_hw = input_hw
        self.batch_size = batch_size
        # Device argmax+colorize (XLA palette gather; pallas_kernels routes
        # there): the device also emits the packed-BGR overlay, so the host
        # skips its palette pass (the reference's 10-pass recolor,
        # inference.py:109) — at the cost of fetching 4 B/px packed colors
        # alongside the 1 B/px class map.
        self.colorize_on_device = colorize_on_device or model_cfg.use_pallas

        def init_fn():
            v = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, *input_hw, 3)),
                train=False,
            )
            return {
                "params": v["params"],
                "batch_stats": v.get("batch_stats", {}),
            }

        self.variables = load_variables(checkpoint, model_cfg.name, init_fn)
        # calibrated int8 artifact: every ConvBNAct runs int8 x int8 on the MXU
        self.int8 = "quant" in self.variables
        if mesh is not None:
            from tpuseg.core.mesh import replicated_sharding

            self.variables = jax.device_put(
                self.variables, replicated_sharding(mesh)
            )
        self._jitted = {}

    def _fn_for(self, frame_hw: Tuple[int, int]):
        if frame_hw in self._jitted:
            return self._jitted[frame_hw]
        mh, mw = self.input_hw
        fh, fw = frame_hw
        colorize = self.colorize_on_device
        int8 = self.int8

        def run(variables, frames):
            x = frames.astype(jnp.float32)
            # cv2.resize INTER_LINEAR == half-pixel bilinear (inference.py:30)
            x = resize_bilinear(x, mh, mw, align_corners=False)
            x = normalize_images(x)
            bound = {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            }
            if int8:
                bound["quant"] = variables["quant"]
            logits = self.model.apply(bound, x, train=False)
            if colorize:
                from tpuseg.data.class_maps import COLOR_MAP_BGR
                from tpuseg.ops.pallas_kernels import argmax_colorize

                classes, packed = argmax_colorize(logits, COLOR_MAP_BGR)
                # nearest upscale commutes with the palette lookup
                return (
                    resize_nearest(classes, fh, fw),
                    resize_nearest(packed, fh, fw),
                )
            classes = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            # nearest upscale back to frame size (inference.py:68-70)
            return resize_nearest(classes, fh, fw)

        if self.mesh is None:
            run = jax.jit(run)
        else:
            from tpuseg.core.mesh import batch_sharding, replicated_sharding

            run = jax.jit(
                run,
                in_shardings=(
                    replicated_sharding(self.mesh),
                    batch_sharding(self.mesh),
                ),
                out_shardings=batch_sharding(self.mesh),
            )
        self._jitted[frame_hw] = run
        return run

    def __call__(self, frames: np.ndarray):
        """frames: uint8 RGB [B, H, W, 3] -> class maps uint8 [B, H, W]
        (plus packed-BGR uint32 overlays when colorize_on_device)."""
        if self.mesh is not None:
            n_data = self.mesh.shape.get("data", 1)
            if frames.shape[0] % n_data:
                raise ValueError(
                    f"batch of {frames.shape[0]} frames not divisible by "
                    f"the mesh's data axis ({n_data} devices) — pad the "
                    "batch (VideoPipeline does this automatically)"
                )
        fn = self._fn_for((frames.shape[1], frames.shape[2]))
        out = fn(self.variables, jnp.asarray(frames))
        if self.colorize_on_device:
            return np.asarray(out[0]), np.asarray(out[1])
        return np.asarray(out)

    def predict_async(self, frames: np.ndarray):
        """Dispatch without host sync; returns the device array (fetch with
        np.asarray when needed) — the double-buffering hook for VideoPipeline."""
        fn = self._fn_for((frames.shape[1], frames.shape[2]))
        return fn(self.variables, jnp.asarray(frames))
