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


def unpack4_host(packed: np.ndarray) -> np.ndarray:
    """Inverse of the device-side fetch_pack4 nibble pack: [B, h, w/2]
    uint8 -> [B, h, w] class ids (high nibble = even column). Vectorized
    numpy shifts — ~ms for a video batch; exact for ids < 16."""
    b, h, wp = packed.shape
    out = np.empty((b, h, wp * 2), np.uint8)
    out[..., 0::2] = packed >> 4
    out[..., 1::2] = packed & 0x0F
    return out


def upscale_nearest_host(arr: np.ndarray, fh: int, fw: int) -> np.ndarray:
    """cv2 INTER_NEAREST per batch item — the reference's own class-map
    upscale (inference.py:68-70), bit-identical to the device
    ``resize_nearest`` (same half-pixel convention, tests/test_ops.py).

    uint32-packed color planes are resized as 4-channel uint8 views
    (nearest replicates whole pixels, so the reinterpretation is exact).
    """
    import cv2

    if arr.ndim == 3 and arr.dtype == np.uint32:  # packed BGR overlays
        b, h, w = arr.shape
        as8 = arr.view(np.uint8).reshape(b, h, w, 4)
        out8 = upscale_nearest_host(as8, fh, fw)
        return out8.reshape(b, fh * fw * 4).view(np.uint32).reshape(b, fh, fw)
    out = np.empty((arr.shape[0], fh, fw) + arr.shape[3:], arr.dtype)
    for i in range(arr.shape[0]):
        out[i] = cv2.resize(arr[i], (fw, fh), interpolation=cv2.INTER_NEAREST)
    return out


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
            # host-resident, topology-free restore: serving must load a
            # checkpoint saved on ANY device mesh (train on a pod, serve
            # on one chip) — a plain restore replays the saved shardings
            # and refuses under a different topology. The caller packs
            # the tree to its own device(s) in one transfer.
            restored = mgr.restore_host()
        state = restored["state"] if "state" in restored else restored
        params = state["params"]
        if state.get("ema_params"):
            # EMA-trained run (--train.ema_decay): serve the averaged
            # weights — they are what the trainer evaluated and selected
            # the "best" checkpoint by
            params = state["ema_params"]
        out = {
            "params": params,
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
        upscale_on_host: bool = True,
        preprocess_on_host: bool = False,
        device_close: bool = False,
        fetch_pack4: bool = False,
        mesh=None,
        normalize_mean=None,
        normalize_std=None,
        artifact: str = "",
    ):
        """``mesh``: a ``jax.sharding.Mesh`` with a "data" axis shards each
        batch over the chips (params replicated, XLA partitions the whole
        program) — serving-side data parallelism, the inference counterpart
        of the sharded train step. ``colorize_on_device`` uses the pure-XLA
        argmax+palette gather (measured FREE on v5e: 10,498 vs 10,445 fps
        argmax-only — tools/colorize_bench.py), which partitions fine;
        only the Pallas model kernels (``use_pallas``) are single-chip.

        ``upscale_on_host`` (default): the device program stops at the
        model-resolution argmax and the nearest upscale to frame size runs
        on host with cv2 INTER_NEAREST — the reference's own upscale
        (inference.py:68-70), bit-identical to the device path. The fetch
        shrinks by (frame area / model area) — 7x fewer bytes at the demo
        config — and the device program becomes frame-size independent (no
        recompile per video size). False restores the all-on-device
        program. Measured demo impact of the full fetch-path rework
        (model-res fetch + deep pipeline + async copies): 91 -> 153 fps
        default, 213 fps with preprocess_on_host (docs/DESIGN.md §19).

        ``preprocess_on_host``: the model-size downscale runs on host with
        cv2 INTER_LINEAR on the uint8 frames — byte-for-byte the
        REFERENCE's own preprocess (cv2.resize before ToTensor,
        inference.py:28-46) — shrinking the host->device upload by
        (frame/model) area. The device fp32 resize (default) and the uint8
        cv2 resize round differently at tie-break pixels, so class maps can
        differ on a handful of boundary pixels; the flag selects which
        convention is bit-preserved (device fp32 chain vs reference cv2
        chain).

        ``artifact``: serve a DESERIALIZED StableHLO export (convert.py's
        `--export.format=stablehlo` output) instead of the live model — the
        deployment workflow, with weights baked into the artifact (so
        ``checkpoint`` is ignored). The artifact must take normalized
        NHWC float32 images at the model input size and return logits
        (exactly what tpuseg.export.stablehlo.export_model serializes);
        export with batch=-1 (symbolic) or with this Predictor's
        batch_size. Measured throughput parity with the live model:
        tools/artifact_bench.py (ratio 1.005-1.006 on v5e)."""
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
        if artifact and mesh is not None:
            raise ValueError(
                "artifact serving is single-chip: the exported computation "
                "carries no sharding annotations for GSPMD to partition"
            )
        if fetch_pack4:
            # §19's lesson one step further: with <=16 classes, two pixels
            # share one fetched byte — the device emits [B, h, w/2] nibble
            # pairs and the host unpacks (vectorized numpy shifts, ~ms).
            # Halves the device->host class-map fetch, which IS the wall of
            # the gated video headline on tunnel-constrained hosts
            # (DESIGN §49/§50). Exact: ids < 16 round-trip bit-identically.
            if model_cfg.num_classes > 16:
                raise ValueError(
                    f"fetch_pack4 packs class ids into 4 bits; model has "
                    f"{model_cfg.num_classes} classes (> 16)"
                )
            if device_close or colorize_on_device:
                raise ValueError(
                    "fetch_pack4 is incompatible with device_close (uses "
                    "bit 0x80) and colorize_on_device (the 4 B/px color "
                    "fetch dominates anyway)"
                )
            if not upscale_on_host:
                raise ValueError(
                    "fetch_pack4 shrinks the model-res fetch; it requires "
                    "upscale_on_host=True (the frame-res path re-inflates "
                    "the fetch it exists to shrink)"
                )
            if input_hw[1] % 2:
                raise ValueError("fetch_pack4 needs an even model width")
        self.fetch_pack4 = fetch_pack4
        if device_close and upscale_on_host:
            # The reference closes the road mask at FRAME resolution
            # (inference.py:76-83, after the nearest upscale); a close at
            # model resolution then upscaled is a ~(frame/model)x larger
            # effective kernel — not reference parity.
            raise ValueError(
                "device_close runs the 5x5 morph-close at the device "
                "program's output resolution; pass upscale_on_host=False "
                "so that is the frame resolution (reference parity)"
            )
        self.model = build_model(model_cfg)
        self.mesh = mesh
        self.artifact_call = None
        if artifact:
            from tpuseg.export.stablehlo import load_exported

            self.artifact_call = load_exported(artifact)
        from tpuseg.models.registry import validate_input_size

        validate_input_size(self.model, *input_hw)
        self.input_hw = input_hw
        self.batch_size = batch_size
        # Device argmax+colorize (XLA palette gather; pallas_kernels routes
        # there): the device also emits the packed-BGR overlay, so the host
        # skips its palette pass (the reference's 10-pass recolor,
        # inference.py:109) — at the cost of fetching 4 B/px packed colors
        # alongside the 1 B/px class map.
        self.colorize_on_device = colorize_on_device or model_cfg.use_pallas
        self.upscale_on_host = upscale_on_host
        self.preprocess_on_host = preprocess_on_host
        # Pack the 5x5 road morph-close (tpuseg.ops.morphology, cv2-exact)
        # into the class map's unused high bit before the fetch — zero extra
        # tunnel bytes; the host unpacks and keeps only the CC step
        # (clean_road_mask closed_road=). Class ids are a 10-way argmax and
        # the stroke id 254 is only stamped host-side AFTER unpack, so bit
        # 0x80 cannot collide.
        self.device_close = device_close
        # Must match training normalization (DataConfig.normalize_mean/std)
        # or the served model sees mis-normalized inputs — train/serve skew.
        from tpuseg.data.class_maps import IMAGENET_MEAN, IMAGENET_STD

        self.normalize_mean = tuple(
            IMAGENET_MEAN.tolist() if normalize_mean is None
            else normalize_mean
        )
        self.normalize_std = tuple(
            IMAGENET_STD.tolist() if normalize_std is None else normalize_std
        )

        from tpuseg.core.device_io import device_put_packed, init_on_host

        def init_fn():
            # init runs on the host CPU as one jitted program — eager init
            # on a remote-tunnel device is minutes of per-op round trips
            # (tpuseg.core.device_io)
            def _init(key):
                v = self.model.init(
                    key, jnp.zeros((1, *input_hw, 3)), train=False
                )
                return {
                    "params": v["params"],
                    "batch_stats": v.get("batch_stats", {}),
                }

            return init_on_host(_init, jax.random.PRNGKey(0))

        if self.artifact_call is not None:
            # weights live inside the artifact as baked constants
            self.variables = {}
            self.int8 = False
            self._jitted = {}
            return
        self.variables = load_variables(checkpoint, model_cfg.name, init_fn)
        # calibrated int8 artifact: every ConvBNAct runs int8 x int8 on the MXU
        self.int8 = "quant" in self.variables
        # one packed transfer instead of one RPC per leaf (526 s measured
        # for this tree through the remote tunnel)
        if mesh is not None:
            from tpuseg.core.mesh import replicated_sharding

            self.variables = device_put_packed(
                self.variables, sharding=replicated_sharding(mesh)
            )
        else:
            self.variables = device_put_packed(self.variables)
        self._jitted = {}

    def _fn_for(self, frame_hw: Tuple[int, int]):
        # With the host upscale the device program never sees the frame
        # size — one cache entry serves every video resolution.
        key = "model_res" if self.upscale_on_host else frame_hw
        if key in self._jitted:
            return self._jitted[key]
        mh, mw = self.input_hw
        fh, fw = (mh, mw) if self.upscale_on_host else frame_hw
        colorize = self.colorize_on_device
        int8 = self.int8

        def pack_close(classes):
            if not self.device_close:
                return classes
            from tpuseg.infer.postprocess import ROAD_CLASS
            from tpuseg.ops.morphology import morph_close

            closed = morph_close(classes == ROAD_CLASS, 5)
            return classes | jnp.where(
                closed, jnp.uint8(0x80), jnp.uint8(0)
            )

        def run(variables, frames):
            x = frames.astype(jnp.float32)
            if frames.shape[1:3] != (mh, mw):
                # cv2.resize INTER_LINEAR == half-pixel bilinear
                # (inference.py:30); skipped when the host already resized
                # (preprocess_on_host) or frames arrive at model size
                x = resize_bilinear(x, mh, mw, align_corners=False)
            x = normalize_images(x, self.normalize_mean, self.normalize_std)
            if self.artifact_call is not None:
                # deployed StableHLO artifact: weights are baked constants
                logits = self.artifact_call(x)
            else:
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
                if (fh, fw) == (mh, mw):  # host upscales after the fetch
                    return pack_close(classes), packed
                # nearest upscale commutes with the palette lookup
                return (
                    pack_close(resize_nearest(classes, fh, fw)),
                    resize_nearest(packed, fh, fw),
                )
            classes = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            if (fh, fw) == (mh, mw):
                if self.fetch_pack4:
                    # two 4-bit ids per fetched byte (high nibble = even
                    # column): halves the device->host class-map bytes
                    return (
                        (classes[..., 0::2] << jnp.uint8(4))
                        | classes[..., 1::2]
                    )
                return pack_close(classes)
            # nearest upscale back to frame size (inference.py:68-70)
            return pack_close(resize_nearest(classes, fh, fw))

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
        self._jitted[key] = run
        return run

    def _maybe_host_resize(self, frames: np.ndarray) -> np.ndarray:
        """preprocess_on_host: cv2 INTER_LINEAR downscale to model size on
        the uint8 frames (the reference's preprocess, inference.py:28-46) —
        cuts the host->device upload by the frame/model area ratio."""
        mh, mw = self.input_hw
        if not self.preprocess_on_host or frames.shape[1:3] == (mh, mw):
            return frames
        import cv2

        out = np.empty(
            (frames.shape[0], mh, mw, frames.shape[3]), frames.dtype
        )
        for i in range(frames.shape[0]):
            out[i] = cv2.resize(
                frames[i], (mw, mh), interpolation=cv2.INTER_LINEAR
            )
        return out

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
        fh, fw = frames.shape[1], frames.shape[2]
        fn = self._fn_for((fh, fw))
        out = fn(self.variables, jnp.asarray(self._maybe_host_resize(frames)))
        if self.colorize_on_device:
            classes, packed = np.asarray(out[0]), np.asarray(out[1])
            if self.upscale_on_host and classes.shape[1:] != (fh, fw):
                classes = upscale_nearest_host(classes, fh, fw)
                packed = upscale_nearest_host(packed, fh, fw)
            return classes, packed
        classes = np.asarray(out)
        if self.fetch_pack4:
            classes = unpack4_host(classes)
        if self.upscale_on_host and classes.shape[1:] != (fh, fw):
            classes = upscale_nearest_host(classes, fh, fw)
        return classes

    def predict_async(self, frames: np.ndarray, out_hw=None):
        """Dispatch without host sync; returns the device array (fetch with
        np.asarray when needed) — the double-buffering hook for VideoPipeline.

        ``out_hw``: the TRUE output frame size when the caller already
        downscaled the frames (VideoPipeline's preprocess_on_host path) —
        keys the jit cache and, without upscale_on_host, the device
        upscale target. Defaults to the frames' own size."""
        fh, fw = out_hw if out_hw is not None else frames.shape[1:3]
        fn = self._fn_for((fh, fw))
        return fn(self.variables, jnp.asarray(self._maybe_host_resize(frames)))
