"""Typed dataclass config system with YAML + CLI-flag overrides.

The reference has no config system: every knob is a hard-coded constant
(dataset paths and input size at main.py:23-48, batch/lr/epochs at
main.py:90-103, checkpoint paths at inference.py:24 / convert.py:23, the
50/20/30 source mix at main.py:69-71, class maps inside each dataset file).
Here those constants become documented defaults of typed dataclasses, with

    cfg = load_config(argv)            # YAML file + --dotted.key=value flags

Dotted CLI overrides: ``--train.batch_size=64 --model.num_classes=10``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass
class ModelConfig:
    """Model architecture selection and hyperparameters."""

    name: str = "mobilenetv2_unet"  # one of tpuseg.models.registry
    num_classes: int = 10           # reference: main.py:98 (output_channels=10)
    # UNet width; 0 = the model's reference default (UNet 64, src/unet.py:125;
    # LightUNet 32, src/unet.py:149).
    base_filters: int = 0
    width_mult: float = 1.0         # MobileNetV2 width multiplier
    # dtype policy: params always fp32; compute/activations may be bf16.
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    # Use fused Pallas kernels for hot blocks (pure-JAX fallback when False).
    use_pallas: bool = False
    # Space-to-depth stem rewrite (apply-time path; parameter tree unchanged).
    # Measured slower on TPU v5e (BENCH_r01); kept as an A/B-able toggle.
    stem_s2d: bool = False
    # Exact subpixel/d2s rewrite of decoder conv1s (tpuseg.ops.subpixel).
    # Default ON: +30% fps on TPU (2289 vs 1767 @512x512 batch 128).
    up_subpixel: bool = True
    # fp32 final-upsample contraction (the exact-parity convention). False
    # runs it in the compute dtype: +6.8% fps @512x512 batch 256 on TPU
    # (2411 vs 2257.6, bf16), logits ~2^-9 rel off so argmax can flip at
    # exact near-ties — an opt-in serving knob, like the reference's own
    # FP16 deployment claim (README.md:113-117). Apply-time only.
    head_fp32: bool = True


@dataclass
class DatasetSourceConfig:
    """One data source (BDD100K / CARLA / SEAME). ``kind`` selects the loader."""

    kind: str = ""     # "bdd100k" | "carla" | "seame" | "synthetic" | "packed"
    img_dir: str = ""
    mask_dir: str = ""                   # bdd100k/carla
    annotation_file: str = ""            # seame (JSON-lines polygons)
    weight: float = 0.0                  # target sampling fraction (see mix below)
    num_samples: int = 64                # synthetic only
    # synthetic only: class-imbalance rehearsal knobs (probability each
    # candidate car is drawn / car size multiplier). Defaults = balanced
    # scenes, bit-identical to the original generator.
    car_prob: float = 1.0
    car_scale: float = 1.0
    # "packed": a tools/pack_dataset.py output dir (pre-decoded memmap —
    # zero host decode at train time)
    packed_dir: str = ""


@dataclass
class DataConfig:
    """Input pipeline configuration.

    Defaults mirror the reference: input 256x128 (W x H, main.py:23), source
    mix 50% BDD100K / 20% SEAME / 30% CARLA (main.py:69-71 — realized
    *correctly* here; the reference's weight loop drops the CARLA weight),
    train-time augmentation = resize / hflip(.5) / shift-scale-rotate(.5) /
    brightness-contrast(.5) / ImageNet-normalize (src/BDD100KDataset.py:39-46).
    """

    width: int = 256
    height: int = 128
    sources: Tuple[DatasetSourceConfig, ...] = ()
    mix: Tuple[float, float, float] = (0.5, 0.2, 0.3)  # bdd / seame / carla
    val_split: float = 0.0               # reference main.py:55
    seed: int = 42                       # reference CombinedDataset.py:9
    prefetch: int = 2                    # batches prefetched to device
    # RAM budget for caching decoded samples (+ assembled eval batches).
    # Decode+remap+resize is deterministic per index (augmentation is on
    # device), so hits are byte-identical; on a one-core host, decode is the
    # end-to-end training ceiling and a fitting dataset removes it after
    # epoch 1. 0 disables.
    cache_bytes: int = 0
    # On-device train-time augmentation. False = normalize-only batches (the
    # reference's is_train=False path, src/CombinedDataset.py:123-143).
    augment: bool = True
    # Extended augmentation (the reference's augmentation.py pipeline, which
    # was written but never wired in — here it is a real switch).
    heavy_augment: bool = False
    normalize_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    normalize_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclass
class TrainConfig:
    """Training hyperparameters. Defaults = reference main.py:90-103."""

    batch_size: int = 8                  # global batch (sharded over mesh)
    lr: float = 1.5e-4                   # Adam (main.py:100)
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    # Optional LR schedule (reference has none: constant Adam LR).
    lr_schedule: str = ""                # "" (constant) | "cosine"
    warmup_steps: int = 0
    optimizer: str = "adam"              # "adam" | "adamw" | "sgd"
    # Reduced-precision optimizer state: storage dtype for Adam/AdamW's
    # first moment (optax mu_dtype) or SGD's momentum accumulator.
    # "" = fp32 (the reference-parity default, torch Adam state is fp32 —
    # src/train.py:37-39). MEASURED VERDICT (DESIGN §46): throughput NOISE
    # on this model (-0.3%/-0.0%) — the moment tree is 0.04% of the step's
    # HBM traffic, which is activations, not params. Quality-neutral both
    # protocol arms. Ships as a knob for param-dominated models, not a
    # speed lever here. The second moment stays fp32 (optax has no
    # nu_dtype; nu is also the fragile tree under bf16's 8 mantissa bits).
    mu_dtype: str = ""
    # Cast gradients to bf16 between backward and optimizer update.
    # MEASURED LOSING 4-6% (DESIGN §46): the cast breaks backward->Adam
    # fusion, and the grad bytes it halves were never the wall. Off by
    # default on both parity AND speed grounds; quality-neutral.
    grads_bf16: bool = False
    weight_decay: float = 1e-4           # adamw only
    momentum: float = 0.9                # sgd only
    # Loss selection (reference: plain CrossEntropyLoss, main.py:99).
    # "ce" | "focal" | "dice" | "ce+dice" | "lovasz" | "ce+lovasz"
    # (tpuseg.train.loss.make_loss_fn).
    loss: str = "ce"
    # Per-class CE/focal weights for the road-scene class imbalance: empty
    # tuple = unweighted; exactly num_classes floats
    # (--train.class_weights=1,2,... or YAML list; torch weight= semantics);
    # or the string "auto"/"auto:median"/"auto:inverse" — the Trainer scans
    # its own train split at startup and resolves median-frequency (or
    # inverse-frequency) weights (tpuseg/data/class_stats.py, DESIGN §38).
    class_weights: Tuple[float, ...] = ()
    label_smoothing: float = 0.0         # torch label_smoothing= semantics
    focal_gamma: float = 2.0             # focal only
    dice_weight: float = 0.5             # ce+dice / ce+lovasz mix weight
    # Level-set resolution of the sort-free Lovász path (lovasz/ce+lovasz):
    # the exact algorithm's XLA:TPU sort costs 26x the whole train step;
    # the binned formulation recovers it at equal protocol quality
    # (DESIGN §45). 0 = exact sort (the parity oracle).
    lovasz_bins: int = 256
    # Target value excluded from loss + its denominator (torch ignore_index;
    # e.g. 255 for void pixels). Negative = off (all 0..C-1 targets count).
    ignore_index: int = -1
    progress: bool = False               # tqdm bar (reference src/train.py:27)
    debug_nans: bool = False             # jax_debug_nans for production runs
    epochs: int = 200                    # main.py:103
    steps_per_epoch: int = 0             # 0 = derive from dataset size
    log_every: int = 50
    eval_every_epochs: int = 1
    # Test-time augmentation for the IN-TRAINING val eval ("" | "flip" |
    # "ms" | "flip+ms" — same ladder as tools/eval_miou.py --tta). When
    # set, early stopping and best-checkpoint selection optimize the TTA
    # metric (the number deployment will see if it also runs TTA). Off by
    # default: measured eval wall-clock is 1.66x/4.75x/6.76x per epoch
    # (DESIGN §43b/§43c); the cheap default is one offline TTA eval of the
    # final checkpoint (tools/eval_miou.py --tta). eval_tta_scales mirrors
    # --ms_scales (0.5,1.5 measured losing on BOTH axes — DESIGN §43c).
    eval_tta: str = ""
    eval_tta_scales: Tuple[float, ...] = (0.75, 1.25)
    # Stop after this many consecutive evals without val-mIoU improving by
    # more than early_stop_min_delta (requires a val split). 0 = off (the
    # reference always runs all 200 epochs, src/train.py:22).
    early_stop_patience: int = 0
    early_stop_min_delta: float = 0.0
    # Exponential moving average of the weights: ema = d*ema + (1-d)*params
    # after every optimizer update. 0 = off (reference has none). When on,
    # eval/best-selection and serving (Predictor/eval_miou via
    # load_variables) use the EMA weights; the checkpoint carries both.
    ema_decay: float = 0.0
    # Quantization-aware training: every ConvBNAct conv runs fake-quantized
    # (activations + per-channel kernels rounded to the int8 grids of
    # export.int8_full, straight-through gradients) so the weights adapt to
    # int8 deployment numerics. Eval/checkpoints stay fp32; serving int8
    # still goes through the normal post-training calibrate() pass, which
    # QAT-trained weights tolerate with less accuracy loss.
    qat: bool = False
    # Knowledge distillation (Hinton soft targets; tpuseg.train.distill —
    # no reference counterpart). distill_checkpoint: frozen-teacher weights
    # (Orbax dir or torch .pth); its forward fuses INTO the jitted step.
    # distill_model/base_filters/width_mult: teacher architecture; each
    # defaults (""/0/0.0) to the student's own setting; num_classes always
    # matches the student's.
    # loss = (1-alpha)*base_loss + alpha*T^2*KL(teacher||student).
    distill_checkpoint: str = ""
    distill_model: str = ""
    distill_base_filters: int = 0
    distill_width_mult: float = 0.0
    distill_alpha: float = 0.5
    distill_temperature: float = 2.0
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 5
    save_every_epochs: int = 1           # reference saves every epoch (train.py:77)
    resume: bool = False
    # Initialize params/batch_stats (not optimizer/sampler) from a checkpoint
    # dir or .pth — the pretrained-encoder start (tools/import_pretrained.py).
    init_checkpoint: str = ""
    remat: bool = False                  # jax.checkpoint the encoder to save HBM
    # Train steps executed per host->device dispatch (lax.scan-chained;
    # numerically identical to dispatching each step). >1 amortizes the
    # remote-tunnel round trip (~50-100 ms/dispatch on this host) that
    # otherwise dominates end-to-end training; loss/logging granularity
    # stays per-step, checkpoint/eval cadence stays per-epoch.
    steps_per_dispatch: int = 1
    # Micro-batches averaged per optimizer update (optax.MultiSteps): a
    # k-times-larger effective batch without the activation memory. 1 = off.
    grad_accum: int = 1
    # Clip gradients to this global L2 norm before the optimizer update
    # (optax.clip_by_global_norm). 0 = off (the reference never clips).
    grad_clip_norm: float = 0.0
    profile_dir: str = ""                # non-empty => jax.profiler trace
    tensorboard_dir: str = ""            # non-empty => TB scalar summaries
    # JSON-lines epoch records (loss, val mIoU, imgs/sec) persisted to disk;
    # "" = <checkpoint_dir>/history.jsonl when checkpointing ("none" = off)
    history_file: str = ""
    seed: int = 0


@dataclass
class MeshConfig:
    """Device mesh. data axis = DP; spatial axis = sharded-H conv (optional)."""

    data: int = -1       # -1 = all devices
    spatial: int = 1


@dataclass
class InferConfig:
    """Video/batch inference. Reference: inference.py (batch=1 serial loop)."""

    checkpoint: str = ""
    # serve a deserialized StableHLO export (convert.py output) instead of
    # the live model — weights are baked into the artifact, so checkpoint
    # is ignored; single-chip (no sharding annotations inside the artifact)
    artifact: str = ""
    video: str = "assets/demo.mp4"       # synthetic demo clip (tools/make_demo_video.py)
    output: str = ""                     # output video path ("" = no write)
    batch_size: int = 8                  # batched, double-buffered pipeline
    display: bool = False                # cv2.imshow (reference behavior)
    # device also emits the packed-BGR overlay (free on-chip: XLA argmax+
    # palette gather, tools/colorize_bench.py) so the host skips its palette
    # pass — costs an extra 4 B/px device->host fetch, so measure per setup
    colorize_on_device: bool = False
    # fetch class maps at MODEL resolution and nearest-upscale on host (the
    # reference's own cv2 INTER_NEAREST, inference.py:68-70 — bit-identical
    # to the device resize): (frame/model)-area-x fewer device->host bytes.
    upscale_on_host: bool = True
    # pack two class ids per fetched byte (<=16 classes; device nibble
    # pack, vectorized host unpack): HALVES the §19 model-res class-map
    # fetch — the tunnel-fetch wall of the gated video headline. Exact
    # round trip; requires upscale_on_host, excludes device_close/
    # colorize_on_device. Measured A/B: DESIGN §50.
    fetch_pack4: bool = False
    # run the reference's 5x5 road morph-close on device, packed into the
    # class map's high bit (zero extra fetch bytes; cv2-bit-exact —
    # tpuseg/ops/morphology.py); only the irregular keep-largest-CC step
    # stays on host. Requires upscale_on_host=false (the reference closes
    # at FRAME resolution). A/B'd on the demo bench — see BASELINE.md.
    device_close: bool = False
    # run the model-size downscale on host with cv2 INTER_LINEAR on uint8
    # frames (byte-for-byte the reference preprocess, inference.py:28-46):
    # (frame/model)-area-x fewer host->device bytes. Off = the device fp32
    # resize chain (can differ from cv2 at rounding-tie boundary pixels).
    preprocess_on_host: bool = False
    # batches in flight on the device before the host blocks on a fetch
    # (1 = classic double buffering); deeper overlaps per-dispatch latency.
    pipeline_depth: int = 3
    # stop after N frames (0 = whole video) — bounded benchmark/smoke runs
    max_frames: int = 0
    # postprocess toggles (reference inference.py:75-141)
    road_cleanup: bool = True            # morphology close + keep-largest-CC
    car_boxes: bool = True               # contour bboxes + distance labels
    min_car_area: float = 300.0
    blend_alpha: float = 0.4             # addWeighted(image,.6,overlay,.4)


@dataclass
class ExportConfig:
    """Export/quantization. Replaces convert.py's ONNX path with StableHLO."""

    checkpoint: str = ""
    output: str = "exported/model.stablehlo"
    # "stablehlo": jax.export artifact (symbolic batch); "onnx": opset-12
    # graph with dynamic batch (the reference's literal format,
    # convert.py:29-42 — emitted without the onnx package); "savedmodel":
    # TF serving dir; "tflite": edge flatbuffer; "quantized": calibrated
    # full-int8 Orbax checkpoint consumable by inference.py.
    format: str = "stablehlo"
    dtype: str = "float32"               # "float32" | "float16" | "int8"
    batch: int = -1                      # -1 = symbolic/dynamic batch dim
    calib_batches: int = 8               # int8 PTQ calibration batches
    # Fold BatchNorm into conv weights in the stablehlo artifact (smaller
    # graph; throughput-neutral at batch 64, -25% at 256 — BASELINE.md).
    # In bf16 compute the fold shifts rounding, so fold_bn=false keeps the
    # artifact bit-closest to the live model.
    fold_bn: bool = True


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    infer: InferConfig = field(default_factory=InferConfig)
    export: ExportConfig = field(default_factory=ExportConfig)


# ---------------------------------------------------------------------------
# Loading / overriding


def _coerce(value: str, target_type: Any) -> Any:
    """Parse a CLI string into the annotated field type."""
    if target_type is bool or isinstance(target_type, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if target_type is int:
        return int(value)
    if target_type is float:
        return float(value)
    if target_type is str:
        return value
    # tuples and other structured values: JSON
    try:
        parsed = json.loads(value)
        if isinstance(parsed, list):
            return tuple(parsed)
        if target_type is tuple and isinstance(parsed, (int, float)):
            # --train.class_weights=2 (single value, no comma) parses to a
            # bare scalar; stored uncoerced it crashes much later inside
            # Trainer._build_loss with an opaque TypeError — wrap it here.
            return (float(parsed),)
        return parsed
    except json.JSONDecodeError:
        if target_type is tuple:
            # bare comma form for numeric tuples: --train.class_weights=1,2,3
            try:
                return tuple(
                    float(p) for p in value.split(",") if p.strip()
                )
            except ValueError:
                pass
        return value


def _set_dotted(cfg: Any, dotted: str, value: str) -> None:
    parts = dotted.split(".")
    obj = cfg
    for p in parts[:-1]:
        if not hasattr(obj, p):
            raise KeyError(f"Unknown config section {p!r} in --{dotted}")
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not dataclasses.is_dataclass(obj) or leaf not in {
        f.name for f in dataclasses.fields(obj)
    }:
        raise KeyError(f"Unknown config key {leaf!r} in --{dotted}")
    ftype = {f.name: f.type for f in dataclasses.fields(obj)}[leaf]
    current = getattr(obj, leaf)
    target = type(current) if current is not None else ftype
    coerced = _coerce(value, target)
    if leaf == "sources":
        if not isinstance(coerced, tuple):
            coerced = (coerced,)
        coerced = tuple(
            DatasetSourceConfig(**s) if isinstance(s, dict) else s
            for s in coerced
        )
        bad = [s for s in coerced if not isinstance(s, DatasetSourceConfig)]
        if bad:
            raise ValueError(
                f"--{dotted} must be a JSON list of objects, got {bad!r}; "
                'e.g. --data.sources=\'[{"kind":"synthetic",'
                '"num_samples":256,"weight":1.0}]\''
            )
    setattr(obj, leaf, coerced)


def _apply_dict(obj: Any, d: dict) -> None:
    names = {f.name for f in dataclasses.fields(obj)}
    for k, v in d.items():
        if k not in names:
            raise KeyError(f"Unknown config key {k!r} for {type(obj).__name__}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _apply_dict(cur, v)
        elif k == "sources" and isinstance(v, list):
            setattr(
                obj, k, tuple(DatasetSourceConfig(**src) for src in v)
            )
        elif isinstance(v, list):
            setattr(obj, k, tuple(v))
        else:
            setattr(obj, k, v)


def load_config(argv: Optional[Sequence[str]] = None) -> Config:
    """Build a Config from an optional YAML file plus --dotted.key=value flags.

    ``--config path.yaml`` loads a YAML (or JSON) file first; remaining flags
    override individual fields, e.g. ``--train.lr=3e-4 --mesh.data=8``.
    """
    cfg = Config()
    argv = list(argv or [])
    # first pass: --config
    remaining = []
    it = iter(range(len(argv)))
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--config" or a.startswith("--config="):
            path = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            i += 1 if "=" in a else 2
            with open(path) as f:
                text = f.read()
            try:
                import yaml  # type: ignore

                d = yaml.safe_load(text)
            except ImportError:  # pragma: no cover - yaml is available here
                d = json.loads(text)
            _apply_dict(cfg, d or {})
        else:
            remaining.append(a)
            i += 1
    # second pass: dotted overrides
    for a in remaining:
        if not a.startswith("--"):
            raise ValueError(f"Unrecognized argument {a!r} (expected --key=value)")
        body = a[2:]
        if "=" not in body:
            raise ValueError(f"Flag {a!r} needs =value")
        key, value = body.split("=", 1)
        _set_dotted(cfg, key, value)
    return cfg


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)
