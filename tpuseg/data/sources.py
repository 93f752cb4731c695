"""Host-side data sources: decode + label remap + resize, nothing else.

Design split (TPU-first): the host does the irreducible host work — file
listing, image decode, LUT label remap, polygon rasterization, resize to the
model size — and everything numerical (normalize, augment) runs on device
(tpuseg.data.augment). This inverts the reference, which runs its whole
albumentations pipeline per-item on the CPU inside ``__getitem__``
(src/BDD100KDataset.py:57-75 et al.) — a poor fit for a TPU host with few
cores.

Each source yields ``(image uint8 [H,W,3] RGB, mask uint8 [H,W])`` at the
configured size.

Behavioral specs:
- BDD100KSource  <- src/BDD100KDataset.py (sorted jpg/png + png masks, LUT
  remap of the 11-entry class map).
- CarlaSource    <- src/CarlaDataset.py (png images, png masks excluding
  ``*_viz.png``, CARLA LUT).
- SEAMESource    <- src/SEAMEDataset.py (JSON-lines polygon annotations,
  both the multi-class `annotations` format and the legacy road-only
  `polygons` format, rasterized at native resolution with cv2.fillPoly).
- SyntheticSource: procedurally generated road scenes for tests/benchmarks
  (no reference counterpart; the reference has no testable data path).

Unreadable files raise in SEAME (parity with src/SEAMEDataset.py:80-81) but
are skipped-with-log in the directory sources, instead of crashing mid-epoch
(SURVEY.md §5.3).
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional, Tuple

import numpy as np

from tpuseg.configs import DatasetSourceConfig
from tpuseg.data.class_maps import BDD100K_LUT, CARLA_LUT, SEAME_CLASS_MAP

log = logging.getLogger(__name__)


def _cv2():
    import cv2  # local import: keep cv2 out of jit-only processes

    return cv2


def _resize_pair(image: np.ndarray, mask: np.ndarray, width: int, height: int):
    cv2 = _cv2()
    if image.shape[:2] != (height, width):
        image = cv2.resize(image, (width, height), interpolation=cv2.INTER_LINEAR)
    if mask.shape[:2] != (height, width):
        mask = cv2.resize(mask, (width, height), interpolation=cv2.INTER_NEAREST)
    return image, mask


class _DirSource:
    """Shared file-pair listing logic for BDD100K / CARLA."""

    lut: np.ndarray = None  # set by subclass
    img_exts: Tuple[str, ...] = (".jpg", ".png")
    mask_exts: Tuple[str, ...] = (".png",)
    mask_exclude_suffix: Optional[str] = None

    def __init__(self, img_dir: str, mask_dir: str, width: int, height: int):
        self.img_dir = img_dir
        self.mask_dir = mask_dir
        self.width = width
        self.height = height
        self.images: List[str] = sorted(
            os.path.join(img_dir, f)
            for f in os.listdir(img_dir)
            if f.lower().endswith(self.img_exts)
        )
        self.masks: List[str] = sorted(
            os.path.join(mask_dir, f)
            for f in os.listdir(mask_dir)
            if f.lower().endswith(self.mask_exts)
            and not (
                self.mask_exclude_suffix
                and f.endswith(self.mask_exclude_suffix)
            )
        )
        if len(self.images) != len(self.masks):
            # Pair by basename stem: truncating to min length would mispair
            # EVERY sample after the first missing file (half the dataset
            # training on wrong labels, silently).
            def stem(p):
                return os.path.splitext(os.path.basename(p))[0]

            mask_by_stem = {stem(p): p for p in self.masks}
            pairs = [(i, mask_by_stem[stem(i)])
                     for i in self.images if stem(i) in mask_by_stem]
            log.warning(
                "%s: %d images vs %d masks — paired %d by filename stem, "
                "dropped the rest",
                type(self).__name__, len(self.images), len(self.masks),
                len(pairs),
            )
            if not pairs:
                raise FileNotFoundError(
                    f"{type(self).__name__}: image/mask counts differ "
                    f"({len(self.images)} vs {len(self.masks)}) and no "
                    "filename stems match between "
                    f"{self.img_dir!r} and {self.mask_dir!r}"
                )
            self.images = [p for p, _ in pairs]
            self.masks = [p for _, p in pairs]

    def __len__(self) -> int:
        return len(self.images)

    def load(self, idx: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        cv2 = _cv2()
        image = cv2.imread(self.images[idx])
        mask = cv2.imread(self.masks[idx], cv2.IMREAD_GRAYSCALE)
        if image is None or mask is None:
            log.warning("skipping unreadable sample %s", self.images[idx])
            return None
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        mask = self.lut[mask]  # single-gather remap
        return _resize_pair(image, mask, self.width, self.height)


class BDD100KSource(_DirSource):
    lut = BDD100K_LUT
    img_exts = (".jpg", ".png")


class CarlaSource(_DirSource):
    lut = CARLA_LUT
    img_exts = (".png",)
    mask_exclude_suffix = "_viz.png"


class SEAMESource:
    """Polygon-annotated frames from a JSON-lines file."""

    def __init__(self, img_dir: str, annotation_file: str, width: int, height: int):
        self.img_dir = img_dir
        self.width = width
        self.height = height
        self.annotations: List[dict] = []
        with open(annotation_file) as f:
            for line in f:
                if line.strip():
                    self.annotations.append(json.loads(line))
        total = len(self.annotations)
        self.annotations = [
            a
            for a in self.annotations
            if os.path.exists(os.path.join(img_dir, a["raw_file"]))
        ]
        log.info(
            "SEAME: %d/%d annotations have matching images",
            len(self.annotations), total,
        )

    def __len__(self) -> int:
        return len(self.annotations)

    def rasterize(self, annotation: dict) -> np.ndarray:
        """fillPoly at native resolution (src/SEAMEDataset.py:84-103)."""
        cv2 = _cv2()
        mask = np.zeros(
            (annotation["image_height"], annotation["image_width"]), np.uint8
        )
        if "annotations" in annotation:
            for class_ann in annotation["annotations"]:
                class_id = SEAME_CLASS_MAP.get(class_ann["type"])
                if class_id is None:
                    continue
                for polygon in class_ann["polygons"]:
                    cv2.fillPoly(
                        mask, np.array([polygon], np.int32), int(class_id)
                    )
        else:
            for polygon in annotation.get("polygons", []):
                cv2.fillPoly(
                    mask,
                    np.array([polygon], np.int32),
                    SEAME_CLASS_MAP["drivable_area"],
                )
        return mask

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        cv2 = _cv2()
        ann = self.annotations[idx]
        path = os.path.join(self.img_dir, ann["raw_file"])
        image = cv2.imread(path)
        if image is None:
            raise ValueError(f"Could not read image: {path}")
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        mask = self.rasterize(ann)
        return _resize_pair(image, mask, self.width, self.height)


class SyntheticSource:
    """Deterministic procedural road scenes: trapezoid road on the ground
    plane, sidewalk bands, rectangular 'cars'. Learnable structure for
    integration tests and benchmarks without any dataset on disk.

    ``car_prob`` / ``car_scale`` make the car class deliberately rare/small
    (the class-imbalance rehearsal regime for --train.class_weights and
    focal loss — the real datasets' rare classes, reference
    src/BDD100KDataset.py's 10-class map, cannot be shipped in-image). Both
    default to the balanced behavior and, at their defaults, consume the
    exact RNG stream of the original generator, so existing
    distribution-parity tests stay bit-identical."""

    def __init__(self, num_samples: int, width: int, height: int, seed: int = 0,
                 car_prob: float = 1.0, car_scale: float = 1.0):
        self.n = num_samples
        self.width = width
        self.height = height
        self.seed = seed
        self.car_prob = car_prob
        self.car_scale = car_scale

    def __len__(self) -> int:
        return self.n

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        h, w = self.height, self.width
        image = np.zeros((h, w, 3), np.uint8)
        mask = np.zeros((h, w), np.uint8)
        # sky gradient
        sky = np.linspace(180, 90, h, dtype=np.float32)[:, None]
        image[..., 2] = np.clip(sky + rng.randint(-20, 20), 0, 255)
        image[..., 1] = image[..., 2] * 0.8
        image[..., 0] = image[..., 2] * 0.6
        horizon = h // 2 + rng.randint(-h // 8, h // 8)
        # road trapezoid
        cx = w // 2 + rng.randint(-w // 8, w // 8)
        top_half, bot_half = w // 16, w // 2
        cols = np.arange(w)[None, :]
        rows = np.arange(h)[:, None]
        t = np.clip((rows - horizon) / max(h - horizon, 1), 0, 1)
        half = top_half + (bot_half - top_half) * t
        road = (rows >= horizon) & (np.abs(cols - cx) <= half)
        mask[road] = 1
        image[road] = (90, 90, 95)
        # sidewalk strips flanking the road
        side = (rows >= horizon) & (np.abs(cols - cx) <= half * 1.3) & ~road
        mask[side] = 6
        image[side] = (160, 150, 140)
        # cars
        for _ in range(rng.randint(1, 4)):
            # Imbalance gates draw from the SAME stream but only when the
            # knobs are non-default, keeping the balanced stream unchanged.
            if self.car_prob < 1.0 and rng.random_sample() >= self.car_prob:
                continue
            cw = rng.randint(w // 12, w // 6)
            if self.car_scale != 1.0:
                cw = max(3, int(cw * self.car_scale))
            ch = max(4, cw // 2)
            y0 = rng.randint(horizon, max(horizon + 1, h - ch - 1))
            x0 = rng.randint(0, max(1, w - cw - 1))
            color = rng.randint(0, 255, size=3)
            image[y0 : y0 + ch, x0 : x0 + cw] = color
            mask[y0 : y0 + ch, x0 : x0 + cw] = 2
        noise = rng.randint(-10, 10, size=image.shape)
        image = np.clip(image.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        return image, mask


class PackedSource:
    """Memory-mapped pre-decoded dataset (tools/pack_dataset.py output).

    The decode + remap + resize work is done ONCE, offline; at train time
    ``load`` is a memmap slice copy — no cv2, no warm-up epoch, and the OS
    page cache (not the process) holds the bytes. This is the TPU-native
    answer to a decode-bound host (BASELINE.md: 1-core decode caps
    end-to-end training; the reference instead re-decodes per epoch in
    DataLoader workers, main.py:90-95). Layout: ``images.npy`` uint8
    [N,H,W,3] RGB, ``masks.npy`` uint8 [N,H,W], ``meta.json``.
    """

    def __init__(self, packed_dir: str, width: int, height: int):
        meta_path = os.path.join(packed_dir, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta["width"], meta["height"]) != (width, height):
            raise ValueError(
                f"packed dataset {packed_dir!r} is {meta['width']}x"
                f"{meta['height']}, pipeline wants {width}x{height} — "
                "re-pack with tools/pack_dataset.py at the target size"
            )
        self.images = np.load(
            os.path.join(packed_dir, "images.npy"), mmap_mode="r"
        )
        self.masks = np.load(
            os.path.join(packed_dir, "masks.npy"), mmap_mode="r"
        )
        if len(self.images) != len(self.masks):
            raise ValueError(
                f"packed dataset {packed_dir!r}: {len(self.images)} images "
                f"vs {len(self.masks)} masks"
            )

    def __len__(self) -> int:
        return len(self.images)

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        # np.array() materializes the memmap slice (the batch assembler
        # writes into its own buffer, so this copy is the only host work)
        return np.array(self.images[idx]), np.array(self.masks[idx])

    def load_batch(
        self,
        indices: np.ndarray,
        img_out: np.ndarray,
        msk_out: np.ndarray,
    ) -> None:
        """Gather a whole batch in one call — native GIL-free memcpy when
        ``native/libtpuseg_loader.so`` is built, numpy fancy-index copy
        otherwise (identical bytes either way)."""
        from tpuseg.ops import native_loader

        if native_loader.available():
            native_loader.gather2(
                self.images, self.masks, indices, img_out, msk_out
            )
        else:
            img_out[:] = self.images[indices]
            msk_out[:] = self.masks[indices]


def build_source(cfg: DatasetSourceConfig, width: int, height: int):
    if cfg.kind == "bdd100k":
        return BDD100KSource(cfg.img_dir, cfg.mask_dir, width, height)
    if cfg.kind == "carla":
        return CarlaSource(cfg.img_dir, cfg.mask_dir, width, height)
    if cfg.kind == "seame":
        return SEAMESource(cfg.img_dir, cfg.annotation_file, width, height)
    if cfg.kind == "synthetic":
        return SyntheticSource(cfg.num_samples, width, height,
                               car_prob=cfg.car_prob, car_scale=cfg.car_scale)
    if cfg.kind == "packed":
        return PackedSource(cfg.packed_dir, width, height)
    raise KeyError(f"unknown source kind {cfg.kind!r}")
