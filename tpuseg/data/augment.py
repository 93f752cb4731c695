"""On-device, batch-fused data augmentation.

The reference augments per-item on the CPU inside DataLoader workers with
albumentations (src/BDD100KDataset.py:39-46: HFlip p=.5, ShiftScaleRotate
(.05,.05,10deg) p=.5, RandomBrightnessContrast p=.5, ImageNet Normalize), and
ships a richer never-wired pipeline in src/augmentation.py:14-67 (HFlip p=.6,
heavy x-translations, rotate +-80deg, color jitter OneOf, perspective, blur).

TPU-first inversion: augmentation runs ON DEVICE over the whole batch in one
jitted program. All geometric ops (flip / shift / scale / rotate / heavy
translate / perspective) are composed into a single 3x3 homography per sample
and applied with ONE gather-based warp — instead of the reference's chain of
sequential cv2 warps. Color ops are fused elementwise epilogues. Per-sample
randomness comes from splitting one PRNG key over the batch (vmap), so runs
are reproducible and the host does zero augmentation work (it has 1 core —
see SURVEY.md hot-loop analysis, §3.1).

Distribution parity, not per-sample RNG equality, is the contract
(SURVEY.md "Hard parts"): parameter ranges match albumentations defaults.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from tpuseg.data.class_maps import IMAGENET_MEAN, IMAGENET_STD


# ---------------------------------------------------------------------------
# Homography builders. Matrices act on homogeneous pixel coords [x, y, 1]^T
# (x = column, y = row), forward direction (input -> output). The warp uses
# the inverse to map each output pixel back to input coords.


def _identity3() -> jnp.ndarray:
    return jnp.eye(3, dtype=jnp.float32)


def _translate(tx, ty) -> jnp.ndarray:
    m = jnp.eye(3, dtype=jnp.float32)
    return m.at[0, 2].set(tx).at[1, 2].set(ty)


def _hflip_matrix(width: int) -> jnp.ndarray:
    m = jnp.eye(3, dtype=jnp.float32)
    return m.at[0, 0].set(-1.0).at[0, 2].set(width - 1.0)


def _rot_scale_about_center(
    angle_rad, scale, width: int, height: int
) -> jnp.ndarray:
    """cv2.getRotationMatrix2D semantics: rotate+scale about image center."""
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    c = jnp.cos(angle_rad) * scale
    s = jnp.sin(angle_rad) * scale
    rot = jnp.array(
        [[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )
    return _translate(cx, cy) @ rot @ _translate(-cx, -cy)


def _maybe(matrix: jnp.ndarray, apply: jnp.ndarray) -> jnp.ndarray:
    """Select matrix or identity by a traced boolean (p-gate)."""
    return jnp.where(apply, matrix, _identity3())


def _perspective_matrix(key, scale, width: int, height: int) -> jnp.ndarray:
    """Random 4-corner jitter homography (A.Perspective semantics).

    Each corner of the image moves by N(0, scale) * side_length; the
    homography mapping original corners -> jittered corners is solved as an
    8x8 linear system (standard DLT for 4 point pairs).
    """
    w, h = float(width), float(height)
    src = jnp.array(
        [[0.0, 0.0], [w - 1, 0.0], [w - 1, h - 1], [0.0, h - 1]],
        dtype=jnp.float32,
    )
    jitter = (
        jax.random.normal(key, (4, 2), dtype=jnp.float32)
        * scale
        * jnp.array([[w, h]], dtype=jnp.float32)
    )
    dst = src + jitter
    # Solve for H with H[2,2] = 1: for each pair (x,y)->(u,v):
    #   [x y 1 0 0 0 -ux -uy] h = u ;  [0 0 0 x y 1 -vx -vy] h = v
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zeros = jnp.zeros(4, dtype=jnp.float32)
    ones = jnp.ones(4, dtype=jnp.float32)
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)
    b = jnp.concatenate([u, v], axis=0)
    hvec = jnp.linalg.solve(A, b)
    return jnp.concatenate([hvec, jnp.ones(1, dtype=jnp.float32)]).reshape(3, 3)


# ---------------------------------------------------------------------------
# Warping


def _reflect101(coord: jnp.ndarray, n: int) -> jnp.ndarray:
    """Fold continuous coords into [0, n-1] with BORDER_REFLECT_101 semantics
    (the albumentations/cv2 default border mode: edge pixel not repeated)."""
    if n == 1:
        return jnp.zeros_like(coord)
    period = 2.0 * (n - 1)
    c = jnp.abs(coord) % period
    return jnp.minimum(c, period - c)


def _warp_coords(
    inv: jnp.ndarray, height: int, width: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map the output pixel grid through inverse homography -> input coords."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=0).reshape(3, -1)  # [3, H*W]
    mapped = inv @ pts
    denom = jnp.where(jnp.abs(mapped[2]) < 1e-8, 1e-8, mapped[2])
    src_x = (mapped[0] / denom).reshape(height, width)
    src_y = (mapped[1] / denom).reshape(height, width)
    return src_y, src_x


def _sample_bilinear(img: jnp.ndarray, src_y, src_x) -> jnp.ndarray:
    """Bilinear gather of img [H,W,C] at continuous coords, reflect-101."""
    h, w = img.shape[0], img.shape[1]
    sy = _reflect101(src_y, h)
    sx = _reflect101(src_x, w)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    fy = fy[..., None]
    fx = fx[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _sample_nearest(mask: jnp.ndarray, src_y, src_x) -> jnp.ndarray:
    """Nearest gather of an integer class map [H,W], reflect-101."""
    h, w = mask.shape[0], mask.shape[1]
    sy = _reflect101(src_y, h)
    sx = _reflect101(src_x, w)
    yi = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
    return mask[yi, xi]


# ---------------------------------------------------------------------------
# Color ops (operate on float images in [0, 255])


def _brightness_contrast(img, key, limit: float = 0.2):
    """A.RandomBrightnessContrast defaults (brightness_by_max=True)."""
    kb, kc = jax.random.split(key)
    alpha = 1.0 + jax.random.uniform(kc, (), minval=-limit, maxval=limit)
    beta = jax.random.uniform(kb, (), minval=-limit, maxval=limit)
    return jnp.clip(img * alpha + beta * 255.0, 0.0, 255.0)


def _grayscale(img):
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]


def _hue_rotate(img, angle_rad):
    """Hue rotation in YIQ space (cheap device-side hue shift)."""
    rgb2yiq = jnp.array(
        [
            [0.299, 0.587, 0.114],
            [0.5959, -0.2746, -0.3213],
            [0.2115, -0.5227, 0.3112],
        ],
        dtype=jnp.float32,
    )
    yiq2rgb = jnp.linalg.inv(rgb2yiq)
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    rot = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]], dtype=jnp.float32
    )
    m = yiq2rgb @ rot @ rgb2yiq
    return jnp.clip(img @ m.T, 0.0, 255.0)


def _color_jitter(img, key):
    """A.ColorJitter(brightness=.2, contrast=.2, saturation=.3, hue=.1)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = jax.random.uniform(kb, (), minval=0.8, maxval=1.2)
    c = jax.random.uniform(kc, (), minval=0.8, maxval=1.2)
    s = jax.random.uniform(ks, (), minval=0.7, maxval=1.3)
    h = jax.random.uniform(kh, (), minval=-0.1, maxval=0.1) * 2.0 * jnp.pi
    img = img * b
    mean = jnp.mean(_grayscale(img))
    img = (img - mean) * c + mean
    gray = _grayscale(img)
    img = gray + (img - gray) * s
    img = _hue_rotate(jnp.clip(img, 0.0, 255.0), h)
    return jnp.clip(img, 0.0, 255.0)


def _hsv_shift(img, key):
    """A.HueSaturationValue(10, 20, 15) approximation in YIQ/gray space."""
    kh, ks, kv = jax.random.split(key, 3)
    hue = jax.random.uniform(kh, (), minval=-10.0, maxval=10.0) / 180.0 * jnp.pi
    sat = jax.random.uniform(ks, (), minval=-20.0, maxval=20.0) / 255.0
    val = jax.random.uniform(kv, (), minval=-15.0, maxval=15.0)
    img = _hue_rotate(img, hue)
    gray = _grayscale(img)
    img = gray + (img - gray) * (1.0 + sat)
    return jnp.clip(img + val, 0.0, 255.0)


def _rgb_shift(img, key, limit: float = 15.0):
    shifts = jax.random.uniform(key, (1, 1, 3), minval=-limit, maxval=limit)
    return jnp.clip(img + shifts, 0.0, 255.0)


def _blur3(img, key):
    """OneOf(MotionBlur(3), GaussianBlur(3)): 3-tap separable smoothing."""
    kind = jax.random.randint(key, (), 0, 3)
    g = jnp.array([0.25, 0.5, 0.25], dtype=jnp.float32)
    m = jnp.array([1 / 3, 1 / 3, 1 / 3], dtype=jnp.float32)

    def conv1d(x, k, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 1)
        xp = jnp.pad(x, pad, mode="edge")
        return (
            jax.lax.slice_in_dim(xp, 0, x.shape[axis], axis=axis) * k[0]
            + jax.lax.slice_in_dim(xp, 1, x.shape[axis] + 1, axis=axis) * k[1]
            + jax.lax.slice_in_dim(xp, 2, x.shape[axis] + 2, axis=axis) * k[2]
        )

    gauss = conv1d(conv1d(img, g, 0), g, 1)
    motion_h = conv1d(img, m, 1)
    motion_v = conv1d(img, m, 0)
    return jax.lax.switch(kind, [lambda: gauss, lambda: motion_h, lambda: motion_v])


# ---------------------------------------------------------------------------
# Per-sample pipelines


def _standard_sample(img_u8, mask_u8, key, height: int, width: int):
    """Reference per-dataset train pipeline (src/BDD100KDataset.py:39-46):
    HFlip(.5) -> ShiftScaleRotate(.05,.05,10)(.5) -> BrightnessContrast(.5)."""
    keys = jax.random.split(key, 7)
    img = img_u8.astype(jnp.float32)

    flip = jax.random.bernoulli(keys[0], 0.5)
    m = _maybe(_hflip_matrix(width), flip)

    do_ssr = jax.random.bernoulli(keys[1], 0.5)
    shift = jax.random.uniform(keys[2], (2,), minval=-0.05, maxval=0.05)
    scale = 1.0 + jax.random.uniform(keys[3], (), minval=-0.05, maxval=0.05)
    angle = jnp.deg2rad(jax.random.uniform(keys[4], (), minval=-10.0, maxval=10.0))
    ssr = _translate(shift[0] * width, shift[1] * height) @ _rot_scale_about_center(
        angle, scale, width, height
    )
    m = _maybe(ssr, do_ssr) @ m

    inv = jnp.linalg.inv(m)
    sy, sx = _warp_coords(inv, height, width)
    img = _sample_bilinear(img, sy, sx)
    mask = _sample_nearest(mask_u8, sy, sx)

    do_bc = jax.random.bernoulli(keys[5], 0.5)
    img = jnp.where(do_bc, _brightness_contrast(img, keys[6]), img)
    return img, mask


def _heavy_matrix(keys, height: int, width: int) -> jnp.ndarray:
    """The geometric half of the heavy pipeline as one composed homography:
    HFlip(.6) -> OneOf heavy x-translate(.8) -> Affine(+-80deg)(.5) ->
    Perspective(.5). Shared by the segmentation and detection (bbox) paths."""
    m = _maybe(_hflip_matrix(width), jax.random.bernoulli(keys[0], 0.6))

    # OneOf heavy horizontal translation, p=.8
    do_shift = jax.random.bernoulli(keys[1], 0.8)
    branch = jax.random.randint(keys[2], (), 0, 3)
    tx_left = jax.random.uniform(keys[3], (), minval=-0.35, maxval=-0.15)
    tx_right = jax.random.uniform(keys[3], (), minval=0.15, maxval=0.35)
    tx_mid = jax.random.uniform(keys[3], (), minval=-0.1, maxval=0.1)
    sc_mid = jax.random.uniform(keys[4], (), minval=0.9, maxval=1.1)
    rot_mid = jnp.deg2rad(jax.random.uniform(keys[5], (), minval=-5.0, maxval=5.0))
    tx = jax.lax.switch(
        branch, [lambda: tx_left, lambda: tx_right, lambda: tx_mid]
    )
    sc = jnp.where(branch == 2, sc_mid, 1.0)
    rot = jnp.where(branch == 2, rot_mid, 0.0)
    heavy = _translate(tx * width, 0.0) @ _rot_scale_about_center(
        rot, sc, width, height
    )
    m = _maybe(heavy, do_shift) @ m

    # Affine(scale .95-1.05, translate 5%, rotate +-80), p=.5
    do_aff = jax.random.bernoulli(keys[6], 0.5)
    a_sc = jax.random.uniform(keys[7], (), minval=0.95, maxval=1.05)
    a_tr = jax.random.uniform(keys[8], (2,), minval=-0.05, maxval=0.05)
    a_rot = jnp.deg2rad(jax.random.uniform(keys[9], (), minval=-80.0, maxval=80.0))
    aff = _translate(a_tr[0] * width, a_tr[1] * height) @ _rot_scale_about_center(
        a_rot, a_sc, width, height
    )
    m = _maybe(aff, do_aff) @ m

    # Perspective(scale .05-.15), p=.5
    do_persp = jax.random.bernoulli(keys[10], 0.5)
    p_scale = jax.random.uniform(keys[11], (), minval=0.05, maxval=0.15)
    persp = _perspective_matrix(keys[12], p_scale, width, height)
    m = _maybe(persp, do_persp) @ m
    return m


def _heavy_sample(img_u8, mask_u8, key, height: int, width: int):
    """The reference's full (never-wired) pipeline, src/augmentation.py:14-67,
    wired in for real: geometry (_heavy_matrix) + OneOf color(.5) + blur(.3)."""
    keys = jax.random.split(key, 17)
    img = img_u8.astype(jnp.float32)
    m = _heavy_matrix(keys, height, width)

    inv = jnp.linalg.inv(m)
    sy, sx = _warp_coords(inv, height, width)
    img = _sample_bilinear(img, sy, sx)
    mask = _sample_nearest(mask_u8, sy, sx)

    # OneOf color, p=.5
    do_color = jax.random.bernoulli(keys[13], 0.5)
    which = jax.random.randint(keys[14], (), 0, 3)
    colored = jax.lax.switch(
        which,
        [
            lambda: _color_jitter(img, keys[15]),
            lambda: _hsv_shift(img, keys[15]),
            lambda: _rgb_shift(img, keys[15]),
        ],
    )
    img = jnp.where(do_color, colored, img)

    # blur OneOf, p=.3 — its OWN key: split(keys[15]) would alias the
    # color ops' internal split-prefix (split(k, 2) == split(k, 4)[:2]),
    # correlating the blur decision with the brightness/hue draws
    kb1, kb2 = jax.random.split(keys[16])
    do_blur = jax.random.bernoulli(kb1, 0.3)
    img = jnp.where(do_blur, _blur3(img, kb2), img)
    return img, mask


def _detection_sample(img_u8, boxes, valid, key, height: int, width: int,
                      min_visibility: float = 0.3):
    """Detection-track augmentation: same heavy geometry, boxes transformed
    through the homography. Counterpart of the reference's (never-imported)
    ObjectDetectionAugmentation with BboxParams(format='yolo',
    min_visibility=0.3), src/augmentation.py:96-130.

    boxes: [N, 4] YOLO-normalized (cx, cy, w, h); valid: [N] bool.
    Returns (image f32 [H,W,3] in 0..255, boxes [N,4], valid [N]).
    """
    keys = jax.random.split(key, 16)
    img = img_u8.astype(jnp.float32)
    m = _heavy_matrix(keys, height, width)
    inv = jnp.linalg.inv(m)
    sy, sx = _warp_coords(inv, height, width)
    img = _sample_bilinear(img, sy, sx)

    # transform the 4 corners of every box through the FORWARD homography
    cx = boxes[:, 0] * width
    cy = boxes[:, 1] * height
    bw = boxes[:, 2] * width
    bh = boxes[:, 3] * height
    x0, x1 = cx - bw / 2, cx + bw / 2
    y0, y1 = cy - bh / 2, cy + bh / 2
    corners_x = jnp.stack([x0, x1, x0, x1], axis=1)  # [N, 4]
    corners_y = jnp.stack([y0, y0, y1, y1], axis=1)
    ones = jnp.ones_like(corners_x)
    pts = jnp.stack([corners_x, corners_y, ones], axis=1)  # [N, 3, 4]
    mapped = jnp.einsum("ij,njk->nik", m, pts)
    denom = jnp.where(jnp.abs(mapped[:, 2]) < 1e-8, 1e-8, mapped[:, 2])
    mx = mapped[:, 0] / denom
    my = mapped[:, 1] / denom
    nx0, nx1 = mx.min(axis=1), mx.max(axis=1)
    ny0, ny1 = my.min(axis=1), my.max(axis=1)
    # visibility = clipped area / transformed area (albumentations semantics)
    cx0, cx1 = jnp.clip(nx0, 0, width), jnp.clip(nx1, 0, width)
    cy0, cy1 = jnp.clip(ny0, 0, height), jnp.clip(ny1, 0, height)
    area = jnp.maximum(nx1 - nx0, 1e-6) * jnp.maximum(ny1 - ny0, 1e-6)
    clipped = jnp.maximum(cx1 - cx0, 0.0) * jnp.maximum(cy1 - cy0, 0.0)
    visible = clipped / area >= min_visibility
    new_valid = valid & visible & (clipped > 0)
    new_boxes = jnp.stack(
        [
            (cx0 + cx1) / 2 / width,
            (cy0 + cy1) / 2 / height,
            (cx1 - cx0) / width,
            (cy1 - cy0) / height,
        ],
        axis=1,
    )
    new_boxes = jnp.where(new_valid[:, None], new_boxes, 0.0)
    return img, new_boxes, new_valid


def make_detection_augment_fn(height: int, width: int,
                              min_visibility: float = 0.3):
    """Jitted batch detection augment: (u8 imgs [B,H,W,3], boxes [B,N,4] yolo,
    valid [B,N] bool, key) -> (normalized f32 imgs, boxes, valid)."""

    @jax.jit
    def fn(images, boxes, valid, key):
        n = images.shape[0]
        keys = jax.random.split(key, n)
        per = functools.partial(
            _detection_sample, height=height, width=width,
            min_visibility=min_visibility,
        )
        imgs, bxs, vld = jax.vmap(per)(images, boxes, valid, keys)
        return normalize_images(imgs), bxs, vld

    return fn


def normalize_images(
    img: jnp.ndarray,
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
) -> jnp.ndarray:
    """uint8/float [.., H, W, 3] in [0,255] -> mean/std-normalized float32.

    Parity with A.Normalize(mean, std) (src/BDD100KDataset.py:44 et al.);
    mean/std default to ImageNet and are routed from
    DataConfig.normalize_mean/std.
    """
    img = img.astype(jnp.float32) / 255.0
    shape = (1,) * (img.ndim - 1) + (3,)
    mean = jnp.asarray(mean, jnp.float32).reshape(shape)
    std = jnp.asarray(std, jnp.float32).reshape(shape)
    return (img - mean) / std


def make_augment_fn(
    height: int, width: int, heavy: bool = False, augment: bool = True,
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
) -> Callable[[jnp.ndarray, jnp.ndarray, jax.Array], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Build the jitted batch augment: (u8 imgs, u8 masks, key) -> (f32, i32).

    One compiled program: per-sample homography composition + one warp +
    color epilogue + normalize, vmapped over the batch. ``augment=False``
    is the reference's ``is_train=False`` switch
    (src/CombinedDataset.py:123-143): normalize-only, no geometry/color.
    """
    sample_fn = _heavy_sample if heavy else _standard_sample

    @jax.jit
    def augment_batch_fn(images, masks, key):
        n = images.shape[0]
        keys = jax.random.split(key, n)
        per = functools.partial(sample_fn, height=height, width=width)
        imgs, msks = jax.vmap(per)(images, masks, keys)
        return normalize_images(imgs, mean, std), msks.astype(jnp.int32)

    @jax.jit
    def normalize_only_fn(images, masks, key):
        del key
        return normalize_images(images, mean, std), masks.astype(jnp.int32)

    return augment_batch_fn if augment else normalize_only_fn


def augment_batch(images, masks, key, heavy: bool = False):
    """Convenience one-shot wrapper (re-jits per shape; prefer make_augment_fn)."""
    h, w = images.shape[1], images.shape[2]
    return make_augment_fn(h, w, heavy)(images, masks, key)
