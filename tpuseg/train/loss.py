"""Loss functions.

The reference trains with ``nn.CrossEntropyLoss()`` (main.py:99) on logits
[B, 10, H, W] vs int targets [B, H, W] — i.e. mean over every pixel of
-log_softmax(logits)[target], no ignore_index, no class weights. That exact
semantics (in NHWC) is the default; the extended options — per-class weights,
label smoothing, ignore_index, focal, dice — are production knobs for the
heavy class imbalance of road scenes (background/road dominate; lights,
signs, riders are rare). Weighted CE / smoothing / ignore follow torch's
``F.cross_entropy`` semantics bit-for-bit (tests/test_loss.py proves it):

  per-pixel  = (1-s) * nll * w[t]  +  s * (-(logp . w).sum / C)
  reduction  = sum(per-pixel over valid) / sum(w[t] over valid)

All losses are pure one-hot contractions + reductions — no gathers (the
slow op class on this backend; see the round-1 inference postmortem,
docs/DESIGN.md) — so XLA fuses each into a single pass over the logits.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _prep(logits: jnp.ndarray, targets: jnp.ndarray):
    """Promote to >=f32, return (logp [B,H,W,C], onehot [B,H,W,C], dtype)."""
    dtype = jnp.promote_types(logits.dtype, jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(dtype), axis=-1)
    # one-hot contraction, NOT take_along_axis: gathers (and their scatter
    # transpose in backward) are the slow path on this backend — the same
    # op class behind the round-1 inference regression. XLA fuses the
    # compare+select+reduce into one pass over logp. Out-of-range targets
    # (ignore_index sentinels like 255) one-hot to an all-zero row.
    onehot = jax.nn.one_hot(
        targets.astype(jnp.int32), logits.shape[-1], dtype=dtype
    )
    return logp, onehot, dtype


def cross_entropy_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """Mean per-pixel softmax cross-entropy, torch ``F.cross_entropy`` parity.

    Args:
      logits: [B, H, W, C] float logits (bf16 promoted to f32; f64 stays f64).
      targets: [B, H, W] int class indices.
      class_weights: optional [C] per-class weights (torch ``weight=``:
        the mean divides by the summed weights of the target pixels).
      label_smoothing: torch ``label_smoothing=`` (>=1.10 semantics).
      ignore_index: optional target value excluded from loss and denominator.
    Returns a scalar loss (parity with torch 'mean' reduction).
    """
    logp, onehot, dtype = _prep(logits, targets)
    nll = -jnp.sum(logp * onehot, axis=-1)  # [B,H,W]
    if class_weights is not None:
        # explicit broadcast: rank promotion raises under the test sanitizer
        w = jnp.asarray(class_weights, dtype).reshape(
            (1,) * (onehot.ndim - 1) + (-1,)
        )
        px_w = jnp.sum(onehot * w, axis=-1)  # w[target]
    else:
        w = None
        px_w = jnp.ones_like(nll)
    s = float(label_smoothing)
    if s:
        c = logits.shape[-1]
        # torch weights the smoothing term per CLASS (w_c inside the sum),
        # not by w[target] — verified numerically vs F.cross_entropy.
        smooth = (
            -jnp.sum(logp * w, axis=-1) / c if w is not None
            else -jnp.mean(logp, axis=-1)
        )
        per_px = (1.0 - s) * nll * px_w + s * smooth
    else:
        per_px = nll * px_w
    if ignore_index is not None:
        valid = (targets != ignore_index).astype(dtype)
        per_px = per_px * valid
        px_w = px_w * valid
    return jnp.sum(per_px) / jnp.sum(px_w)


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-class focal loss (Lin et al. 2017): ``-(1-p_t)^g * log p_t``.

    Down-weights easy pixels so rare classes (traffic lights, riders) drive
    the gradient. ``gamma=0`` reduces exactly to :func:`cross_entropy_loss`
    (without smoothing). ``class_weights`` is the alpha term, applied like
    torch's CE weight (denominator = sum of target-pixel weights).
    """
    logp, onehot, dtype = _prep(logits, targets)
    logp_t = jnp.sum(logp * onehot, axis=-1)  # [B,H,W] = log p_target
    focal = (1.0 - jnp.exp(logp_t)) ** float(gamma) if gamma else 1.0
    if class_weights is not None:
        w = jnp.asarray(class_weights, dtype).reshape(
            (1,) * (onehot.ndim - 1) + (-1,)
        )
        px_w = jnp.sum(onehot * w, axis=-1)
    else:
        px_w = jnp.ones_like(logp_t)
    per_px = -focal * logp_t * px_w
    if ignore_index is not None:
        valid = (targets != ignore_index).astype(dtype)
        per_px = per_px * valid
        px_w = px_w * valid
    return jnp.sum(per_px) / jnp.sum(px_w)


def dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smooth: float = 1.0,
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """Soft (macro) Dice loss: ``1 - mean_c 2|p∩t|/(|p|+|t|)``.

    Softmax probabilities against one-hot targets, Dice per class over the
    whole batch, averaged over classes — the standard segmentation overlap
    loss, directly optimizing the IoU-family metric the eval loop reports
    (tpuseg/train/metrics.py). ``smooth`` keeps absent classes at Dice=1
    (zero loss contribution) instead of 0/0.
    """
    logp, onehot, dtype = _prep(logits, targets)
    probs = jnp.exp(logp)
    if ignore_index is not None:
        valid = (targets != ignore_index).astype(dtype)[..., None]
        probs = probs * valid
        onehot = onehot * valid
    inter = jnp.sum(probs * onehot, axis=(0, 1, 2))  # [C]
    denom = jnp.sum(probs, axis=(0, 1, 2)) + jnp.sum(onehot, axis=(0, 1, 2))
    dice = (2.0 * inter + smooth) / (denom + smooth)
    return 1.0 - jnp.mean(dice)


def lovasz_softmax_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """Lovász-softmax loss (Berman et al., CVPR 2018), classes="present".

    The other differentiable IoU surrogate besides :func:`dice_loss`: for
    each class, pixel errors ``|1{y=c} - p_c|`` are sorted descending and
    dotted with the gradient of the Lovász extension of the Jaccard loss,
    yielding a piecewise-linear tight surrogate of ``1 - IoU_c``. Averaged
    over classes present in the batch (absent classes contribute nothing —
    matching the eval metric's absent-class exclusion in
    tpuseg/train/metrics.py). Flattens the whole batch per class (the
    batch-level convention, like :func:`dice_loss`).

    TPU shape: one ``lax.sort_key_val`` over [C, B*H*W] — static shapes,
    no data-dependent control flow; the sort is the only non-elementwise
    op and XLA batches it over the class dimension. ``ignore_index``
    pixels get error 0 / label 0: they sort to the tail, where every
    contribution is multiplied by a zero error, and they never enter any
    prefix cumsum ahead of a positive error — exactly equivalent to
    removing them (tests/test_loss.py pins this against a literal
    transcription of the published algorithm).
    """
    logp, onehot, dtype = _prep(logits, targets)
    probs = jnp.exp(logp)
    c = logits.shape[-1]
    fg = jnp.reshape(onehot, (-1, c)).T          # [C, P]
    pr = jnp.reshape(probs, (-1, c)).T           # [C, P]
    errors = jnp.abs(fg - pr)
    if ignore_index is not None:
        valid = (targets != ignore_index).astype(dtype).reshape(1, -1)
        fg = fg * valid
        errors = errors * valid
    # descending sort of errors, carrying the labels: negate the keys.
    neg_sorted, fg_sorted = jax.lax.sort_key_val(
        -errors, fg, dimension=-1
    )
    errors_sorted = -neg_sorted
    gts = jnp.sum(fg_sorted, axis=-1, keepdims=True)        # [C, 1]
    intersection = gts - jnp.cumsum(fg_sorted, axis=-1)     # [C, P]
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=-1)
    jaccard = 1.0 - intersection / union
    grad = jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=-1
    )
    per_class = jnp.sum(errors_sorted * grad, axis=-1)      # [C]
    present = (gts[:, 0] > 0).astype(dtype)
    return jnp.sum(per_class * present) / jnp.maximum(
        jnp.sum(present), 1.0
    )


def make_loss_fn(
    name: str = "ce",
    class_weights: Optional[Sequence[float]] = None,
    label_smoothing: float = 0.0,
    focal_gamma: float = 2.0,
    dice_weight: float = 0.5,
    ignore_index: Optional[int] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Config-driven loss factory: (logits [B,H,W,C], targets [B,H,W]) -> scalar.

    ``name``: "ce" | "focal" | "dice" | "ce+dice" | "lovasz" | "ce+lovasz"
    (the combos are ``(1-dice_weight)*CE + dice_weight*<surrogate>``, the
    common segmentation mixes; ``dice_weight`` weights either surrogate).
    ``class_weights`` is baked in as a compile-time constant (a [C] vector —
    no retrace cost, no extra step argument).
    """
    w = None if class_weights is None else jnp.asarray(
        class_weights, jnp.float32
    )
    name = (name or "ce").lower()
    # The pure IoU surrogates have no per-pixel NLL term, so there is
    # nothing for class_weights/label_smoothing to act on; focal has no
    # smoothing term. Silently dropping them would hand a user the exact
    # imbalance remedy they asked for (weights: +8.2 mIoU pts in their
    # regime, docs/DESIGN.md §38) without applying it — refuse instead.
    # The ce+ mixes DO honor both (in the CE term).
    if name in ("dice", "lovasz"):
        if w is not None:
            raise ValueError(
                f"loss {name!r} has no cross-entropy term and cannot honor "
                "class_weights; use 'ce+" + name + "' (weights apply to the "
                "CE term) or drop --train.class_weights"
            )
        if label_smoothing:
            raise ValueError(
                f"loss {name!r} cannot honor label_smoothing; use "
                "'ce+" + name + "' or drop --train.label_smoothing"
            )
    if name == "focal" and label_smoothing:
        raise ValueError(
            "loss 'focal' has no label-smoothing term; drop "
            "--train.label_smoothing (focal's alpha term is class_weights)"
        )
    if name == "ce":
        def fn(logits, targets):
            return cross_entropy_loss(
                logits, targets, class_weights=w,
                label_smoothing=label_smoothing, ignore_index=ignore_index,
            )
    elif name == "focal":
        def fn(logits, targets):
            return focal_loss(
                logits, targets, gamma=focal_gamma, class_weights=w,
                ignore_index=ignore_index,
            )
    elif name == "dice":
        def fn(logits, targets):
            return dice_loss(logits, targets, ignore_index=ignore_index)
    elif name in ("ce+dice", "dice+ce"):
        dw = float(dice_weight)
        def fn(logits, targets):
            ce = cross_entropy_loss(
                logits, targets, class_weights=w,
                label_smoothing=label_smoothing, ignore_index=ignore_index,
            )
            dc = dice_loss(logits, targets, ignore_index=ignore_index)
            return (1.0 - dw) * ce + dw * dc
    elif name == "lovasz":
        def fn(logits, targets):
            return lovasz_softmax_loss(
                logits, targets, ignore_index=ignore_index
            )
    elif name in ("ce+lovasz", "lovasz+ce"):
        dw = float(dice_weight)
        def fn(logits, targets):
            ce = cross_entropy_loss(
                logits, targets, class_weights=w,
                label_smoothing=label_smoothing, ignore_index=ignore_index,
            )
            lv = lovasz_softmax_loss(
                logits, targets, ignore_index=ignore_index
            )
            return (1.0 - dw) * ce + dw * lv
    else:
        raise ValueError(
            f"unknown loss {name!r}: expected "
            "ce|focal|dice|ce+dice|lovasz|ce+lovasz"
        )
    return fn
