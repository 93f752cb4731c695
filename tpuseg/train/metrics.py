"""Segmentation metrics: confusion matrix, per-class IoU, mIoU, pixel acc.

The reference never computes any metric beyond loss (SURVEY.md §5.5), but the
north-star target is mIoU parity on BDD100K val, so metrics are first-class
here. The confusion matrix is accumulated ON DEVICE as a [C, C] int32 matrix
(one scatter-add per batch) and reduced across the mesh with a psum inside the
jitted eval step — no per-step host syncs.
"""

from __future__ import annotations

import jax.numpy as jnp


def confusion_matrix(
    preds: jnp.ndarray, targets: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """[C, C] counts, rows = target class, cols = predicted class."""
    idx = targets.astype(jnp.int32).reshape(-1) * num_classes + preds.astype(
        jnp.int32
    ).reshape(-1)
    counts = jnp.bincount(idx, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def iou_from_confusion(cm: jnp.ndarray) -> jnp.ndarray:
    """Per-class IoU; classes absent from both pred and target get NaN."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    denom = tp + fp + fn
    return jnp.where(denom > 0, tp / jnp.maximum(denom, 1), jnp.nan)


def mean_iou(cm: jnp.ndarray) -> jnp.ndarray:
    """mIoU over classes present in the data (NaN classes excluded)."""
    iou = iou_from_confusion(cm)
    return jnp.nanmean(iou)


def pixel_accuracy_from_confusion(cm: jnp.ndarray) -> jnp.ndarray:
    cm = cm.astype(jnp.float32)
    return jnp.diag(cm).sum() / jnp.maximum(cm.sum(), 1)
