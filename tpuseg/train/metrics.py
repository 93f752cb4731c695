"""Segmentation metrics: confusion matrix, per-class IoU, mIoU, pixel acc.

The reference never computes any metric beyond loss (SURVEY.md §5.5), but the
north-star target is mIoU parity on BDD100K val, so metrics are first-class
here. The confusion matrix is accumulated ON DEVICE as a [C, C] int32 matrix
(one scatter-add per batch) and reduced across the mesh with a psum inside the
jitted eval step — no per-step host syncs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    preds: jnp.ndarray, targets: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """[C, C] counts, rows = target class, cols = predicted class.

    Runs on device inside the jitted eval step.
    """
    idx = targets.astype(jnp.int32).reshape(-1) * num_classes + preds.astype(
        jnp.int32
    ).reshape(-1)
    counts = jnp.bincount(idx, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


# The derived metrics below run on HOST (numpy): the confusion matrix is a
# tiny [C, C] array by the time it leaves the device, and the per-class IoU
# deliberately uses NaN for classes absent from both pred and target — which
# must not trip the jax_debug_nans sanitizer used in tests (SURVEY.md §5.2).


def iou_from_confusion(cm) -> np.ndarray:
    """Per-class IoU; classes absent from both pred and target get NaN."""
    cm = np.asarray(cm, dtype=np.float64)
    tp = np.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    denom = tp + fp + fn
    return np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)


def mean_iou(cm) -> float:
    """mIoU over classes present in the data (NaN classes excluded)."""
    iou = iou_from_confusion(cm)
    if np.isnan(iou).all():
        return float("nan")
    return float(np.nanmean(iou))


def pixel_accuracy_from_confusion(cm) -> float:
    cm = np.asarray(cm, dtype=np.float64)
    return float(np.diag(cm).sum() / max(cm.sum(), 1))
