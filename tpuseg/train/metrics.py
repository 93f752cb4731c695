"""Segmentation metrics: confusion matrix, per-class IoU, mIoU, pixel acc.

The reference never computes any metric beyond loss (SURVEY.md §5.5), but the
north-star target is mIoU parity on BDD100K val, so metrics are first-class
here. The confusion matrix is accumulated ON DEVICE as a [C, C] int32 matrix
per batch and reduced across the mesh with a psum inside the jitted eval
step — no per-step host syncs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Largest per-chunk pixel count whose per-cell counts stay exact under fp32
# accumulation (2**24). Module-level so tests can shrink it to exercise the
# chunked path without 16M-element inputs.
_MAX_EXACT_FP32 = 1 << 24


def confusion_matrix(
    preds: jnp.ndarray, targets: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """[C, C] counts, rows = target class, cols = predicted class.

    Runs on device inside the jitted eval step. Computed as the one-hot
    contraction ``one_hot(targets).T @ one_hot(preds)`` — an MXU matmul —
    rather than ``bincount``, whose scatter-add over B*H*W elements is the
    slow op class on this backend (the same class behind the round-1
    inference regression and the CE-gather train regression; docs/DESIGN.md
    §9/§13b). fp32 accumulation counts exactly up to 2**24 per cell; above
    that the pixel count is chunked so each partial matmul stays exact and
    the chunks are summed in int32.
    """
    t = targets.astype(jnp.int32).reshape(-1)
    p = preds.astype(jnp.int32).reshape(-1)
    n = t.shape[0]
    max_exact = _MAX_EXACT_FP32

    def cm_of(tc, pc):
        # bf16 one-hots are exact (0/1); accumulation is forced to fp32
        oh_t = jax.nn.one_hot(tc, num_classes, dtype=jnp.bfloat16)
        oh_p = jax.nn.one_hot(pc, num_classes, dtype=jnp.bfloat16)
        return jnp.einsum(
            "nt,np->tp", oh_t, oh_p, preferred_element_type=jnp.float32
        ).astype(jnp.int32)

    if n <= max_exact:
        return cm_of(t, p)
    n_chunks = -(-n // max_exact)
    pad = n_chunks * max_exact - n
    # padding uses class index `num_classes`: one_hot of an out-of-range
    # index is all-zero, so padded elements contribute nothing.
    t = jnp.pad(t, (0, pad), constant_values=num_classes)
    p = jnp.pad(p, (0, pad), constant_values=num_classes)
    cms = jax.vmap(cm_of)(
        t.reshape(n_chunks, max_exact), p.reshape(n_chunks, max_exact)
    )
    return jnp.sum(cms, axis=0)


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


@jax.jit
def tree_sum(outs):
    """Reduce a list of same-structure metric pytrees in ONE dispatch.

    Replaces per-batch eager device adds in eval loops (each eager op costs
    a remote-tunnel round trip — DESIGN §22). jit caches per pytree
    structure (= per batch count), so each eval pass after the first reuses
    the compiled reduction."""
    return jax.tree.map(lambda *xs: sum(xs[1:], start=xs[0]), *outs)
