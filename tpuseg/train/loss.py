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


def _lovasz_pallas_enabled() -> bool:
    """Pallas lovasz path: TPU backend only, `TPUSEG_LOVASZ_PALLAS=0`
    opts out (the A/B lever for tools/train_bench.py)."""
    import os

    if os.environ.get("TPUSEG_LOVASZ_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend init failure: fall back to the XLA path
        return False


def _binned_lovasz(
    errors: jnp.ndarray, fg: jnp.ndarray, bins: int, dtype,
    psum_axes: tuple = (),
) -> jnp.ndarray:
    """Sort-free Lovász via error-level-set histograms — the TPU path.

    The exact algorithm needs each pixel's *rank* among descending errors
    and the cumulative foreground mass above it; an XLA:TPU sort over
    [C, B*H*W] costs ~26x the whole train step (measured, DESIGN §45).
    But errors live in [0, 1], so quantize the *ranking* (not the errors)
    into ``bins`` level sets: for each threshold t_j = j/bins compute

        N(j) = #{e >= t_j}    F(j) = sum fg[e >= t_j]    S(j) = sum e[e >= t_j]

    — three fused compare+multiply+reduce passes, no sort, no gather. The
    Jaccard value after processing exactly the level set P_j is
    ``1 - (gts - F)/(gts + N - F)`` (identical to the exact prefix
    formula with k = N(j)), and the block of pixels falling between two
    thresholds contributes ``mean(e in block) * (jac(P_j) - jac(P_j+1))``
    — the within-block telescoping is exact because the Lovász dot
    product only weighs each error by its local jaccard delta. The
    approximation error is O(1/bins) in the error values, and the
    per-pixel gradient is the exact Lovász gradient averaged within the
    pixel's bin (indicators are piecewise-constant, so autodiff yields
    d loss/d e_i = delta_jac(bin_i)/n(bin_i) — the classic coefficient).

    Chunked over thresholds (K at a time) so the fused [C, P, K]
    broadcast never materializes and the [C, P] error plane streams from
    HBM bins/K times instead of bins times.
    """
    c, p = errors.shape
    nb = int(bins)
    # Layout is everything here (measured ladder in DESIGN §45): P must
    # stay the MINOR (lane) dimension — it is millions wide, so the
    # compare+reduce vectorizes across all 128 lanes and the reduction is
    # the fast minor-axis path. Thresholds go on the sublane axis in
    # chunks of K. The two wrong layouts both lose: K-minor starves the
    # lanes (16/128 used, 234 imgs/s), and K=128-minor makes XLA
    # materialize the [C, P, K] indicator (21.5 GB compile OOM).
    k = 16
    n_levels = nb + 1
    pad = (-n_levels) % k
    # thresholds t_0=0 .. t_nb=1; padded levels sit above 1.0 => empty sets
    t = jnp.arange(n_levels + pad, dtype=dtype) / nb
    t_chunks = t.reshape(-1, k)
    # ones/fg/errors share one fused reduce per chunk => errors read once
    vals = jnp.stack([jnp.ones_like(errors), fg, errors])    # [3, C, P]

    # jax.checkpoint: without it autodiff saves the fused [C, P, K]
    # indicator as a per-iteration scan residual — [chunks, 3, C, P, K]
    # f32 = 45.6 GB at batch 128 (measured compile OOM on v5e). Remat
    # recomputes the compare in the backward pass; the indicator has zero
    # gradient anyway (piecewise-constant), so only the cheap compare
    # itself is replayed.
    @jax.checkpoint
    def chunk(_, tk):
        ind = (errors[:, None, :] >= tk[None, :, None])       # [C, K, P]
        red = jnp.sum(
            vals[:, :, None, :] * ind.astype(dtype)[None], axis=-1
        )                                                     # [3, C, K]
        return None, red

    _, red = jax.lax.scan(chunk, None, t_chunks)              # [nc, 3, C, K]
    red = jnp.transpose(red, (1, 2, 0, 3)).reshape(3, c, -1)  # [3, C, L]
    if psum_axes:
        # sharded batch (shard_map region): level-set sums are additive
        # over pixels, so ONE psum of the tiny [3, C, L] stats globalizes
        # them; everything below is a pure function of the global sums and
        # computes identically (replicated) on every device.
        red = jax.lax.psum(red, psum_axes)
    n_lv = red[0][:, :n_levels]                               # [C, levels]
    f_lv = red[1][:, :n_levels]
    s_lv = red[2][:, :n_levels]
    gts = f_lv[:, :1]                                         # F(t=0) = all fg
    # jac(P_j); union >= gts >= 1 for present classes (absent masked below)
    jac = 1.0 - (gts - f_lv) / jnp.maximum(gts + n_lv - f_lv, 1.0)
    zero = jnp.zeros((c, 1), dtype)
    jac_next = jnp.concatenate([jac[:, 1:], zero], axis=1)    # jac(P_{j+1})
    n_next = jnp.concatenate([n_lv[:, 1:], zero], axis=1)
    s_next = jnp.concatenate([s_lv[:, 1:], zero], axis=1)
    n_blk = n_lv - n_next
    mean_e = (s_lv - s_next) / jnp.maximum(n_blk, 1.0)
    per_class = jnp.sum(mean_e * (jac - jac_next), axis=-1)   # [C]
    present = (gts[:, 0] > 0).astype(dtype)
    return jnp.sum(per_class * present) / jnp.maximum(
        jnp.sum(present), 1.0
    )


def lovasz_softmax_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: Optional[int] = None,
    bins: int = 0,
    psum_axes: tuple = (),
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
    if bins > 0:
        # Sort-free level-set path (the TPU default via train.lovasz_bins;
        # bins=0 keeps the exact sort as the parity oracle, measured 26x
        # the step time — DESIGN §45). On TPU at the default 256 bins the
        # Pallas histogram/lookup kernels take over (read-once tiles, MXU
        # one-hot contraction); the XLA scan below is the portable
        # fallback (CPU tests, non-default bins).
        if bins == 256 and _lovasz_pallas_enabled():
            from tpuseg.ops.lovasz_pallas import lovasz_binned_pallas

            return lovasz_binned_pallas(
                errors, fg, psum_axes=psum_axes
            ).astype(dtype)
        return _binned_lovasz(errors, fg, bins, dtype, psum_axes=psum_axes)
    if psum_axes:
        raise ValueError(
            "psum_axes (sharded lovasz) requires bins > 0 — the exact "
            "sort path is global by construction"
        )
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


def _maybe_sharded_lovasz(ignore_index, bins, mesh, spatial):
    """(logits, targets) -> lovasz scalar; shard_map'd when mesh.size > 1.

    The wrapped region computes per-device histograms over its local
    batch/height shard and psums the [C, bins] statistics (see
    lovasz_softmax_loss's psum_axes); the sort oracle (bins=0) cannot be
    sharded and falls back to GSPMD semantics.
    """
    if mesh is None or mesh.size <= 1 or bins <= 0:
        return lambda lg, tg: lovasz_softmax_loss(
            lg, tg, ignore_index=ignore_index, bins=bins
        )
    if bins == 256 and _lovasz_pallas_enabled():
        # TPU: the forward-only shard_map region (local Pallas kernels +
        # one [C, bins] psum + analytic logits-gradient) with the
        # custom_vjp OUTSIDE — autodiff cannot safely transpose a
        # shard_map holding a pallas_call (tests/test_loss.py pins the
        # 1/mesh.size cotangent bug that check_vma=False would hide).
        from tpuseg.ops.lovasz_pallas import make_sharded_lovasz

        return make_sharded_lovasz(
            mesh, spatial=spatial, ignore_index=ignore_index
        )
    from jax.sharding import PartitionSpec as P

    axes = ("data",) + (("spatial",) if spatial else ())
    spec_x = P("data", "spatial" if spatial else None, None, None)
    spec_y = P("data", "spatial" if spatial else None, None)

    def local(lg, tg):
        return lovasz_softmax_loss(
            lg, tg, ignore_index=ignore_index, bins=bins, psum_axes=axes
        )

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(spec_x, spec_y), out_specs=P()
    )

    def fn(lg, tg):
        return sharded(lg, tg)

    return fn


def make_loss_fn(
    name: str = "ce",
    class_weights: Optional[Sequence[float]] = None,
    label_smoothing: float = 0.0,
    focal_gamma: float = 2.0,
    dice_weight: float = 0.5,
    ignore_index: Optional[int] = None,
    lovasz_bins: int = 256,
    mesh=None,
    spatial: bool = False,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Config-driven loss factory: (logits [B,H,W,C], targets [B,H,W]) -> scalar.

    ``name``: "ce" | "focal" | "dice" | "ce+dice" | "lovasz" | "ce+lovasz"
    (the combos are ``(1-dice_weight)*CE + dice_weight*<surrogate>``, the
    common segmentation mixes; ``dice_weight`` weights either surrogate).
    ``class_weights`` is baked in as a compile-time constant (a [C] vector —
    no retrace cost, no extra step argument). ``lovasz_bins``: level-set
    resolution of the sort-free Lovász path (the TPU default; 0 = the
    exact-sort oracle, 26x the step time at equal quality — DESIGN §45).

    ``mesh``/``spatial``: when training over a multi-device mesh, the
    lovasz term runs inside a shard_map region — each device bins its
    LOCAL pixels (Pallas kernels on TPU, the XLA scan elsewhere) and one
    psum of the tiny [C, bins] histograms globalizes the statistics. A
    GSPMD-opaque pallas_call would otherwise make XLA all-gather the
    whole [C, B*H*W] error plane per step. Ignored for mesh.size == 1.
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
        lv = _maybe_sharded_lovasz(ignore_index, lovasz_bins, mesh, spatial)

        def fn(logits, targets):
            return lv(logits, targets)
    elif name in ("ce+lovasz", "lovasz+ce"):
        dw = float(dice_weight)
        lv_mix = _maybe_sharded_lovasz(ignore_index, lovasz_bins, mesh,
                                       spatial)

        def fn(logits, targets):
            ce = cross_entropy_loss(
                logits, targets, class_weights=w,
                label_smoothing=label_smoothing, ignore_index=ignore_index,
            )
            return (1.0 - dw) * ce + dw * lv_mix(logits, targets)
    else:
        raise ValueError(
            f"unknown loss {name!r}: expected "
            "ce|focal|dice|ce+dice|lovasz|ce+lovasz"
        )
    return fn
