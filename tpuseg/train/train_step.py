"""The jitted train/eval steps, sharded over the device mesh.

The reference's per-batch work — zero_grad / forward / CE loss / backward /
Adam step (src/train.py:35-39) — becomes ONE compiled XLA program: forward +
backward + optimizer update, jitted with sharding annotations over the mesh.
Data parallelism is expressed declaratively: the batch is sharded on the
"data" axis, params/optimizer state are replicated, and XLA's SPMD partitioner
inserts the gradient all-reduce (psum over ICI) — there is no hand-written
communication anywhere (SURVEY.md §5.8).

Unlike the reference's ``loss.item()`` device->host sync every step
(src/train.py:41), metrics come back as device arrays that the caller fetches
asynchronously.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh

from tpuseg.core.mesh import batch_sharding, replicated_sharding
from tpuseg.train.loss import cross_entropy_loss
from tpuseg.train.metrics import confusion_matrix


class TrainState(train_state.TrainState):
    """flax TrainState + BatchNorm running statistics.

    ``ema_params``: exponential moving average of ``params`` (None when EMA
    is off — a None pytree leaf is an empty subtree, so checkpoints written
    without EMA restore unchanged). BatchNorm running stats are already a
    running average, so they are shared rather than double-averaged.
    """

    batch_stats: Any = None
    ema_params: Any = None


def create_train_state(
    model,
    rng: jax.Array,
    input_shape,
    lr: float = 1.5e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    tx: Optional[optax.GradientTransformation] = None,
    ema: bool = False,
) -> TrainState:
    """Initialize params/batch_stats and the Adam optimizer.

    Defaults mirror the reference: Adam(lr=1.5e-4) with torch defaults
    (main.py:100). ``ema=True`` seeds ``ema_params`` with a copy of the
    initial params (distinct buffers — params and ema_params are both
    donated by the step, so they must not alias).
    """
    from tpuseg.core.device_io import init_on_host

    # init + optimizer-state creation run on the host CPU as one jitted
    # program; eager init on a remote-tunnel device is minutes of per-op
    # round trips (tpuseg.core.device_io). The Trainer ships the finished
    # state to the device/mesh in one packed transfer.
    if tx is None:
        tx = optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=eps)

    def _init(key):
        variables = model.init(
            key, jnp.zeros(input_shape, jnp.float32), train=False
        )
        params = variables["params"]
        # tx.init inside the same host program: optax's zeros_like trees
        # are otherwise another per-leaf eager dispatch storm
        ema_params = jax.tree.map(jnp.copy, params) if ema else None
        return (params, variables.get("batch_stats", {}), tx.init(params),
                ema_params)

    params, batch_stats, opt_state, ema_params = init_on_host(_init, rng)
    return TrainState(
        step=0,
        apply_fn=model.apply,
        params=params,
        batch_stats=batch_stats,
        tx=tx,
        opt_state=opt_state,
        ema_params=ema_params,
    )


def make_train_step(
    mesh: Optional[Mesh] = None,
    remat: bool = False,
    donate: bool = True,
    spatial: bool = False,
    augment_fn: Optional[Callable] = None,
    loss_fn: Optional[Callable] = None,
    ema_decay: float = 0.0,
    extra_collections: Optional[dict] = None,
    teacher_fn: Optional[Callable] = None,
    grads_bf16: bool = False,
) -> Callable:
    """Build the jitted (state, images, labels) -> (state, metrics) step.

    ``ema_decay`` > 0 additionally maintains ``state.ema_params`` as
    ema = decay*ema + (1-decay)*params after each optimizer update (the
    state must have been created with ``create_train_state(..., ema=True)``).

    ``extra_collections``: extra Flax variable collections bound (read-only)
    into every forward — e.g. {"qat": build_qat_markers(params)} switches
    ConvBNAct to fake-quantized convs (quantization-aware training).

    ``spatial=True`` additionally shards the image-height dim over the mesh's
    "spatial" axis; XLA's SPMD partitioner inserts the conv halo exchanges
    (SURVEY.md §5.7 — the spatial analogue of sequence parallelism).

    ``augment_fn`` (images_u8, masks_u8, key) -> (x, y) fuses on-device
    augmentation INTO the step program; the signature becomes
    (state, images_u8, masks_u8, key) -> (state, metrics). One dispatch per
    step instead of two — each dispatch through this host's remote-TPU
    tunnel costs ~50-100 ms of latency, which dominated end-to-end training
    (43 imgs/s measured vs 1178 device-only; BASELINE.md).

    ``teacher_fn`` (images) -> stop_gradient'd teacher logits (knowledge
    distillation, tpuseg.train.distill): the frozen-teacher forward runs
    inside the same program and ``loss_fn`` is called as
    (logits, labels, teacher_logits).
    """
    step = _step_body(
        remat, augment_fn, constrain=_spatial_constraint(mesh, spatial),
        compute_loss=loss_fn, ema_decay=ema_decay,
        extra_collections=extra_collections, teacher_fn=teacher_fn,
        grads_bf16=grads_bf16,
    )
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, spatial_dim=1 if spatial else None)
    # augment warps whole images, so its u8 inputs shard on batch only; an
    # explicit with_sharding_constraint inside the step (see _step_body)
    # re-shards the augmented batch onto the spatial axis
    data_b = batch_sharding(mesh)
    in_shardings = (
        (repl, data_b, data_b, repl) if augment_fn is not None
        else (repl, data, data)
    )
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def _spatial_constraint(mesh: Optional[Mesh], spatial: bool):
    """with_sharding_constraint onto (data, spatial) for an augmented batch
    — augment inputs arrive sharded on batch only (whole-image warps), so
    the constraint is what actually moves the H dim onto the "spatial"
    axis; without it GSPMD is free to keep the batch replicated there."""
    if mesh is None or not spatial:
        return None
    sharding = batch_sharding(mesh, spatial_dim=1)

    def constrain(x, y):
        return (
            jax.lax.with_sharding_constraint(x, sharding),
            jax.lax.with_sharding_constraint(y, sharding),
        )

    return constrain


def _step_body(
    remat: bool,
    augment_fn: Optional[Callable],
    constrain: Optional[Callable] = None,
    compute_loss: Optional[Callable] = None,
    ema_decay: float = 0.0,
    extra_collections: Optional[dict] = None,
    teacher_fn: Optional[Callable] = None,
    grads_bf16: bool = False,
) -> Callable:
    """The un-jitted single-step body shared by the step factories.

    ``compute_loss``: (logits [B,H,W,C], labels [B,H,W]) -> scalar; defaults
    to the reference's plain CE (tpuseg.train.loss.make_loss_fn for the
    weighted/focal/dice options). With ``teacher_fn`` set (distillation)
    it is called as (logits, labels, teacher_logits) instead.
    """
    if compute_loss is None:
        compute_loss = cross_entropy_loss

    def loss_fn(params, state: TrainState, images, labels, teacher_logits):
        def fwd(variables, images):
            # non-array kwargs stay OUT of the remat boundary:
            # jax.checkpoint requires every traced argument to be a JAX type
            return state.apply_fn(
                variables, images, train=True, mutable=["batch_stats"]
            )

        if remat:
            fwd = jax.checkpoint(fwd)
        variables = {"params": params, "batch_stats": state.batch_stats}
        if extra_collections:
            variables.update(extra_collections)
        outputs, new_model_state = fwd(variables, images)
        if teacher_logits is None:
            loss = compute_loss(outputs, labels)
        else:
            loss = compute_loss(outputs, labels, teacher_logits)
        return loss, new_model_state["batch_stats"]

    def train_step(state: TrainState, images, labels):
        # frozen-teacher forward OUTSIDE value_and_grad: it is constant
        # w.r.t. the student params, so no backward graph is built for it
        teacher_logits = teacher_fn(images) if teacher_fn is not None else None
        (loss, new_batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, images, labels, teacher_logits)
        if grads_bf16:
            # halves the materialized-gradient bytes — but MEASURED LOSING
            # 4-6% on this model (the cast breaks backward->Adam fusion,
            # and grad bytes are 0.1% of the activation-dominated step
            # traffic; DESIGN §46). Kept as an explicit knob with the
            # verdict attached; quality is bf16-rounding-neutral.
            grads = jax.tree.map(
                lambda g: g.astype(jnp.bfloat16), grads
            )
        state = state.apply_gradients(grads=grads, batch_stats=new_batch_stats)
        if ema_decay > 0.0:
            # plain tree-map: two fused HBM streams over the param bytes,
            # negligible next to the step's conv FLOPs
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.ema_params, state.params,
            )
            if isinstance(state.opt_state, optax.MultiStepsState):
                # grad_accum: params only change every K micro-steps, so an
                # unconditional EMA update would run K times per real update
                # (effective decay = decay^K, a K-fold shorter horizon).
                # MultiSteps wraps mini_step back to 0 exactly when it
                # applies the accumulated update — gate on that boundary.
                updated = state.opt_state.mini_step == 0
                ema = jax.tree.map(
                    lambda new, old: jnp.where(updated, new, old),
                    ema, state.ema_params,
                )
            state = state.replace(ema_params=ema)
        metrics = {"loss": loss}
        return state, metrics

    if augment_fn is None:
        return train_step

    def fused_step(state: TrainState, images_u8, masks_u8, key):
        x, y = augment_fn(images_u8, masks_u8, key)
        if constrain is not None:
            x, y = constrain(x, y)
        return train_step(state, x, y)

    return fused_step


def make_train_multi_step(
    k: int,
    mesh: Optional[Mesh] = None,
    remat: bool = False,
    donate: bool = True,
    spatial: bool = False,
    augment_fn: Optional[Callable] = None,
    loss_fn: Optional[Callable] = None,
    ema_decay: float = 0.0,
    extra_collections: Optional[dict] = None,
    teacher_fn: Optional[Callable] = None,
    grads_bf16: bool = False,
) -> Callable:
    """K train steps per dispatch via ``lax.scan`` — ONE compiled program,
    ONE host->device round trip, per K optimizer updates.

    Numerically identical to calling the single step K times (the scan
    threads state through each iteration); what changes is dispatch
    frequency. On this host the remote-TPU tunnel costs ~50-100 ms latency
    per dispatch, which capped end-to-end training at 43 imgs/s while the
    device-only step rate was 1178+ (BASELINE.md) — amortizing K steps per
    dispatch removes that wall without touching training semantics. The
    same trick as bench.py's honesty chain, applied to real training.

    Signature: (state, images[k, B, ...], masks[k, B, ...], keys[k, 2])
    -> (state, {"loss": [k]}). With ``augment_fn`` the stacked batches are
    uint8 and augmented on device inside the scan; without it they are the
    already-augmented (f32, i32) batches and keys are ignored.
    """
    body = _step_body(
        remat, augment_fn, constrain=_spatial_constraint(mesh, spatial),
        compute_loss=loss_fn, ema_decay=ema_decay,
        extra_collections=extra_collections, teacher_fn=teacher_fn,
        grads_bf16=grads_bf16,
    )

    def multi_step(state: TrainState, images, masks, keys):
        def scan_body(st, xs):
            im, mk, ky = xs
            if augment_fn is not None:
                st2, metrics = body(st, im, mk, ky)
            else:
                st2, metrics = body(st, im, mk)
            return st2, metrics["loss"]

        state, losses = jax.lax.scan(scan_body, state, (images, masks, keys))
        return state, {"loss": losses}

    if mesh is None:
        return jax.jit(multi_step, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    # stacked [k, B, H, ...]: batch on "data"; without augment the inputs
    # are already final, so the spatial axis shards H (dim 2) directly —
    # with augment the in-step constraint (see _spatial_constraint) moves
    # H onto "spatial" after the warp instead.
    if spatial and augment_fn is None:
        stacked = NamedSharding(mesh, P(None, "data", "spatial"))
    else:
        stacked = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        multi_step,
        in_shardings=(repl, stacked, stacked, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(
    num_classes: int,
    mesh: Optional[Mesh] = None,
    normalize: Optional[Tuple] = None,
    tta: str = "",
    ms_scales: Tuple[float, ...] = (0.75, 1.25),
    ms_divisor: int = 32,
) -> Callable:
    """Jitted eval: (state, images, labels, n_valid) -> metrics dict.

    ``n_valid`` masks zero-padded tail samples (the pipeline pads the last
    partial batch to keep shapes static). The confusion matrix is accumulated
    on device; callers sum the returned matrices over batches and derive
    mIoU / pixel-acc on host at the end (tpuseg.train.metrics).

    ``normalize``: optional (mean, std) — the step then takes RAW uint8
    images and labels and normalizes/casts INSIDE the jitted program. Eager
    per-batch normalize/astype outside jit costs a remote-tunnel round trip
    per op (~50-100 ms each — CLAUDE.md); fused, it is one dispatch total.

    ``tta``: "" (off), "flip", "ms", or "flip+ms" — test-time augmentation,
    every forward inside the ONE jitted program:
      flip: logits = mean(f(x), unflip(f(flip_W(x)))) — 2x eval FLOPs;
        flips are lax.rev, not gathers. Only valid when class semantics are
        left/right symmetric (true for this task's road classes).
      ms: multi-scale — forwards at ``ms_scales`` (default 0.75/1.0/1.25 of
        the input, snapped to multiples of ``ms_divisor`` so the encoder's
        stride pyramid divides; 32 = the flagship's OS), logits resized
        back to base resolution (ops.resize.resize_bilinear — the
        arbitrary-ratio EDGE resize, per the §29 rule) and averaged in
        fp32. ~2.1x eval FLOPs at the default scales. "flip+ms" composes
        both (flip-averaged forward at every scale, ~4.2x FLOPs).
      Cost caveat: FLOPs multiples UNDERSTATE measured wall-clock — the
        upper scale dominates pixel count and the fp32 logit
        resize/accumulate traffic is the HBM wall (flip 1.66x, ms 4.75x,
        flip+ms 6.76x measured; the MXU-tiling hypothesis was A/B-refuted,
        DESIGN §43b/§43c). tools/train_bench.py --eval --tta measures the
        real cost of any configuration.
    """
    if tta not in ("", "flip", "ms", "flip+ms"):
        raise ValueError(
            f"unknown tta mode {tta!r} (expected ''|'flip'|'ms'|'flip+ms')"
        )

    def eval_step(state: TrainState, images, labels, n_valid):
        if normalize is not None:
            from tpuseg.data.augment import normalize_images

            images = normalize_images(images, normalize[0], normalize[1])
            labels = labels.astype(jnp.int32)

        def fwd(x):
            return state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                x,
                train=False,
            )

        def fwd_maybe_flip(x):
            out = fwd(x)
            if "flip" in tta:
                out = 0.5 * (out + jnp.flip(fwd(jnp.flip(x, axis=2)), axis=2))
            return out

        logits = fwd_maybe_flip(images)
        if "ms" in tta:
            from tpuseg.ops.resize import resize_bilinear

            h, w = images.shape[1], images.shape[2]
            d = int(ms_divisor)
            acc = logits.astype(jnp.float32)
            n_sc = 1
            for s in ms_scales:
                hs = max(d, int(round(h * s / d)) * d)
                ws = max(d, int(round(w * s / d)) * d)
                if (hs, ws) == (h, w):
                    continue
                xs = resize_bilinear(images.astype(jnp.float32), hs, ws)
                ls = fwd_maybe_flip(xs)
                acc = acc + resize_bilinear(ls.astype(jnp.float32), h, w)
                n_sc += 1
            logits = acc / float(n_sc)
        b = images.shape[0]
        valid = (jnp.arange(b) < n_valid).astype(jnp.float32)  # [B]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # one-hot contraction instead of take_along_axis (gathers are the
        # slow path on this backend; see tpuseg/train/loss.py)
        onehot = jax.nn.one_hot(
            labels.astype(jnp.int32), logits.shape[-1], dtype=jnp.float32
        )
        nll = -jnp.sum(logp * onehot, axis=-1)
        per_sample = jnp.mean(nll, axis=(1, 2))  # [B]
        preds = jnp.argmax(logits, axis=-1)
        # padded samples -> class index C for both pred and target, then
        # dropped by slicing the (C+1)-sized matrix back to [C, C].
        vmask = valid[:, None, None].astype(jnp.int32)
        preds_m = preds * vmask + num_classes * (1 - vmask)
        labels_m = labels.astype(jnp.int32) * vmask + num_classes * (1 - vmask)
        cm = confusion_matrix(preds_m, labels_m, num_classes + 1)[
            :num_classes, :num_classes
        ]
        return {
            "loss_sum": jnp.sum(per_sample * valid),
            "n": jnp.sum(valid),
            "confusion": cm,
        }

    if mesh is None:
        return jax.jit(eval_step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        eval_step,
        in_shardings=(repl, data, data, repl),
        out_shardings=repl,
    )
