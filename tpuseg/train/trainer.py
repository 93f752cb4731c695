"""The high-level training driver.

Replaces the reference's ``train_model`` epoch loop (src/train.py:6-79) with a
TPU-shaped one:

- ONE jitted program per train step (fwd + bwd + Adam update, sharded over
  the mesh's "data" axis) instead of eager per-op dispatch;
- loss is fetched with a one-step LAG so the host never blocks the device
  (the reference syncs every step via ``loss.item()``, src/train.py:41);
- on-device augmentation of uint8 batches (tpuseg.data.augment);
- a REAL eval loop with mIoU/pixel-acc (the reference's validation phase is
  commented out, src/train.py:46-74, and it computes no metric ever);
- async step-tagged Orbax checkpoints with resume (vs torch.save of bare
  state_dict every epoch, src/train.py:77);
- optional jax.profiler trace capture and structured JSON-lines logging.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.configs import Config
from tpuseg.core.checkpoint import CheckpointManager
from tpuseg.core.mesh import create_mesh, local_device_kind
from tpuseg.data.augment import make_augment_fn
from tpuseg.data.combined import CombinedDataset
from tpuseg.data.pipeline import InputPipeline
from tpuseg.data.sources import build_source
from tpuseg.models.registry import build_model
from tpuseg.train.metrics import (
    iou_from_confusion,
    mean_iou,
    pixel_accuracy_from_confusion,
    tree_sum,
)
from tpuseg.train.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _loss_list(x) -> list:
    """Scalar (single-step) or [k]-vector (multi-step) loss -> python list."""
    return np.atleast_1d(np.asarray(x)).tolist()


log = logging.getLogger(__name__)


class Trainer:
    """Wires config -> mesh, model, pipeline, steps; runs train/eval."""

    def __init__(self, cfg: Config, combined: Optional[CombinedDataset] = None):
        self.cfg = cfg
        self.mesh = create_mesh(cfg.mesh.data, cfg.mesh.spatial)
        log.info("devices: %s | mesh: %s", local_device_kind(), self.mesh)

        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)

        # Dataset/pipeline BEFORE the optimizer: a cosine schedule's horizon
        # needs the dataset-derived steps_per_epoch when the config leaves
        # it at 0 ("derive from dataset size").
        if combined is None:
            sources = [
                build_source(s, cfg.data.width, cfg.data.height)
                for s in cfg.data.sources
            ]
            weights = [s.weight for s in cfg.data.sources]
            if not any(weights):
                weights = None
            combined = CombinedDataset(
                sources,
                weights=weights,
                val_split=cfg.data.val_split,
                seed=cfg.data.seed,
            )
        if cfg.train.batch_size % self.mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {cfg.train.batch_size} must be divisible by the "
                f"mesh data axis ({self.mesh.shape['data']} devices)"
            )
        # mesh.spatial > 1 shards the H dim across the "spatial" axis —
        # checked BEFORE model init so an indivisible height fails fast
        spatial = self.mesh.shape.get("spatial", 1) > 1
        if spatial and cfg.data.height % self.mesh.shape["spatial"] != 0:
            raise ValueError(
                f"data.height {cfg.data.height} must be divisible by the "
                f"mesh spatial axis ({self.mesh.shape['spatial']})"
            )
        # ... and the model family's own divisibility contract (x32 for the
        # MobileNetV2 families, x8 for UNet/LightUNet) — a clear error here
        # beats a mid-trace concat shape mismatch at model init
        from tpuseg.models.registry import validate_input_size

        validate_input_size(cfg.model.name, cfg.data.height, cfg.data.width)
        self.combined = combined
        log.info("%s", combined.summary())
        self.pipeline = InputPipeline(
            combined,
            batch_size=cfg.train.batch_size,
            height=cfg.data.height,
            width=cfg.data.width,
            mesh=self.mesh,
            seed=cfg.data.seed,
            prefetch=cfg.data.prefetch,
            cache_bytes=cfg.data.cache_bytes,
        )
        log.info(
            "source sampling probabilities: %s",
            [round(float(p), 4) for p in self.pipeline.sampler.probs],
        )

        self.model = build_model(cfg.model)
        rng = jax.random.PRNGKey(cfg.train.seed)
        tx = self._build_optimizer()
        self.state = create_train_state(
            self.model,
            rng,
            (1, cfg.data.height, cfg.data.width, 3),
            lr=cfg.train.lr,
            b1=cfg.train.b1,
            b2=cfg.train.b2,
            eps=cfg.train.eps,
            tx=tx,
            ema=cfg.train.ema_decay > 0,
        )
        if cfg.train.ema_decay > 0:
            # DESIGN §30/§47 (measured twice): a decay whose ~1/(1-d)-step
            # time constant exceeds the run leaves the served EMA tree
            # dominated by the random init — 0.999 on a 192-step protocol
            # run scores 0.089 mIoU while the raw weights are at 0.977.
            # eval/best/serving use the EMA tree, so this is a silent
            # quality cliff; warn instead of guessing a decay for the user.
            total = cfg.train.epochs * self.steps_per_epoch()
            horizon = 1.0 / max(1e-9, 1.0 - cfg.train.ema_decay)
            if total < 3 * horizon:
                log.warning(
                    "ema_decay=%g has a ~%d-step time constant but this run "
                    "is only %d steps: the served EMA tree will lag far "
                    "behind the raw weights (measured collapse, DESIGN "
                    "§30/§47). Pick decay so 1/(1-decay) is well under the "
                    "step count (e.g. %.3g).",
                    cfg.train.ema_decay, int(horizon), total,
                    max(0.0, 1.0 - 10.0 / max(total, 10)),
                )
        if cfg.train.init_checkpoint:
            self._load_init_checkpoint(cfg.train.init_checkpoint)

        self.augment = make_augment_fn(
            cfg.data.height, cfg.data.width, heavy=cfg.data.heavy_augment,
            augment=cfg.data.augment,
            mean=cfg.data.normalize_mean, std=cfg.data.normalize_std,
        )
        self._aug_key = jax.random.PRNGKey(cfg.data.seed + 1)
        # Augmentation is fused INTO the jitted step (one dispatch per step;
        # each dispatch through the remote-TPU tunnel costs ~50-100 ms), and
        # steps_per_dispatch>1 scan-chains K steps into one dispatch.
        self.steps_per_dispatch = max(1, cfg.train.steps_per_dispatch)
        # spatial=True (computed above) or the step factories shard
        # batch-only and the spatial axis silently replicates (half the
        # chips redoing identical work)
        loss_fn = self._build_loss()
        extra_collections = None
        if cfg.train.qat:
            # quantization-aware training: bind the "qat" marker collection
            # so every ConvBNAct conv runs fake-quantized (straight-through
            # int8 rounding noise matching export.int8_full's grids)
            from tpuseg.ops.fake_quant import build_qat_markers

            extra_collections = {"qat": build_qat_markers(self.state.params)}
        teacher_fn = None
        if cfg.train.distill_checkpoint:
            if cfg.train.distill_alpha <= 0.0:
                # A/B convenience: alpha=0 means KD off — skip building the
                # teacher entirely (a 0-weighted teacher forward would still
                # run every step; XLA does not DCE through the 0-multiply)
                log.warning(
                    "distill_alpha=0 — ignoring distill_checkpoint %r",
                    cfg.train.distill_checkpoint,
                )
            else:
                loss_fn, teacher_fn = self._build_distillation(loss_fn)
        if self.steps_per_dispatch > 1:
            from tpuseg.train.train_step import make_train_multi_step

            self.train_step = make_train_multi_step(
                self.steps_per_dispatch,
                mesh=self.mesh,
                remat=cfg.train.remat,
                spatial=spatial,
                augment_fn=self.augment,
                loss_fn=loss_fn,
                ema_decay=cfg.train.ema_decay,
                extra_collections=extra_collections,
                teacher_fn=teacher_fn,
                grads_bf16=cfg.train.grads_bf16,
            )
        else:
            self.train_step = make_train_step(
                mesh=self.mesh,
                remat=cfg.train.remat,
                spatial=spatial,
                augment_fn=self.augment,
                loss_fn=loss_fn,
                ema_decay=cfg.train.ema_decay,
                extra_collections=extra_collections,
                teacher_fn=teacher_fn,
                grads_bf16=cfg.train.grads_bf16,
            )
        # normalization + label cast run INSIDE the jitted eval step (eager
        # per-batch ops each cost a remote-tunnel dispatch — CLAUDE.md)
        # --train.eval_tta routes the measured TTA ladder (DESIGN §33/§43)
        # into in-training eval: early stopping + best-ckpt selection then
        # optimize the TTA metric. Off by default — measured eval cost is
        # 1.66x (flip) / 4.75x (ms) / 6.76x (flip+ms) per eval epoch.
        self.eval_step = make_eval_step(
            cfg.model.num_classes, mesh=self.mesh,
            normalize=(cfg.data.normalize_mean, cfg.data.normalize_std),
            tta=cfg.train.eval_tta,
            ms_scales=cfg.train.eval_tta_scales,
        )

        self.ckpt: Optional[CheckpointManager] = None
        self.best_ckpt: Optional[CheckpointManager] = None
        if cfg.train.checkpoint_dir:
            self.ckpt = CheckpointManager(
                cfg.train.checkpoint_dir, max_to_keep=cfg.train.keep_checkpoints
            )
            # The best-val-mIoU checkpoint lives in its own always-kept slot:
            # the rolling manager above garbage-collects beyond max_to_keep,
            # which would eventually delete the step best.json points at.
            # (The reference keeps EVERY epoch, src/train.py:77, precisely so
            # consumers can pick the best one later.)
            self.best_ckpt = CheckpointManager(
                os.path.join(cfg.train.checkpoint_dir, "best"), max_to_keep=1
            )
        self.step = 0
        # epochs COMPLETED — checkpointed explicitly: deriving it from
        # step//steps_per_epoch breaks when steps_per_dispatch (which rounds
        # steps/epoch up to whole dispatch groups) changes between runs
        self.epoch = 0
        self.history: List[Dict] = []
        # Persist epoch records as JSON-lines (the reference only prints a
        # per-epoch loss, src/train.py:75; here the full record — loss,
        # val mIoU, per-class IoU, imgs/sec — survives the process).
        # "" = <checkpoint_dir>/history.jsonl when checkpointing, else off;
        # resume APPENDS, so one file carries the whole run.
        self._history_path = cfg.train.history_file
        if not self._history_path and cfg.train.checkpoint_dir:
            self._history_path = os.path.join(
                cfg.train.checkpoint_dir, "history.jsonl"
            )
        if self._history_path == "none":
            self._history_path = ""
        self._best_miou = float("-inf")
        # early stopping (in-run state: patience counts evals of THIS run,
        # it is deliberately not checkpointed — a fresh resume gets fresh
        # patience rather than instantly stopping)
        self._es_best = float("-inf")
        self._es_stale = 0
        self._stop_early = False
        self._tb = None
        if cfg.train.tensorboard_dir:
            # lazy TF import: only pay the cost when summaries are requested
            import tensorflow as tf

            self._tb = tf.summary.create_file_writer(cfg.train.tensorboard_dir)

    def _tb_scalars(self, rec: Dict) -> None:
        if self._tb is None:
            return
        import tensorflow as tf

        with self._tb.as_default(step=rec["step"]):
            for key, value in rec.items():
                if isinstance(value, (int, float)) and key != "step":
                    tf.summary.scalar(key, value)
        self._tb.flush()

    def _build_optimizer(self):
        """None => train_step's default (reference-parity Adam). Otherwise an
        optax chain for the configured optimizer/schedule.

        ``grad_accum=k`` wraps the chain in ``optax.MultiSteps``: gradients
        average over k micro-batches and the inner update applies every k-th
        step — a k-times-larger effective batch without k-times the
        activation memory. BN running stats still update per micro-batch
        (same as a torch accumulation loop's ``forward()`` calls).

        ``grad_clip_norm=c`` (>0) clips the gradient's global L2 norm to c
        before the optimizer sees it; under grad_accum the clip applies to
        the k-averaged gradient (where torch's clip_grad_norm_ would run).
        """
        import optax

        cfg = self.cfg.train
        if (cfg.lr_schedule == "" and cfg.optimizer == "adam"
                and cfg.grad_accum <= 1 and cfg.grad_clip_norm <= 0
                and not cfg.mu_dtype):
            return None
        lr = cfg.lr
        if cfg.lr_schedule == "cosine":
            # dataset-derived when steps_per_epoch is 0 (__init__ builds the
            # pipeline before the optimizer for exactly this)
            total = max(1, cfg.epochs * self.steps_per_epoch())
            self._lr_total_steps = total  # observability + tests
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=cfg.lr,
                warmup_steps=cfg.warmup_steps,
                decay_steps=total,
            )
        elif cfg.lr_schedule:
            raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
        # reduced-precision first moment / momentum accumulator
        # (--train.mu_dtype=bfloat16 — the §15 byte lever, DESIGN §46);
        # validated eagerly so a typo fails at construction, not in jit
        if cfg.mu_dtype:
            import jax.numpy as jnp

            mu_dtype = jnp.dtype(cfg.mu_dtype)
            if mu_dtype not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
                raise ValueError(
                    f"train.mu_dtype={cfg.mu_dtype!r}: expected "
                    "''|'bfloat16'|'float32'"
                )
        else:
            mu_dtype = None
        if cfg.optimizer == "adam":
            tx = optax.adam(lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                            mu_dtype=mu_dtype)
        elif cfg.optimizer == "adamw":
            tx = optax.adamw(
                lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                weight_decay=cfg.weight_decay, mu_dtype=mu_dtype,
            )
        elif cfg.optimizer == "sgd":
            tx = optax.sgd(lr, momentum=cfg.momentum,
                           accumulator_dtype=mu_dtype)
        else:
            raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
        if cfg.grad_clip_norm > 0:
            # clip BEFORE the optimizer; under grad_accum the clip applies
            # to the k-averaged gradient at the inner update (same place a
            # torch accumulation loop would call clip_grad_norm_)
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip_norm), tx
            )
        if cfg.grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
        return tx

    def _build_loss(self):
        """None => train_step's default (reference-parity plain CE); else a
        configured loss closure (tpuseg.train.loss.make_loss_fn)."""
        cfg = self.cfg.train
        if (cfg.loss in ("", "ce") and not cfg.class_weights
                and cfg.label_smoothing == 0.0 and cfg.ignore_index < 0):
            return None
        if isinstance(cfg.class_weights, str):
            # --train.class_weights=auto[:median|:inverse] — resolve against
            # this run's own TRAIN split at startup (the measured +8.2-pt
            # imbalance remedy of DESIGN §38 as one word instead of a
            # hand-pasted 10-float CSV from tools/class_stats.py)
            from tpuseg.data.class_stats import resolve_auto_class_weights

            weights = resolve_auto_class_weights(
                self.combined,
                self.cfg.model.num_classes,
                spec=cfg.class_weights,
            )
            log.info(
                "resolved --train.class_weights=%s -> %s "
                "(freeze with an explicit list for exact reproducibility)",
                cfg.class_weights,
                ",".join(f"{w:.4f}" for w in weights),
            )
        else:
            weights = tuple(float(w) for w in cfg.class_weights) or None
        if weights is not None and len(weights) != self.cfg.model.num_classes:
            raise ValueError(
                f"train.class_weights has {len(weights)} entries; model has "
                f"{self.cfg.model.num_classes} classes"
            )
        from tpuseg.train.loss import make_loss_fn

        return make_loss_fn(
            cfg.loss,
            class_weights=weights,
            label_smoothing=cfg.label_smoothing,
            focal_gamma=cfg.focal_gamma,
            dice_weight=cfg.dice_weight,
            ignore_index=cfg.ignore_index if cfg.ignore_index >= 0 else None,
            lovasz_bins=cfg.lovasz_bins,
            # multi-device: the lovasz term shard_maps (local histograms +
            # one [C, bins] psum) instead of letting GSPMD all-gather the
            # error plane around the opaque pallas_call (DESIGN §45)
            mesh=self.mesh if self.mesh.size > 1 else None,
            spatial=self.mesh.shape.get("spatial", 1) > 1,
        )

    def _build_distillation(self, loss_fn):
        """Build the frozen teacher + combined loss (--train.distill_*).

        Returns (distill_loss, teacher_fn) for the step factories: the
        teacher forward fuses INTO the jitted step (an eager teacher pass
        would cost a second remote-tunnel dispatch per step), and its
        variables ship to the device in ONE packed transfer up front —
        leaving them host-side would make jit transfer the ~hundreds of
        closure-constant leaves one RPC each (CLAUDE.md device-IO rule).
        """
        import dataclasses

        from tpuseg.core.device_io import device_put_packed
        from tpuseg.infer.predictor import load_variables
        from tpuseg.train.distill import make_distill_loss, make_teacher_fn
        from tpuseg.train.loss import cross_entropy_loss

        cfg = self.cfg.train
        t_cfg = dataclasses.replace(
            self.cfg.model,
            name=cfg.distill_model or self.cfg.model.name,
            base_filters=(
                cfg.distill_base_filters or self.cfg.model.base_filters
            ),
            width_mult=cfg.distill_width_mult or self.cfg.model.width_mult,
            # the Pallas fused-upconcat path is eval-only AND single-chip;
            # the teacher runs train=False INSIDE the (possibly sharded)
            # train program, which would pull that kernel into it
            use_pallas=False,
        )
        teacher = build_model(t_cfg)
        variables = load_variables(
            cfg.distill_checkpoint, t_cfg.name, lambda: None
        )
        if "quant" in variables:
            # same convention as eval_miou/eval_quantized: a calibrated
            # int8 artifact must not silently distill from its fp32 tree
            raise ValueError(
                f"distill_checkpoint {cfg.distill_checkpoint!r} carries a "
                "calibrated int8 'quant' collection — distill from the "
                "fp32 training checkpoint instead"
            )
        variables = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        # fail at build time, not at first step: a wrong distill_model /
        # base_filters mismatch dies inside apply with an opaque scope error
        try:
            shapes = jax.eval_shape(
                lambda v: teacher.apply(
                    v,
                    jnp.zeros(
                        (1, self.cfg.data.height, self.cfg.data.width, 3)
                    ),
                    train=False,
                ),
                variables,
            )
        except Exception as e:
            raise ValueError(
                f"distill_checkpoint {cfg.distill_checkpoint!r} does not "
                f"match teacher model {t_cfg.name!r} (base_filters="
                f"{cfg.distill_base_filters}, width_mult="
                f"{cfg.distill_width_mult}): {e}"
            ) from e
        if shapes.shape[-1] != self.cfg.model.num_classes:
            raise ValueError(
                f"teacher predicts {shapes.shape[-1]} classes; student has "
                f"{self.cfg.model.num_classes}"
            )
        if self.mesh is not None:
            from tpuseg.core.mesh import replicated_sharding

            variables = device_put_packed(
                variables, sharding=replicated_sharding(self.mesh)
            )
        else:
            variables = device_put_packed(variables)
        log.info(
            "distillation: teacher=%s from %s, alpha=%.2f, T=%.1f",
            t_cfg.name, cfg.distill_checkpoint, cfg.distill_alpha,
            cfg.distill_temperature,
        )
        return (
            make_distill_loss(
                loss_fn or cross_entropy_loss,
                cfg.distill_alpha,
                cfg.distill_temperature,
                ignore_index=cfg.ignore_index,
            ),
            make_teacher_fn(teacher, variables),
        )

    def _load_init_checkpoint(self, path: str) -> None:
        """Initialize params/batch_stats from a checkpoint (or .pth) WITHOUT
        touching optimizer state or the sampler — the pretrained-encoder
        start (reference src/unet.py:12; tools/import_pretrained.py)."""
        from tpuseg.infer.predictor import load_variables

        variables = load_variables(path, self.cfg.model.name, lambda: None)
        tgt_params = jax.tree.structure(self.state.params)
        got_params = jax.tree.structure(variables["params"])
        if tgt_params != got_params:
            raise ValueError(
                f"init_checkpoint {path!r} param tree does not match the "
                f"model ({self.cfg.model.name})"
            )
        cast = lambda t, like: jax.tree.map(
            lambda v, l: jnp.asarray(v, l.dtype), t, like
        )
        self.state = self.state.replace(
            params=cast(variables["params"], self.state.params),
            batch_stats=cast(
                variables["batch_stats"], self.state.batch_stats
            ),
        )
        log.info("initialized params from %s", path)

    # -- checkpointing -----------------------------------------------------

    def _sampler_state_pytree(self) -> dict:
        s = self.pipeline.state()["sampler"]
        return {
            "key": np.asarray(s["key"], np.uint32),
            "pos": np.asarray(s["pos"], np.int64),
            "has_gauss": np.asarray(s["has_gauss"], np.int64),
            "cached": np.asarray(s["cached"], np.float64),
        }

    def _checkpoint_payload(self) -> dict:
        state = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": np.asarray(self.step, np.int64),
            "epoch": np.asarray(self.epoch, np.int64),
        }
        if self.state.ema_params is not None:
            # separate key (not a None-leaf in every checkpoint): EMA-off
            # checkpoints keep their historical tree shape and restore
            # against the EMA-off template unchanged
            state["ema_params"] = self.state.ema_params
        return {
            "state": state,
            "sampler": self._sampler_state_pytree(),
        }

    def save_checkpoint(self, force: bool = False) -> None:
        if self.ckpt is None:
            return
        self.ckpt.save(self.step, self._checkpoint_payload(), force=force)

    def maybe_resume(self) -> bool:
        if self.ckpt is None or self.ckpt.latest_step() is None:
            return False
        tstate = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": np.asarray(0, np.int64),
            "epoch": np.asarray(0, np.int64),
        }
        ema_on = self.state.ema_params is not None
        # Build the template to match what was actually SAVED (orbax
        # metadata), so toggling --train.ema_decay across a resume works in
        # both directions instead of dying on a structure mismatch: an
        # EMA-on run resuming an EMA-off checkpoint seeds EMA from the
        # restored params; an EMA-off run discards the saved EMA tree.
        saved = self.ckpt.saved_keys(subtree=("state",))
        has_epoch = True
        if saved is not None:
            if ema_on and "ema_params" in saved:
                tstate["ema_params"] = self.state.ema_params
            elif not ema_on and "ema_params" in saved:
                log.warning(
                    "checkpoint carries an EMA tree but --train.ema_decay=0;"
                    " restoring raw params and discarding the EMA average"
                )
                tstate["ema_params"] = self.state.params
            has_epoch = "epoch" in saved
            if not has_epoch:  # predates the explicit epoch counter
                del tstate["epoch"]
            template = {"state": tstate, "sampler": self._sampler_state_pytree()}
            restored = self.ckpt.restore(template=template)
        else:  # metadata unavailable: probe, then fail with a clear message
            if ema_on:
                tstate["ema_params"] = self.state.ema_params
            template = {"state": tstate, "sampler": self._sampler_state_pytree()}
            try:
                restored = self.ckpt.restore(template=template)
            except Exception:
                del template["state"]["epoch"]
                has_epoch = False
                try:
                    restored = self.ckpt.restore(template=template)
                except Exception as e:
                    raise RuntimeError(
                        "checkpoint restore failed: saved tree does not match "
                        "the current training state (most likely "
                        "--train.ema_decay was toggled relative to the run "
                        "that wrote the checkpoint)"
                    ) from e
        st = restored["state"]
        if ema_on:
            ema = st.get("ema_params")
            if ema is None:
                log.info(
                    "checkpoint has no EMA tree; seeding EMA from restored "
                    "params"
                )
                # one jitted copy program (distinct buffers — the step
                # donates both trees), not per-leaf eager copies: each eager
                # op is a ~50-100 ms tunnel round trip (CLAUDE.md)
                ema = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(
                    st["params"]
                )
        else:
            ema = None
        self.state = self.state.replace(
            params=st["params"],
            batch_stats=st["batch_stats"],
            opt_state=st["opt_state"],
            ema_params=ema,
        )
        self.step = int(st["step"])
        if has_epoch:
            self.epoch = int(st["epoch"])
        else:  # legacy fallback: derive from the current epoch rounding
            k = self.steps_per_dispatch
            self.epoch = self.step // (-(-self.steps_per_epoch() // k) * k)
        s = restored["sampler"]
        self.pipeline.restore(
            {
                "sampler": {
                    "key": np.asarray(s["key"]).tolist(),
                    "pos": int(s["pos"]),
                    "has_gauss": int(s["has_gauss"]),
                    "cached": float(s["cached"]),
                }
            }
        )
        # Restore the best-mIoU watermark, or the first post-resume eval
        # (however bad) would overwrite the best/ slot and best.json.
        best_json = os.path.join(self.cfg.train.checkpoint_dir, "best.json")
        if os.path.exists(best_json):
            try:
                with open(best_json) as f:
                    self._best_miou = float(json.load(f)["val_miou"])
            except (ValueError, KeyError, OSError):
                log.warning("unreadable best.json; best watermark reset")
        log.info("resumed from step %d (best val_miou %s)", self.step,
                 None if self._best_miou == float("-inf")
                 else round(self._best_miou, 4))
        return True

    # -- loops ---------------------------------------------------------------

    def steps_per_epoch(self) -> int:
        if self.cfg.train.steps_per_epoch > 0:
            return self.cfg.train.steps_per_epoch
        return max(1, self.combined.train_size // self.cfg.train.batch_size)

    def _install_preemption_handler(self):
        """SIGTERM -> finish the in-flight dispatch group, checkpoint, exit
        cleanly (SURVEY.md §5.3). Preemptible/spot TPUs get a SIGTERM grace
        window; the reference loses all progress since its last epoch-end
        torch.save. Returns a restore callback (signals only bind in the
        main thread; elsewhere this is a no-op)."""
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return lambda: None
        prev = signal.getsignal(signal.SIGTERM)

        def handler(signum, frame):
            self._preempted = True
            log.warning("SIGTERM: will checkpoint and stop after the "
                        "current dispatch group")

        signal.signal(signal.SIGTERM, handler)
        return lambda: signal.signal(signal.SIGTERM, prev)

    def train(self, epochs: Optional[int] = None) -> List[Dict]:
        cfg = self.cfg.train
        epochs = epochs if epochs is not None else cfg.epochs
        self._preempted = False
        restore_signal = self._install_preemption_handler()
        k = self.steps_per_dispatch
        # round steps/epoch up to a whole number of dispatch groups
        spe = -(-self.steps_per_epoch() // k) * k
        if cfg.resume:
            self.maybe_resume()
        start_epoch = self.epoch
        # Ship the full training state to the mesh in ONE packed transfer
        # (replicated): a per-leaf transfer of the ~1000-leaf state tree
        # costs a tunnel round trip per leaf on this host (minutes), and
        # letting the first jitted step do it implicitly is the same cost.
        from tpuseg.core.device_io import device_put_packed
        from tpuseg.core.mesh import replicated_sharding

        self.state = device_put_packed(
            self.state, sharding=replicated_sharding(self.mesh)
        )

        profiling = False
        if cfg.profile_dir:
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = True

        try:
            for epoch in range(start_epoch, epochs):
                t0 = time.perf_counter()
                losses = []
                pending = None  # one-step-lagged loss fetch
                # A mid-epoch (preemption) checkpoint resumes INTO the
                # partial epoch: run only the remaining dispatch groups.
                done = 0
                if epoch == start_epoch:
                    done = min(max(0, self.step - epoch * spe), spe)
                    done -= done % k  # whole dispatch groups only
                steps_this = spe - done
                if steps_this <= 0:
                    # Resumed exactly at an epoch boundary (SIGTERM landed
                    # after the final dispatch group): training for this
                    # epoch is done but its epoch-end eval/checkpoint never
                    # ran — run it now instead of silently skipping it and
                    # leaving self.epoch one behind.
                    self.epoch = epoch + 1
                    self._epoch_end(epoch, [], 0.0, 0)
                    if self._stop_early:
                        break
                    continue
                batch_gen = self.pipeline.train_batches(steps_this)
                batches = batch_gen
                if cfg.progress:
                    try:
                        from tqdm import tqdm

                        batches = tqdm(
                            batches, total=steps_this,
                            desc=f"epoch {epoch + 1}/{epochs}",
                        )
                    except ImportError:  # pragma: no cover
                        pass
                group: List = []
                for images, masks in batches:
                    group.append((images, masks))
                    if len(group) < k:
                        continue
                    self._aug_key, kk = jax.random.split(self._aug_key)
                    if k == 1:
                        self.state, metrics = self.train_step(
                            self.state, group[0][0], group[0][1], kk
                        )
                    else:
                        keys = jax.random.split(kk, k)
                        self.state, metrics = self.train_step(
                            self.state,
                            jnp.stack([g[0] for g in group]),
                            jnp.stack([g[1] for g in group]),
                            keys,
                        )
                    group = []
                    self.step += k
                    # one-dispatch-lagged loss fetch: the device runs the
                    # next group while the host fetches this one's losses
                    if pending is not None:
                        losses.extend(_loss_list(pending["loss"]))
                    pending = metrics
                    if (
                        cfg.log_every
                        and self.step % cfg.log_every < k
                        and losses
                    ):
                        log.info(
                            "step %d | loss %.4f", self.step, losses[-1]
                        )
                    if self._preempted:
                        break
                if self._preempted:
                    # STOP the producer thread before touching the sampler:
                    # breaking out of the loop does not close the generator,
                    # and save_checkpoint would otherwise snapshot the RNG
                    # while the producer is still mutating it (a torn
                    # MT19937 state that never existed)
                    batch_gen.close()
                    # mid-epoch checkpoint: step/sampler state land after the
                    # last completed dispatch group, so resume replays no
                    # trained batch (the sampler RNG may have advanced past
                    # up to prefetch+1 producer-drawn batches that were never
                    # trained — statistically harmless with with-replacement
                    # sampling)
                    if self.ckpt is None:
                        log.warning(
                            "preempted at step %d — no checkpoint_dir set, "
                            "progress is lost",
                            self.step,
                        )
                        break
                    self.save_checkpoint(force=True)
                    self.ckpt.wait()
                    log.warning(
                        "preempted at step %d — checkpoint saved, exiting",
                        self.step,
                    )
                    break
                if pending is not None:
                    losses.extend(_loss_list(pending["loss"]))
                dt = time.perf_counter() - t0
                self.epoch = epoch + 1  # completed; saved with checkpoints
                self._epoch_end(epoch, losses, dt, steps_this)
                if self._stop_early:
                    # final state is already checkpointed by _epoch_end
                    # (save_every_epochs) and the best/ slot is current
                    break
        finally:
            restore_signal()
            if profiling:
                jax.profiler.stop_trace()
            if self.ckpt is not None:
                self.ckpt.wait()
            if self.best_ckpt is not None:
                # without this the best/ async save can still be in flight at
                # process exit, leaving an unfinalized *.orbax-checkpoint-tmp
                # that best.json points at
                self.best_ckpt.wait()
        return self.history

    def _epoch_end(self, epoch: int, losses: list, dt: float,
                   steps_this: int) -> None:
        """Epoch-end record + eval + best tracking + checkpoint save.

        Shared by the normal epoch-complete path and the resumed-at-boundary
        path (a SIGTERM that landed after an epoch's final dispatch group)."""
        cfg = self.cfg.train
        rec = {
            "epoch": epoch + 1,
            "step": self.step,
            "train_loss": float(np.mean(losses)) if losses else float("nan"),
            "imgs_per_sec": steps_this * cfg.batch_size / max(dt, 1e-9),
            "seconds": dt,
        }
        if (
            self.combined.val_size > 0
            and cfg.eval_every_epochs
            and (epoch + 1) % cfg.eval_every_epochs == 0
        ):
            rec.update(self.evaluate())
            miou = rec.get("val_miou")
            if miou is not None and cfg.early_stop_patience > 0:
                if miou > self._es_best + cfg.early_stop_min_delta:
                    self._es_best = miou
                    self._es_stale = 0
                else:
                    self._es_stale += 1
                    if self._es_stale >= cfg.early_stop_patience:
                        self._stop_early = True
                        rec["early_stop"] = True
                        log.info(
                            "early stop: val_miou has not improved by >%g "
                            "for %d evals (best %.4f)",
                            cfg.early_stop_min_delta,
                            self._es_stale,
                            self._es_best,
                        )
            if miou is not None and miou > self._best_miou:
                self._best_miou = miou
                rec["best"] = True
                if self.best_ckpt is not None:
                    # always-kept slot: survives the rolling manager's
                    # max_to_keep GC, so best.json stays restorable forever
                    self.best_ckpt.save(
                        self.step, self._checkpoint_payload(), force=True
                    )
                if cfg.checkpoint_dir:
                    with open(
                        os.path.join(cfg.checkpoint_dir, "best.json"), "w"
                    ) as f:
                        json.dump({"step": self.step, "val_miou": miou}, f)
        self.history.append(rec)
        log.info("%s", json.dumps(rec))
        if self._history_path:
            with open(self._history_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        self._tb_scalars(rec)
        if cfg.save_every_epochs and (epoch + 1) % cfg.save_every_epochs == 0:
            self.save_checkpoint()

    def evaluate(self) -> Dict[str, float]:
        """Full pass over the val split: loss, pixel acc, per-class IoU, mIoU."""
        # ONE dispatch per batch (normalize/cast fused into eval_step), the
        # per-batch outputs stay on device, and ONE jitted tree-sum reduces
        # them at the end; the only host fetches are the three final scalars
        state = self.state
        if self.cfg.train.ema_decay > 0:
            # evaluate (and therefore select "best" by) the EMA weights —
            # the same weights load_variables serves from the checkpoint
            state = state.replace(params=state.ema_params)
        outs = []
        for images, masks, n_valid in self.pipeline.eval_batches():
            outs.append(
                self.eval_step(state, images, masks, jnp.asarray(n_valid))
            )
        if not outs:
            return {}
        tot = tree_sum(outs)
        cm = tot["confusion"]
        loss_sum, n = float(tot["loss_sum"]), float(tot["n"])
        if n == 0:
            return {}
        iou = np.asarray(iou_from_confusion(cm))
        return {
            "val_loss": loss_sum / n,
            "val_pixel_acc": float(pixel_accuracy_from_confusion(cm)),
            "val_miou": float(mean_iou(cm)),
            "val_iou_per_class": [None if np.isnan(v) else float(v) for v in iou],
        }
