"""Knowledge distillation: soft-target training against a frozen teacher.

No reference counterpart (the reference trains each model independently);
this is a capability extension in the SURVEY §2.5 spirit, motivated by the
family speed/quality spread this repo measured: the FPN and LightUNet
families run 1.4-60x faster than the flagship but lose boundary quality
(DESIGN §29) — distillation is the standard tool for pulling a fast
student toward a slow teacher's masks.

Formulation (Hinton et al., "Distilling the Knowledge in a Neural
Network"): per-pixel KL between temperature-softened teacher and student
distributions, scaled by T^2 so soft-target gradients keep magnitude
parity with the hard CE term as T changes:

    loss = (1 - alpha) * base_loss(student, labels)
         + alpha * T^2 * mean_px KL( softmax(t/T) || softmax(s/T) )

TPU-first properties:
- The teacher forward runs INSIDE the jitted train step (train=False,
  running BN stats, stop_gradient) — one dispatch per step still; through
  this host's remote-TPU tunnel an eager teacher pass would cost a second
  ~50-100 ms round trip per step (the wall DESIGN §15 measured).
- The KL is a pure log_softmax contraction — no gathers (the slow op
  class on this backend, DESIGN §9) — and XLA fuses it into the student's
  loss reduction.
- Teacher params are closed over as jit constants: they ride to the device
  once at compile time and are never re-transferred per step.

The KL (not soft-CE) form is used so teacher==student gives exactly 0 —
the property tests/test_distill.py pins; both have identical student
gradients (they differ by the teacher entropy, a constant).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def kd_kl_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature: float = 2.0,
) -> jnp.ndarray:
    """Mean per-pixel T^2 * KL(softmax(teacher/T) || softmax(student/T)).

    Args:
      student_logits: [B, H, W, C] float logits (bf16 promoted to f32).
      teacher_logits: [B, H, W, C] teacher logits (already stop_gradient'd
        by the caller, or constants w.r.t. the differentiated params).
      temperature: softmax temperature T.
    """
    t = float(temperature)
    dtype = jnp.promote_types(student_logits.dtype, jnp.float32)
    slp = jax.nn.log_softmax(student_logits.astype(dtype) / t, axis=-1)
    tlp = jax.nn.log_softmax(teacher_logits.astype(dtype) / t, axis=-1)
    tp = jnp.exp(tlp)
    kl = jnp.sum(tp * (tlp - slp), axis=-1)  # [B,H,W]
    return jnp.mean(kl) * (t * t)


def make_distill_loss(
    base_loss: Callable,
    alpha: float,
    temperature: float,
    ignore_index: int = -1,
) -> Callable:
    """(student_logits, labels, teacher_logits) -> scalar combined loss.

    ``ignore_index`` >= 0 excludes those label pixels from the KD mean too
    (the base CE already excludes them — torch parity): the teacher was
    never supervised there, so its soft targets are unconstrained noise.
    """
    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError(f"distill alpha must be in (0, 1], got {a}")

    def loss(logits, labels, teacher_logits):
        if ignore_index >= 0:
            dtype = jnp.promote_types(logits.dtype, jnp.float32)
            t = float(temperature)
            slp = jax.nn.log_softmax(logits.astype(dtype) / t, axis=-1)
            tlp = jax.nn.log_softmax(
                teacher_logits.astype(dtype) / t, axis=-1
            )
            kl = jnp.sum(jnp.exp(tlp) * (tlp - slp), axis=-1)  # [B,H,W]
            valid = (labels != ignore_index).astype(dtype)
            kd = (
                jnp.sum(kl * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            ) * (t * t)
        else:
            kd = kd_kl_loss(logits, teacher_logits, temperature)
        if a >= 1.0:
            return kd  # pure soft targets; skip the dead CE computation
        return (1.0 - a) * base_loss(logits, labels) + a * kd

    return loss


def make_teacher_fn(model, variables) -> Callable:
    """Frozen-teacher forward for the train step: eval mode (running BN
    stats), stop_gradient. ``variables`` should be device-resident
    ({"params", "batch_stats"}); they become jit constants of the step."""

    def teacher_fn(images):
        return jax.lax.stop_gradient(
            model.apply(variables, images, train=False)
        )

    return teacher_fn
