"""Loss functions.

The reference trains with ``nn.CrossEntropyLoss()`` (main.py:99) on logits
[B, 10, H, W] vs int targets [B, H, W] — i.e. mean over every pixel of
-log_softmax(logits)[target], no ignore_index, no class weights. Exactly that,
in NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean per-pixel softmax cross-entropy.

    Args:
      logits: [B, H, W, C] float logits.
      targets: [B, H, W] int class indices.
    Returns a scalar loss (parity with torch CrossEntropyLoss default
    'mean' reduction over all pixels). Computed in at least float32:
    bf16 logits are promoted, float64 logits (parity tests under x64)
    stay float64.
    """
    dtype = jnp.promote_types(logits.dtype, jnp.float32)
    logits = logits.astype(dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction, NOT take_along_axis: gathers (and their scatter
    # transpose in backward) are the slow path on this backend — the same
    # op class behind the round-1 inference regression. XLA fuses the
    # compare+select+reduce into one pass over logp.
    onehot = jax.nn.one_hot(
        targets.astype(jnp.int32), logits.shape[-1], dtype=dtype
    )
    return -jnp.mean(jnp.sum(logp * onehot, axis=-1))
