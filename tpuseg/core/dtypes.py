"""Dtype policy: fp32 parameters, optionally bf16 compute.

TPU MXU native precision is bfloat16; the policy casts activations (and conv
inputs) to the compute dtype while keeping parameters, batch-norm statistics,
and the loss in float32. ``policy.cast(x)`` at module boundaries is the whole
API — XLA fuses the casts into the surrounding ops.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def cast(self, x):
        return x.astype(self.dtype) if x.dtype != self.dtype else x

    def cast_to_output(self, x):
        """Logits / losses always in float32."""
        return x.astype(jnp.float32) if x.dtype != jnp.float32 else x
