"""Spatial parallelism: image-height sharding with explicit halo exchange.

SURVEY.md §5.7: the reference has no sequence/context parallelism to mirror
(conv net, no attention); the honest spatial analogue for very large frames
is sharding H across devices. Two routes exist:

1. GSPMD (default): annotate the H dim with the "spatial" mesh axis and let
   XLA insert conv halo exchanges automatically — used by the train step
   (tpuseg.train.train_step make_train_step(spatial=True)).
2. shard_map + explicit halos (this module): each device holds an H-slab,
   exchanges ``halo`` boundary rows with its neighbors over ICI via
   ``jax.lax.ppermute``, runs the model on the padded slab, and crops. This
   is the manual, collective-explicit formulation — useful when the model is
   run per-slab (e.g. giant-frame inference where GSPMD's propagation is
   suboptimal) and as the reference implementation validating route 1.

Exactness contract (validated in tests/test_parallel.py on an 8-device CPU
mesh): with ``halo`` >= the model's receptive-field half-width,

    spatial_shard_apply(fn)(x) == crop(fn(zero_pad_H(x, halo)))

i.e. INTERIOR slab boundaries are bit-exact against the unsharded forward;
the outermost ``RF`` rows of the global frame see a single input-level zero
extension instead of per-layer 'SAME' padding (a one-shot halo cannot
reproduce per-layer padding — route 1/GSPMD does that when edge-exactness
matters). For giant-frame inference the affected border rows are noise.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad an H-slab [B, h_local, W, C] with ``halo`` rows from both ring
    neighbors (zero rows at the global edges).

    Uses two ``ppermute`` shifts over the mesh axis — pure ICI traffic.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_rows = x[:, :halo]        # my first rows -> previous device's bottom halo
    bot_rows = x[:, -halo:]       # my last rows  -> next device's top halo

    # receive from neighbor above: their bottom rows
    from_above = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # receive from neighbor below: their top rows
    from_below = jax.lax.ppermute(
        top_rows, axis_name, [((i + 1) % n, i) for i in range(n)]
    )
    zeros = jnp.zeros_like(top_rows)
    from_above = jnp.where(idx == 0, zeros, from_above)
    from_below = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=1)


def spatial_shard_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    halo: int,
    downscale: int = 1,
    axis_name: str = "spatial",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Wrap ``fn`` (NHWC -> NHWC, H-preserving up to ``downscale``) to run
    H-sharded over ``axis_name`` with explicit halo exchange.

    ``downscale`` is fn's total H reduction factor (1 for the segmentation
    models here, which return full-resolution logits). ``halo`` must be a
    multiple of ``downscale``.
    """
    if halo % downscale:
        raise ValueError(f"halo {halo} not a multiple of downscale {downscale}")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(None, axis_name),
    )
    def sharded(x_slab):
        padded = halo_exchange(x_slab, halo, axis_name)
        out = fn(padded)
        h_out = out.shape[1]
        crop = halo // downscale
        return out[:, crop : h_out - crop]

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        sharding = NamedSharding(mesh, P(None, axis_name))
        return sharded(jax.device_put(x, sharding))

    return apply
