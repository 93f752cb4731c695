"""Device mesh construction and sharding helpers.

The reference is single-process single-device (its whole "backend" is the
cuda->mps->cpu fallback at main.py:13-21). The TPU-native equivalent is a
``jax.sharding.Mesh`` with named axes and XLA collectives over ICI:

- ``data``   : data parallelism — the global batch is sharded here; gradient
               all-reduce is a ``psum`` inserted by XLA.
- ``spatial``: optional sharding of the image-height dim for large-frame
               inference; XLA's SPMD partitioner inserts the conv halo
               exchanges automatically.

Multi-host (DCN) extends the same mesh via ``jax.distributed.initialize``;
nothing in the model or train step changes — that is the point of pjit.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "spatial")


def local_device_kind() -> str:
    """Human-readable device kind, mirroring the reference's device banner."""
    d = jax.devices()[0]
    return f"{d.platform}:{d.device_kind} x{jax.device_count()}"


def create_mesh(
    data: int = -1,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-axis ("data", "spatial") mesh over available devices.

    ``data=-1`` takes all remaining devices. Works identically on one real
    TPU chip, a pod slice, or a CPU host with
    ``XLA_FLAGS=--xla_force_host_platform_device_count=N`` (the test path).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spatial <= 0:
        spatial = 1
    if data == -1:
        if n % spatial != 0:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        data = n // spatial
    if data * spatial > n:
        raise ValueError(
            f"mesh {data}x{spatial} needs {data * spatial} devices, have {n}"
        )
    grid = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(grid, MESH_AXES)


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for a batch tensor: batch dim on "data" (optionally an image
    dim on "spatial")."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    if spatial_dim == 0:
        # would silently overwrite the "data" entry and drop data
        # parallelism (every data-axis device recomputing the full batch)
        raise ValueError("spatial_dim must be >= 1 (dim 0 is the batch)")
    spec = [None] * (spatial_dim + 1)
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX when launched under a multi-process runtime.

    No-op in single-process runs; controlled by standard JAX env vars
    (``JAX_COORDINATOR_ADDRESS`` etc.). Kept separate so unit tests never
    touch it.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
