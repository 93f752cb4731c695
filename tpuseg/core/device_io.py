"""Remote-latency-aware device IO for parameter trees.

Through a remote-TPU tunnel (this container's axon backend) every dispatch
and every per-leaf transfer costs a ~50-100 ms round trip, so the two
obvious ways to put model state on the device are pathologically slow:

- eager ``model.init(...)`` on the device is hundreds of tiny op
  dispatches — measured minutes of pure round-trip overhead;
- ``jax.device_put(tree)`` issues one RPC per leaf — measured 526 s for
  the ~320-leaf MobileNetV2UNet tree.

``init_on_host`` runs init as ONE jitted program on the host CPU backend
(compiled once, persisted by the XLA compilation cache when enabled);
``device_put_packed`` ships a tree as one flat host buffer per dtype and
rebuilds it on device with a trivial cached slice+reshape program. The
combined effect on bench.py's warm path: 15m39s -> 39s (docs/DESIGN.md).

On a local-PCIe TPU VM these helpers are harmless: they reduce to one DMA
plus one tiny program instead of many small DMAs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def host_cpu_device():
    """The host CPU device, or None when the cpu backend is unavailable
    (e.g. JAX_PLATFORMS pinned to a single non-cpu platform and the
    backend is already initialized)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def ensure_cpu_backend() -> bool:
    """Best-effort: make the cpu backend available ALONGSIDE the
    env-selected default platform (kept first, so default placement is
    unchanged). Must run before the backend initializes to have any
    effect; afterwards it reports whether cpu is available."""
    if host_cpu_device() is not None:
        return True
    current = os.environ.get("JAX_PLATFORMS", "")
    if current and "cpu" not in current.split(","):
        try:
            jax.config.update("jax_platforms", current + ",cpu")
        except Exception:
            return False
    return host_cpu_device() is not None


def init_on_host(init_fn, *args):
    """Run a model/param init as ONE jitted program on the host CPU and
    return the tree as host numpy arrays (uncommitted — free to transfer
    anywhere). Falls back to the default device when no cpu backend
    exists. ``args`` must be jit-traceable (e.g. a PRNG key)."""
    cpu = host_cpu_device()
    if cpu is None:
        # No cpu backend: still run as ONE jitted program (eager init on a
        # remote device costs a tunnel round trip per op), then fetch the
        # tree in one pass.
        return jax.tree.map(np.asarray, jax.jit(init_fn)(*args))
    with jax.default_device(cpu):
        return jax.tree.map(np.asarray, jax.jit(init_fn)(*args))


def device_put_packed(tree: Any, device=None, sharding=None) -> Any:
    """Transfer a pytree in ONE buffer per dtype instead of one RPC per
    leaf.

    ``device``: target device (default: the default device). ``sharding``:
    a ``jax.sharding.Sharding`` applied to every output leaf instead (e.g.
    replicated over a mesh) — the flat buffers are transferred with that
    sharding restricted to one dimension, then the unpack program emits
    leaves with the requested sharding.
    """
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    # Already placed as requested? Skip — np.asarray below would otherwise
    # FETCH device leaves back to host (a round trip per leaf).
    if all(isinstance(l, jax.Array) for l in leaves):
        if sharding is not None:
            if all(l.sharding == sharding for l in leaves):
                return tree
        else:
            target = device if device is not None else jax.devices()[0]
            if all(
                len(l.devices()) == 1 and next(iter(l.devices())) == target
                for l in leaves
            ):
                return tree
    order = {}  # np.dtype -> leaf indices, insertion-ordered
    host_leaves = []
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        host_leaves.append(arr)
        order.setdefault(arr.dtype, []).append(i)
    flats = [
        np.concatenate([np.ravel(host_leaves[i]) for i in idxs])
        for idxs in order.values()
    ]

    def unpack(*packed):
        out = [None] * len(leaves)
        for flat, idxs in zip(packed, order.values()):
            off = 0
            for i in idxs:
                n = int(np.prod(host_leaves[i].shape, dtype=np.int64))
                out[i] = flat[off:off + n].reshape(host_leaves[i].shape)
                off += n
        return jax.tree.unflatten(treedef, out)

    if sharding is not None:
        dev_flats = jax.device_put(flats, _flat_sharding(sharding))
        fn = jax.jit(unpack, out_shardings=sharding)
    else:
        dev_flats = jax.device_put(
            flats, device if device is not None else jax.devices()[0]
        )
        fn = jax.jit(unpack)
    return fn(*dev_flats)


def _flat_sharding(sharding):
    """A 1-D-compatible variant of ``sharding`` for the packed buffers.

    Replicated NamedSharding/SingleDeviceSharding already work for any
    rank; a sharded spec is reduced to replication (the unpack program
    re-shards its outputs per the requested sharding anyway)."""
    from jax.sharding import NamedSharding, PartitionSpec

    if isinstance(sharding, NamedSharding) and sharding.spec != PartitionSpec():
        return NamedSharding(sharding.mesh, PartitionSpec())
    return sharding


def init_variables_on_host(model, height: int, width: int) -> dict:
    """{"params", "batch_stats"} for a segmentation model, initialized as
    ONE host-side program (the shared init_fn of the CLI tools)."""
    import jax.numpy as jnp

    from tpuseg.models.registry import validate_input_size

    validate_input_size(model, height, width)

    def _init():
        v = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, height, width, 3)),
            train=False,
        )
        return {"params": v["params"], "batch_stats": v.get("batch_stats", {})}

    return init_on_host(_init)
