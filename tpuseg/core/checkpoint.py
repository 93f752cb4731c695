"""Async, step-tagged checkpointing (Orbax) with resume.

The reference saves only ``model.state_dict()`` once per epoch and has no
resume path (src/train.py:77; consumers hard-code epoch files at
inference.py:24 / convert.py:23). Here a checkpoint is the full training
state — params, BatchNorm statistics, optimizer state, step counter, and the
data-pipeline RNG position — saved asynchronously so the TPU never waits on
the filesystem, with a retention policy, plus ``latest_step()`` for resume
(SURVEY.md §5.3/§5.4: preemption safety comes from frequent async saves).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for one state pytree."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 5,
        async_save: bool = True,
    ):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        # register the handler up front: a FRESH manager can then serve
        # item_metadata()/restore() without having saved first (otherwise
        # orbax cannot infer the item type and saved_keys returns None)
        self._mgr = ocp.CheckpointManager(
            directory, options=options,
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        # Overwrite-on-collision: a step can legitimately already exist —
        # a SIGTERM that lands exactly after an epoch's final dispatch group
        # saves step N, and the boundary-resume epoch-end then saves N again;
        # re-running into a stale checkpoint_dir without --train.resume hits
        # the old run's steps. Orbax raises StepAlreadyExistsError for both;
        # the current state is the truth, so replace the stale step (silently
        # skipping would leave best/ pointing at old-run params).
        try:
            return self._mgr.save(
                step, args=ocp.args.StandardSave(state), force=force
            )
        except ocp.checkpoint_manager.StepAlreadyExistsError:
            self._mgr.wait_until_finished()
            self._mgr.delete(step)
            return self._mgr.save(
                step, args=ocp.args.StandardSave(state), force=force
            )

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        """Restore ``step`` (default: latest). ``template`` is an abstract or
        concrete pytree with the target structure/shardings."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        if template is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract)
            )
        return self._mgr.restore(step)

    def restore_host(self, step: Optional[int] = None) -> Any:
        """Restore ``step`` as HOST-resident arrays, regardless of the
        device topology the checkpoint was saved under.

        A plain ``restore()`` without a template replays the SAVED
        shardings, so a checkpoint written on an N-device mesh refuses to
        load in an M-device process (orbax: "available devices are
        different from the devices used to save") — exactly the serving
        path: train on a pod, serve on one chip. Found live in round 5
        when the single-TPU video pipeline tried to serve the repo's
        8-CPU-device rehearsal checkpoint. The template is built from the
        checkpoint's OWN metadata (shape/dtype only, no shardings), so the
        result is topology-free; serving callers then ship it with
        ``device_put_packed`` (one transfer — the CLAUDE.md device-IO
        rule), which is what they already did.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        meta = self._mgr.item_metadata(step)
        tree = meta.tree if hasattr(meta, "tree") else meta

        # orbax requires a CONCRETE sharding per leaf (an abstract leaf
        # falls back to the saved sharding file — the very thing that
        # breaks across topologies): one host-CPU device, always present
        from tpuseg.core.device_io import ensure_cpu_backend

        ensure_cpu_backend()
        host = jax.local_devices(backend="cpu")[0]
        sharding = jax.sharding.SingleDeviceSharding(host)

        def abstract(m):
            import numpy as np

            return jax.ShapeDtypeStruct(
                tuple(m.shape), np.dtype(m.dtype), sharding=sharding
            )

        template = jax.tree.map(abstract, tree)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        import numpy as np

        return jax.tree.map(np.asarray, restored)

    def saved_keys(self, step: Optional[int] = None, subtree=()) -> Optional[set]:
        """Key set of the saved pytree (optionally of a nested dict subtree),
        read from Orbax metadata WITHOUT restoring — lets callers build a
        restore template that matches what was actually saved (e.g. a
        checkpoint written with/without an EMA tree). None when the step or
        metadata is unavailable."""
        try:
            if step is None:
                step = self.latest_step()
            tree = self._mgr.item_metadata(step).tree
            for k in subtree:
                tree = tree[k]
            return set(tree.keys())
        except Exception:
            return None

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def wait(self):
        """Block until in-flight async saves are durable."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        self.close()
