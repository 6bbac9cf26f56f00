"""Checkpoint / resume.

Parity with the reference's two formats (SURVEY §5.4):
- classification ``last.pt``/``best.pt`` every epoch with
  {epoch, best_fitness, model, ema, updates, optimizer, scheduler, scaler}
  (engine/vision_engine.py:386-403);
- embedding ``Epoch_N`` backbone-only + fitness (train.py:264-278);
- ``load_from`` non-strict fine-tune load logging missing/unexpected keys
  (vision_engine.py:300-310).

TPU-native: Orbax PyTree checkpointing of the whole TrainState + host
metadata. Saves are ASYNC by default: the device→host fetch is synchronous
(it must be — the arrays are needed consistent), but serialization to disk
happens on a background thread while training continues; Orbax's
tmp-dir + atomic-rename commit means a crash mid-save never leaves a
half-written checkpoint looking valid. ``wait()`` (called automatically
before any restore and by the trainer at run end) joins the in-flight save.
Restore reconstructs the exact pytree structure from a template state.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from visiondk_tpu.engine.state import TrainState


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, directory, async_save: bool = True):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()

    def wait(self) -> None:
        """Join any in-flight async save (no-op for the sync checkpointer)."""
        fn = getattr(self._ckptr, "wait_until_finished", None)
        if fn is not None:
            fn()

    # ------------------------------------------------------------ full state

    def save(
        self,
        name: str,
        state: TrainState,
        epoch: int,
        best_fitness: float,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        path = self.directory / name
        # AsyncCheckpointer.save returns once the host copy is snapshotted
        # (and itself joins any previous in-flight save); the disk write
        # overlaps the next epoch's compute.
        self._ckptr.save(path, _to_host(state), force=True)
        meta = {"epoch": epoch, "best_fitness": float(best_fitness)}
        if extra:
            meta.update(extra)
        # Sidecar, NOT inside `path`: the checkpoint dir only appears on
        # Orbax's atomic commit, which may be in flight at this point.
        with open(self.directory / f"{name}.meta.json", "w") as f:
            json.dump(meta, f)

    def _read_meta(self, name: str) -> Dict[str, Any]:
        sidecar = self.directory / f"{name}.meta.json"
        legacy = self.directory / name / "meta.json"   # pre-async layout
        with open(sidecar if sidecar.exists() else legacy) as f:
            return json.load(f)

    def restore(self, name: str, template: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
        self.wait()
        path = self.directory / name
        restored = self._ckptr.restore(path, item=_to_host(template))
        meta = self._read_meta(name)
        state = jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r), template, restored)
        return state, meta

    def restore_partial(self, name: str, template: Dict[str, Any]) -> Dict[str, Any]:
        """Restore only the keys present in ``template`` (e.g. params/ema
        without the optimizer state — the teacher-loading path, where the
        saving run's optimizer is unknown)."""
        self.wait()
        path = self.directory / name
        restored = self._ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(item=_to_host(template), partial_restore=True),
        )
        return jax.tree_util.tree_map(
            lambda t, r: jax.numpy.asarray(r), template, restored
        )

    def exists(self, name: str) -> bool:
        self.wait()
        return (self.directory / name).exists()

    # ------------------------------------------------------------ fine-tune

    @staticmethod
    def load_from(
        params: Any, pretrained_params: Any, logger=None, prefix: str = ""
    ) -> Any:
        """Non-strict merge: copy matching-path/shape leaves from pretrained
        into params; log missing/unexpected (vision_engine.py:300-310)."""
        flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
        flat_l = dict(jax.tree_util.tree_flatten_with_path(pretrained_params)[0])
        loaded, missing, mismatched = [], [], []
        new_flat = {}
        for path, leaf in flat_p.items():
            if path in flat_l and flat_l[path].shape == leaf.shape:
                new_flat[path] = jax.numpy.asarray(flat_l[path], leaf.dtype)
                loaded.append(path)
            elif (
                path in flat_l
                and getattr(path[-1], "key", None) == "weight"
                and flat_l[path].ndim == leaf.ndim == 2
                and flat_l[path].shape[0] == leaf.shape[0]
                and flat_l[path].shape[1] < leaf.shape[1]
            ):
                # class-dim-padded margin head (heads.MarginHead pads columns
                # to lcm(128, n_model)): graft an UNPADDED checkpoint's real
                # columns; pad columns keep their init (they're logit-masked)
                src = jax.numpy.asarray(flat_l[path], leaf.dtype)
                new_flat[path] = leaf.at[:, : src.shape[1]].set(src)
                loaded.append(path)
            else:
                new_flat[path] = leaf
                (mismatched if path in flat_l else missing).append(path)
        unexpected = [p for p in flat_l if p not in flat_p]
        if logger is not None:
            logger.both(
                f"{prefix}load_from: loaded {len(loaded)} tensors, "
                f"missing {len(missing)}, shape-mismatch {len(mismatched)}, "
                f"unexpected {len(unexpected)}"
            )
        treedef = jax.tree_util.tree_structure(params)
        paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
        return jax.tree_util.tree_unflatten(treedef, [new_flat[p] for p in paths])
