"""Checkpoint / resume.

Parity with the reference's two formats (SURVEY §5.4):
- classification ``last.pt``/``best.pt`` every epoch with
  {epoch, best_fitness, model, ema, updates, optimizer, scheduler, scaler}
  (engine/vision_engine.py:386-403);
- embedding ``Epoch_N`` backbone-only + fitness (train.py:264-278);
- ``load_from`` non-strict fine-tune load logging missing/unexpected keys
  (vision_engine.py:300-310).

TPU-native: Orbax PyTree checkpointing of the whole TrainState + host
metadata. Saves are ASYNC by default — the device→host fetch is synchronous
(the arrays must be snapshotted consistent), then disk serialization runs on
a background thread while training continues.

Crash-safety contract (why saves go through a STAGING directory): Orbax's
``save(path, force=True)`` rmtree's an existing ``path`` in its *blocking*
phase and only renames the replacement in at the *background* commit — for
an async overwrite of ``last/`` that would leave NO valid checkpoint on disk
for the whole overlapped window. Instead each save writes to a hidden
``.{name}.staging`` dir (its own tmp-dir + atomic rename inside Orbax), and
``_promote`` — run at every join point (``wait()``, before any restore, at
manager construction for crash recovery) — stamps ``meta.json`` inside and
swaps it into place with two renames. At every instant either the old or the
new fully-committed checkpoint exists under a recoverable name, and a
promoted checkpoint dir is self-contained (meta travels with it).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from visiondk_tpu.engine.state import TrainState

_STAGE = ".{}.staging"
_TRASH = ".{}.trash"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _fs_primary() -> bool:
    """Multihost: only process 0 performs the promote/recovery renames
    (orbax's commit is already primary-finalized; concurrent renames from
    every host would race on a shared filesystem). Single-process: True."""
    try:
        return jax.process_index() == 0
    except Exception:
        return True


class CheckpointManager:
    def __init__(self, directory, async_save: bool = True, writer: bool = False):
        """``writer``: this manager owns the run directory and may perform
        destructive crash recovery (deleting half-written Orbax tmp dirs).
        Readers — validate/export/predict CLIs opening a possibly-live run
        dir — must leave tmp dirs alone: a concurrently-training process's
        in-flight async save lives in one, and deleting it would make that
        trainer's background commit fail and lose its checkpoint."""
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()
        self._pending: set = set()
        self._writer = bool(writer)
        self._recover_staged()

    # -------------------------------------------------- staging / promotion

    def _stage_path(self, name: str) -> Path:
        return self.directory / _STAGE.format(name)

    def _recover_staged(self) -> None:
        """Crash recovery at construction: promote committed-but-unpromoted
        staging dirs, drop half-written Orbax tmp dirs and leftover trash."""
        if not _fs_primary():
            return
        if self._writer:
            # writer-only: a READER constructed mid-train (validate.py etc.)
            # must not delete the live trainer's in-flight async-save tmp dir
            for pat in ("*.orbax-checkpoint-tmp-*", ".*.orbax-checkpoint-tmp-*"):
                for p in self.directory.glob(pat):
                    shutil.rmtree(p, ignore_errors=True)
        for p in self.directory.glob(_TRASH.format("*")):
            name = p.name[1 : -len(".trash")]
            if (
                not (self.directory / name).exists()
                and not self._stage_path(name).exists()
            ):
                # promote died between its two renames with no newer staged
                # copy left — the trashed dir is the only complete checkpoint
                p.rename(self.directory / name)
            else:
                shutil.rmtree(p, ignore_errors=True)
        for p in self.directory.glob(_STAGE.format("*")):
            name = p.name[1 : -len(".staging")]
            self._promote(name)

    def _promote(self, name: str) -> None:
        """Move a committed staging dir into place: stamp meta inside (the
        dir becomes self-contained), rename old→trash, staging→final, drop
        trash. A crash between any two steps leaves a complete checkpoint
        under ``name``, ``.{name}.staging``, or ``.{name}.trash`` — all of
        which construction-time recovery or ``_read_meta`` can reach."""
        staging = self._stage_path(name)
        self._pending.discard(name)
        if not _fs_primary() or not staging.exists():
            return
        sidecar = self.directory / f"{name}.meta.json"
        if sidecar.exists():
            shutil.copyfile(sidecar, staging / "meta.json")
        final = self.directory / name
        trash = self.directory / _TRASH.format(name)
        shutil.rmtree(trash, ignore_errors=True)
        try:
            if final.exists():
                final.rename(trash)
            staging.rename(final)
        except OSError:
            # another manager on the same run dir promoted concurrently
            # (e.g. validate.py opened mid-train); their promote committed
            # the same staged data — nothing left to do
            return
        shutil.rmtree(trash, ignore_errors=True)
        sidecar.unlink(missing_ok=True)

    def wait(self) -> None:
        """Join in-flight async saves and promote them into place. Called
        automatically before any restore and by the trainer at run end."""
        fn = getattr(self._ckptr, "wait_until_finished", None)
        if fn is not None:
            fn()
        for name in sorted(self._pending):
            self._promote(name)

    # ------------------------------------------------------------ full state

    def save(
        self,
        name: str,
        state: TrainState,
        epoch: int,
        best_fitness: float,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        meta = {"epoch": epoch, "best_fitness": float(best_fitness)}
        if extra:
            meta.update(extra)
        if name in self._pending:
            # previous save of this name still in flight: join + promote so
            # the staging slot frees up (AsyncCheckpointer would serialize
            # the writes anyway — this just keeps the promote bookkeeping
            # one-deep per name)
            fn = getattr(self._ckptr, "wait_until_finished", None)
            if fn is not None:
                fn()
            self._promote(name)
        staging = self._stage_path(name)
        # Filesystem mutations are PRIMARY-ONLY: save() runs on every process
        # (orbax's commit barriers require it), but on a shared FS a
        # non-primary rmtree/sidecar-write is unordered w.r.t. the primary's
        # promote renames and can destroy the staging dir mid-rename.
        if _fs_primary():
            shutil.rmtree(staging, ignore_errors=True)  # stale crash leftover
            # meta sidecar BEFORE the save: construction-time recovery of a
            # committed staging dir can then always stamp the right meta in.
            with open(self.directory / f"{name}.meta.json", "w") as f:
                json.dump(meta, f)
        # AsyncCheckpointer.save returns once the host copy is snapshotted;
        # the disk write overlaps the next epoch's compute.
        self._ckptr.save(staging, _to_host(state))
        self._pending.add(name)
        if not isinstance(self._ckptr, ocp.AsyncCheckpointer):
            self._promote(name)  # sync save: committed on return, as before

    def _read_meta(self, name: str) -> Dict[str, Any]:
        indir = self.directory / name / "meta.json"     # self-contained (promoted)
        sidecar = self.directory / f"{name}.meta.json"  # in-flight / recovery
        path = indir if indir.exists() else sidecar
        if not path.exists():
            # copied-without-meta dir (e.g. scp'd to a serving host): the CLI
            # consumers only display these fields — degrade, don't crash.
            # best_fitness must stay comparable (NOT NaN: `fitness > nan` is
            # always False and would silently stop 'best' saves on resume);
            # "meta_missing" lets the resume path warn loudly.
            return {"epoch": -1, "best_fitness": 0.0, "meta_missing": True}
        with open(path) as f:
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
        without the optimizer state — the teacher-loading and load_from
        paths, where the saving run's optimizer is unknown)."""
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
        params: Any,
        pretrained_params: Any,
        logger=None,
        prefix: str = "",
        head_classes: Optional[int] = None,
    ) -> Any:
        """Non-strict merge: copy matching-path/shape leaves from pretrained
        into params; log missing/unexpected (vision_engine.py:300-310).

        ``head_classes``: the margin head's REAL (unpadded) class count.
        Only a 2-D ``weight`` whose checkpoint has exactly this many columns
        is grafted into a wider (class-padded) target — without the anchor,
        any narrower checkpoint (e.g. a 1,000-class head loaded into a
        misconfigured 58k-class run) would silently 'load'."""
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
                and head_classes is not None
                and getattr(path[-1], "key", None) == "weight"
                and flat_l[path].ndim == leaf.ndim == 2
                and flat_l[path].shape[0] == leaf.shape[0]
                and flat_l[path].shape[1] == head_classes
                and leaf.shape[1] > head_classes
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
