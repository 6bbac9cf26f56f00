"""Async checkpointing (engine/checkpoint.py).

Saves overlap training on a background thread (Orbax AsyncCheckpointer) but
go through a hidden staging dir so an async OVERWRITE never has a window
with no committed checkpoint on disk (Orbax's own force=True rmtree's the
old dir in the blocking phase). These tests pin:
- save→restore consistency (same manager, overwrite-in-flight, fresh manager)
- promoted checkpoint dirs are SELF-CONTAINED (meta.json travels with them)
- construction-time crash recovery for every interruption point: committed
  staging not yet promoted, promote killed between its renames, half-written
  Orbax tmp dirs.
"""

import json
import shutil

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from visiondk_tpu.engine.checkpoint import CheckpointManager
from visiondk_tpu.engine.state import create_train_state


def _tiny_state(seed: float):
    variables = {
        "params": {
            "dense": {"kernel": jnp.full((8, 4), seed, jnp.float32),
                      "bias": jnp.zeros((4,), jnp.float32)},
        }
    }
    tx = optax.sgd(0.1, momentum=0.9)
    return create_train_state(variables, tx)


def _kernel(state):
    return np.asarray(state.params["dense"]["kernel"])


def test_async_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path)
    state = _tiny_state(1.5)
    mgr.save("last", state, epoch=3, best_fitness=0.25)
    restored, meta = mgr.restore("last", _tiny_state(0.0))
    assert meta == {"epoch": 3, "best_fitness": 0.25}
    np.testing.assert_array_equal(_kernel(restored), _kernel(state))


def test_async_overwrite_same_name(tmp_path):
    # Two back-to-back saves to "last" — the second may start while the
    # first's background write is in flight; the restore must see the second.
    mgr = CheckpointManager(tmp_path)
    mgr.save("last", _tiny_state(1.0), epoch=0, best_fitness=0.1)
    mgr.save("last", _tiny_state(2.0), epoch=1, best_fitness=0.2)
    restored, meta = mgr.restore("last", _tiny_state(0.0))
    assert meta["epoch"] == 1
    np.testing.assert_array_equal(_kernel(restored), np.full((8, 4), 2.0, np.float32))


def test_overwrite_never_leaves_a_missing_checkpoint(tmp_path):
    # The whole point of staging: once "last" exists, every instant of a
    # subsequent overwrite leaves a complete committed "last" on disk.
    mgr = CheckpointManager(tmp_path)
    mgr.save("last", _tiny_state(1.0), epoch=0, best_fitness=0.1)
    mgr.wait()
    assert (tmp_path / "last").exists()
    mgr.save("last", _tiny_state(2.0), epoch=1, best_fitness=0.2)
    # in-flight window: the PREVIOUS committed checkpoint must still be there
    assert (tmp_path / "last").exists()
    mgr.wait()
    _, meta = mgr.restore("last", _tiny_state(0.0))
    assert meta["epoch"] == 1


def test_fresh_manager_sees_committed_save(tmp_path):
    # Simulates resume in a new process: a second manager on the same dir.
    # The saving side joins its in-flight write before handoff — exactly what
    # the trainer's end-of-run ckpt.wait() does.
    mgr1 = CheckpointManager(tmp_path)
    mgr1.save("best", _tiny_state(3.0), epoch=7, best_fitness=0.9)
    mgr1.wait()
    mgr2 = CheckpointManager(tmp_path)
    assert mgr2.exists("best")
    restored, meta = mgr2.restore("best", _tiny_state(0.0))
    assert meta["epoch"] == 7
    np.testing.assert_array_equal(_kernel(restored), np.full((8, 4), 3.0, np.float32))


def test_promoted_dir_is_self_contained(tmp_path):
    # After the join point the checkpoint dir carries its own meta.json —
    # scp'ing just the dir to another host keeps restore working.
    mgr = CheckpointManager(tmp_path)
    mgr.save("best", _tiny_state(2.5), epoch=4, best_fitness=0.8)
    mgr.wait()
    assert json.loads((tmp_path / "best" / "meta.json").read_text())["epoch"] == 4
    assert not (tmp_path / "best.meta.json").exists()   # sidecar consumed
    moved = tmp_path / "elsewhere"
    moved.mkdir()
    shutil.copytree(tmp_path / "best", moved / "best")
    restored, meta = CheckpointManager(moved).restore("best", _tiny_state(0.0))
    assert meta["epoch"] == 4
    np.testing.assert_array_equal(_kernel(restored), np.full((8, 4), 2.5, np.float32))


def test_copied_dir_without_meta_degrades(tmp_path):
    # A checkpoint dir stripped of meta (hand-copied) still restores; the
    # cosmetic fields degrade instead of crashing CLI consumers. best_fitness
    # must degrade to a COMPARABLE value (NaN would make every later
    # `fitness > best_fitness` False and silently stop 'best' saves) and the
    # meta must flag itself so resume can warn.
    mgr = CheckpointManager(tmp_path)
    mgr.save("best", _tiny_state(1.0), epoch=2, best_fitness=0.5)
    mgr.wait()
    (tmp_path / "best" / "meta.json").unlink()
    restored, meta = mgr.restore("best", _tiny_state(0.0))
    assert meta["epoch"] == -1
    assert meta["best_fitness"] == 0.0 and meta["best_fitness"] == meta["best_fitness"]
    assert meta["meta_missing"] is True
    assert 0.7 > meta["best_fitness"]  # a real fitness still beats the degrade
    np.testing.assert_array_equal(_kernel(restored), np.full((8, 4), 1.0, np.float32))


def test_recovery_promotes_committed_staging(tmp_path):
    # Crash AFTER the background commit but BEFORE promote: a fresh manager
    # must find the staged data and promote it (meta stamped from sidecar).
    mgr = CheckpointManager(tmp_path)
    mgr.save("last", _tiny_state(5.0), epoch=6, best_fitness=0.6)
    mgr.wait()
    # reconstruct the pre-promote disk state by hand
    (tmp_path / "last").rename(tmp_path / ".last.staging")
    (tmp_path / ".last.staging" / "meta.json").unlink()
    (tmp_path / "last.meta.json").write_text(json.dumps({"epoch": 6, "best_fitness": 0.6}))
    mgr2 = CheckpointManager(tmp_path)
    assert (tmp_path / "last").exists()
    _, meta = mgr2.restore("last", _tiny_state(0.0))
    assert meta["epoch"] == 6


def test_recovery_restores_trashed_checkpoint(tmp_path):
    # Crash BETWEEN promote's two renames (old moved to trash, new staging
    # rename never ran — e.g. power loss at exactly that instant): the
    # trashed dir is the only complete checkpoint and must come back.
    mgr = CheckpointManager(tmp_path)
    mgr.save("last", _tiny_state(7.0), epoch=1, best_fitness=0.1)
    mgr.wait()
    (tmp_path / "last").rename(tmp_path / ".last.trash")
    mgr2 = CheckpointManager(tmp_path)
    assert (tmp_path / "last").exists()
    restored, _ = mgr2.restore("last", _tiny_state(0.0))
    np.testing.assert_array_equal(_kernel(restored), np.full((8, 4), 7.0, np.float32))


def test_recovery_drops_halfwritten_tmp(tmp_path):
    # Only a WRITER (the resuming trainer) may clean up crash garbage.
    (tmp_path / ".last.staging.orbax-checkpoint-tmp-123").mkdir(parents=True)
    CheckpointManager(tmp_path, writer=True)
    assert not (tmp_path / ".last.staging.orbax-checkpoint-tmp-123").exists()


def test_reader_leaves_inflight_tmp_alone(tmp_path):
    # A READER opening a possibly-live run dir (validate.py mid-train) must
    # NOT delete Orbax tmp dirs: one of them may be another process's
    # in-flight async save, and rmtree'ing it would break that trainer's
    # background commit and lose its checkpoint.
    tmp = tmp_path / ".last.staging.orbax-checkpoint-tmp-456"
    tmp.mkdir(parents=True)
    (tmp / "partial_data").write_text("in flight")
    CheckpointManager(tmp_path)  # default: reader
    assert tmp.exists()
    # end-to-end: a concurrent writer's save still commits afterwards
    mgr = CheckpointManager(tmp_path, writer=True)
    mgr.save("last", _tiny_state(9.0), epoch=0, best_fitness=0.1)
    mgr.wait()
    restored, _ = mgr.restore("last", _tiny_state(0.0))
    np.testing.assert_array_equal(_kernel(restored), np.full((8, 4), 9.0, np.float32))


def test_load_from_across_optimizer_shapes(tmp_path):
    # model.load_from must work when the NEW run's opt_state differs from the
    # saving run's (e.g. hyp.accumulate wraps it in MultiStepsState): the
    # trainer restores ONLY ema_params via partial restore.
    from visiondk_tpu.engine.trainer import CenterProcessor

    src = _tiny_state(6.0)
    mgr = CheckpointManager(tmp_path)
    mgr.save("best", src, epoch=0, best_fitness=1.0)
    mgr.wait()

    tx_acc = optax.MultiSteps(optax.sgd(0.1, momentum=0.9), every_k_schedule=4)
    dst = create_train_state(
        {"params": {"dense": {"kernel": jnp.zeros((8, 4), jnp.float32),
                              "bias": jnp.ones((4,), jnp.float32)}}},
        tx_acc,
    )

    cp = object.__new__(CenterProcessor)
    cp.task = "classification"

    class _Logger:
        def both(self, *a, **k):
            pass

    cp.logger = _Logger()

    class _Mesh:
        def is_primary(self):
            return True

    cp.mesh = _Mesh()
    out = cp._apply_load_from(dst, str(tmp_path / "best"))
    # ema_params of the source (fp32 copies of 6.0) landed in params
    np.testing.assert_array_equal(_kernel(out), np.full((8, 4), 6.0, np.float32))
    # the accumulate opt_state shape survived untouched
    assert hasattr(out.opt_state, "mini_step")
