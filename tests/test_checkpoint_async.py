"""Async checkpointing (engine/checkpoint.py).

Saves overlap training on a background thread (Orbax AsyncCheckpointer);
these tests pin the consistency contract: a save followed immediately by a
restore (same or fresh manager) sees the committed data, repeated saves to
the same name overwrite cleanly, and the pre-async on-disk layout
(meta.json inside the checkpoint dir) still restores.
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


def test_legacy_meta_layout_restores(tmp_path):
    # Pre-async checkpoints kept meta.json INSIDE the checkpoint dir.
    mgr = CheckpointManager(tmp_path, async_save=False)
    mgr.save("last", _tiny_state(4.0), epoch=5, best_fitness=0.5)
    sidecar = tmp_path / "last.meta.json"
    legacy = tmp_path / "last" / "meta.json"
    shutil.move(sidecar, legacy)
    restored, meta = mgr.restore("last", _tiny_state(0.0))
    assert meta["epoch"] == 5
    np.testing.assert_array_equal(_kernel(restored), np.full((8, 4), 4.0, np.float32))


def test_sidecar_wins_over_stale_legacy(tmp_path):
    # If both exist (resave over a legacy run dir), the sidecar is current.
    mgr = CheckpointManager(tmp_path)
    mgr.save("last", _tiny_state(1.0), epoch=9, best_fitness=0.9)
    mgr.wait()
    (tmp_path / "last" / "meta.json").write_text(json.dumps({"epoch": 0, "best_fitness": 0.0}))
    _, meta = mgr.restore("last", _tiny_state(0.0))
    assert meta["epoch"] == 9
