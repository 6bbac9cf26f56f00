"""REAL 2-process distributed execution (VERDICT r4 missing #3): two
`jax.distributed.initialize`'d CPU processes (gloo collectives) run the actual
CenterProcessor train loop — exercising the mesh.py env-var bring-up, loader
shard disjointness/union-completeness (data/loader.py DataLoader._indices),
global-mesh SPMD train steps fed by `make_array_from_process_local_data`
(trainer._shard_batch), replicated eval, and the all-process Orbax
save/restore barrier (trainer.py save path). The prior coverage monkeypatched
`jax.process_count` (tests/test_mesh.py); this spawns real processes.

Reference contract being matched: torchrun + init_process_group +
DistributedSampler (reference main.py:39-40, engine/vision_engine.py:238).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from tests.test_e2e_classification import _make_dataset

pytestmark = pytest.mark.slow  # ~2-4 min: two full CPU training subprocesses


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    root = _make_dataset(tmp_path / "data")
    run_dir = tmp_path / "run"
    port = _free_port()
    repo = Path(__file__).parent.parent

    procs, outs = [], []
    for pid in range(2):
        env = dict(os.environ)
        # the container's sitecustomize dials the TPU tunnel when this is
        # set — children must be CPU-only (CLAUDE.md: one tunnel client)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_CPU_COLLECTIVES_IMPLEMENTATION": "gloo",
            "VDK_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "VDK_NUM_PROCESSES": "2",
            "VDK_PROCESS_ID": str(pid),
        })
        out_json = tmp_path / f"out_{pid}.json"
        outs.append(out_json)
        procs.append(subprocess.Popen(
            [sys.executable, str(repo / "tests" / "distributed_child.py"),
             str(root), str(run_dir), str(out_json)],
            env=env, cwd=str(repo),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))

    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process distributed run timed out (deadlock?)")
        logs.append(log)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"process {pid} failed:\n{log[-4000:]}"

    r0, r1 = (json.loads(o.read_text()) for o in outs)
    assert r0["global_devices"] == r1["global_devices"] == 4
    assert r0["local_devices"] == r1["local_devices"] == 2

    # loader shards: disjoint, union-complete (DistributedSampler parity)
    s0, s1 = set(r0["shard"]), set(r1["shard"])
    assert s0.isdisjoint(s1), s0 & s1
    assert s0 | s1 == set(range(r0["n_total"]))
    # same #batches on every host (no collective can hang on a tail batch)
    assert r0["steps_per_epoch"] == r1["steps_per_epoch"] > 0
    # global bs 16 over 2 processes → 8 rows fed per host per step
    assert r0["local_bs"] == r1["local_bs"] == 8

    # identical training result on both hosts (replicated eval + state), and
    # the all-process restore returned the same fitness it saved
    assert r0["best_fitness"] == r1["best_fitness"] > 0
    assert r0["resumed_best_fitness"] == r0["best_fitness"]
    assert r1["resumed_best_fitness"] == r1["best_fitness"]

    # primary-only artifacts exist exactly once in the shared run dir
    assert (run_dir / "last").exists() and (run_dir / "best").exists()
    assert (run_dir / "class_indices.json").exists()
