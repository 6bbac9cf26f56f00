"""Child process for tests/test_distributed_2proc.py — REAL multi-process
execution of the framework's distributed stack (no monkeypatching):
`parallel.mesh.initialize_distributed` env-var bring-up, global mesh build,
process-sharded train loader, SPMD train steps with gloo CPU collectives, and
the all-process Orbax save/restore barrier (trainer.py run_classifier save
path). The parent asserts shard disjointness/union and both exit codes.

Invoked as:  python tests/distributed_child.py <dataset_root> <run_dir> <out_json>
with env: VDK_COORDINATOR_ADDRESS / VDK_NUM_PROCESSES / VDK_PROCESS_ID,
JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2,
JAX_CPU_COLLECTIVES_IMPLEMENTATION=gloo (and PALLAS_AXON_POOL_IPS stripped —
the container's sitecustomize would otherwise dial the TPU tunnel).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    dataset_root, run_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]

    from visiondk_tpu.parallel import build_mesh, initialize_distributed

    assert initialize_distributed() is True  # env-var path (VDK_*)
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    from tests.test_e2e_classification import _cfgs

    cfgs = _cfgs(Path(dataset_root))
    cfgs["hyp"]["epochs"] = 2

    import jax.numpy as jnp

    from visiondk_tpu.engine import CenterProcessor

    mesh = build_mesh()  # 4 global devices (2 local × 2 processes), pure DP
    assert mesh.n_data == 4, mesh.mesh

    cp = CenterProcessor(
        cfgs, project=run_dir, train=True, mesh=mesh, compute_dtype=jnp.float32
    )

    # dump this process's REAL train shard (identical construction to
    # run_classifier's): disjointness + union checked by the parent
    loader = cp.data_processor.dataloader(
        "train", cp._local_bs(cfgs["data"]["train"]["bs"]), seed=cp.seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    loader.set_epoch(0)
    shard = [int(i) for i in loader._indices()]
    n_total = len(cp.data_processor.train_dataset)

    result = cp.run_classifier()

    # restore on ALL processes (orbax restore is a global operation): a
    # resume into an already-finished schedule restores state + meta and
    # exits the epoch loop immediately
    resumed = cp.run_classifier(resume="last")

    Path(out_json).write_text(json.dumps({
        "process": int(pid),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "shard": shard,
        "n_total": int(n_total),
        "local_bs": int(loader.batch_size),
        "steps_per_epoch": len(loader),
        "best_fitness": float(result["best_fitness"]),
        "resumed_best_fitness": float(resumed["best_fitness"]),
    }))


if __name__ == "__main__":
    main()
