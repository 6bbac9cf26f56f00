"""Device mesh + sharding: the TPU-native replacement for the reference's
entire distributed stack.

The reference distributes with torchrun + NCCL ``init_process_group``
(main.py:39-40), ``DistributedDataParallel`` (engine/vision_engine.py:312-313),
``DistributedSampler`` (:238) and SyncBN (main.py:57-60). Here all of that is a
single ``jax.sharding.Mesh`` with two logical axes:

- ``data``  — batch dimension sharding (DP). Gradient averaging is implicit:
  ``jit`` over batch-sharded inputs inserts the ``psum`` XLA collective over
  ICI where DDP would run an NCCL all-reduce.
- ``model`` — class-dimension sharding for the margin-softmax heads
  (partial-FC style). The reference's ArcFace weight is [feat_dim, num_class]
  with num_class up to 58,671 (configs/faceX/face.yaml:34) — the one component
  where model parallelism pays off.

Rank-0-only host work (logging, checkpoints) maps to
``jax.process_index() == 0``.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ------------------------------------------------------------- current mesh
#
# Pallas kernels inside a *sharded* jit break the SPMD partitioner unless the
# pallas_call is wrapped in a shard_map over the mesh. The model layers are
# pure flax modules with no mesh argument, so the active mesh is published
# here (by CenterProcessor / the driver entry) and read at trace time by the
# layers that own kernels (models/layers.py Attention).

_current_mesh: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _current_mesh
    _current_mesh = mesh


def current_mesh() -> Optional[Mesh]:
    return _current_mesh


@contextlib.contextmanager
def with_current_mesh(mesh: Optional[Mesh]):
    global _current_mesh
    prev = _current_mesh
    _current_mesh = mesh
    try:
        yield
    finally:
        _current_mesh = prev


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A mesh plus the canonical shardings used by the train/eval steps."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    @property
    def n_model(self) -> int:
        return self.mesh.shape["model"]

    @property
    def batch(self) -> NamedSharding:
        """Batch dim sharded over data axis (images: [B, H, W, C], labels: [B, ...])."""
        return NamedSharding(self.mesh, P("data"))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def class_dim(self) -> NamedSharding:
        """Margin-head weight [feat_dim, num_class]: shard classes over model axis."""
        return NamedSharding(self.mesh, P(None, "model"))

    def is_primary(self) -> bool:
        return jax.process_index() == 0

    def check_replicated_eval(self, shuffle: bool = False,
                              process_sharded: bool = False, logger=None) -> None:
        """Multi-host eval stance: evaluation is REPLICATED — every process
        runs the identical full eval pass (deterministic, unsharded loaders),
        and only the primary writes artifacts.

        Why not primary-only: with a live multi-host mesh the eval/embed steps
        compile as global SPMD programs (the fused kernels shard_map over it),
        so every process must participate in the same computation or the
        program deadlocks. Why not process-sharded loaders: per-process metric
        shards would need a host-side all-reduce the reference semantics don't
        define; replication guarantees bitwise-identical metrics on all hosts
        at the cost of duplicated host-side decode — acceptable at eval
        cadence (per epoch / save_freq).

        Raises when the loader configuration breaks the replication contract
        (different processes would feed different data into a global program
        → divergence or hang).
        """
        if jax.process_count() <= 1:
            return
        if shuffle or process_sharded:
            raise ValueError(
                "multi-host eval must be replicated: eval loaders may not "
                f"shuffle (got shuffle={shuffle}) or shard by process (got "
                f"process_sharded={process_sharded}); every process must see "
                "the identical full eval set (see MeshContext.check_replicated_eval)"
            )
        if logger is not None and self.is_primary():
            msg = (
                f"multi-host: eval replicated across {jax.process_count()} "
                "processes (identical inputs, primary-only artifacts)"
            )
            logger.both(msg) if hasattr(logger, "both") else logger.info(msg)


def build_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> MeshContext:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to pure DP: data = n_devices, model = 1. For sharded margin heads
    pass model > 1 (n_devices must be divisible).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"data({data}) * model({model}) != devices({n})"
    dev_array = np.asarray(devices).reshape(data, model)
    mesh = Mesh(dev_array, axis_names=("data", "model"))
    return MeshContext(mesh=mesh)


def batch_sharding(ctx: MeshContext) -> NamedSharding:
    return ctx.batch


def replicated(ctx: MeshContext) -> NamedSharding:
    return ctx.replicated


def class_sharded(ctx: MeshContext) -> NamedSharding:
    return ctx.class_dim


def shard_batch(ctx: MeshContext, batch):
    """Device-put a host batch (pytree of np arrays, leading dim = batch)
    with the batch dim sharded over the data axis."""
    return jax.device_put(batch, ctx.batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    logger=None,
) -> bool:
    """Multi-host bring-up: the torchrun/init_process_group analogue
    (reference main.py:15-16,37-40). On TPU pods ``jax.distributed
    .initialize()`` auto-discovers the coordinator from the TPU metadata, so
    all arguments are optional; non-TPU clusters pass them explicitly.

    Returns True when the distributed runtime was (newly) initialized.
    Idempotent: a second call is a logged no-op. A genuinely failed bring-up
    (bad coordinator, rank mismatch) RAISES — silently training on a
    single-host mesh when the user asked for multi-host corrupts results.
    The one swallowed case: no arguments AND no auto-discoverable cluster
    environment, i.e. an intentional single-process run.

    Clusters without TPU/Slurm/MPI auto-detection pass the coordinates via
    env (the torchrun MASTER_ADDR/WORLD_SIZE/RANK analogue):
    ``VDK_COORDINATOR_ADDRESS`` / ``VDK_NUM_PROCESSES`` / ``VDK_PROCESS_ID``.
    Explicit arguments win over env. Exercised for real by the 2-process CPU
    test in tests/test_distributed_2proc.py.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("VDK_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("VDK_NUM_PROCESSES"):
        num_processes = int(os.environ["VDK_NUM_PROCESSES"])
    if process_id is None and os.environ.get("VDK_PROCESS_ID"):
        process_id = int(os.environ["VDK_PROCESS_ID"])

    def _log(msg: str) -> None:
        if logger is not None:
            logger.both(msg) if hasattr(logger, "both") else logger.info(msg)

    already = getattr(
        getattr(jax._src, "distributed", None), "global_state", None
    )
    if already is not None and getattr(already, "client", None) is not None:
        _log("jax.distributed already initialized; skipping")
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            _log("jax.distributed already initialized; skipping")
            return False
        raise
    except ValueError:
        if coordinator_address is None and num_processes is None and process_id is None:
            # no explicit args and no cluster env to auto-detect:
            # a plain single-process run, not a misconfiguration
            _log("no cluster environment detected; running single-process")
            return False
        raise
    _log(
        f"jax.distributed initialized: process {jax.process_index()}"
        f"/{jax.process_count()}"
    )
    return True
