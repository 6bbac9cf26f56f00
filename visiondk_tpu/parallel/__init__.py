from visiondk_tpu.parallel.mesh import (
    MeshContext,
    build_mesh,
    initialize_distributed,
    batch_sharding,
    replicated,
    shard_batch,
    class_sharded,
)

__all__ = [
    "MeshContext",
    "build_mesh",
    "initialize_distributed",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "class_sharded",
]
