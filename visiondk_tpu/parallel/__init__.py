from visiondk_tpu.parallel.mesh import (
    MeshContext,
    build_mesh,
    initialize_distributed,
    batch_sharding,
    replicated,
    shard_batch,
    class_sharded,
    set_current_mesh,
    current_mesh,
    with_current_mesh,
)

__all__ = [
    "MeshContext",
    "build_mesh",
    "initialize_distributed",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "class_sharded",
    "set_current_mesh",
    "current_mesh",
    "with_current_mesh",
]
