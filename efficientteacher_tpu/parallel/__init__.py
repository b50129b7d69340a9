from .mesh import batch_sharding, make_mesh, replicate, replicated, shard_batch

__all__ = [
    "batch_sharding", "make_mesh", "replicate", "replicated", "shard_batch",
]
