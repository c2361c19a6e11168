from .mesh import get_mesh, replicate, shard_batch

__all__ = ["get_mesh", "replicate", "shard_batch"]
