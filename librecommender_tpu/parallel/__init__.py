from .mesh import build_mesh, shard_batch, shard_params

__all__ = ["build_mesh", "shard_batch", "shard_params"]
