from .mesh import make_mesh, shard_batch, batch_pspec

__all__ = ["make_mesh", "shard_batch", "batch_pspec"]
