from .mesh import make_mesh, shard_batch, batch_pspec
from .reductions import sharded_exposure_profile, sharded_mean_stderr

__all__ = [
    "make_mesh",
    "shard_batch",
    "batch_pspec",
    "sharded_exposure_profile",
    "sharded_mean_stderr",
]
