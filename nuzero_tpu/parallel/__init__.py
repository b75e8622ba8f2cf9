from nuzero_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_sharded_superstep,
)

__all__ = ["make_mesh", "make_sharded_superstep", "replicate", "shard_batch"]
