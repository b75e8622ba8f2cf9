from nuzero_tpu.parallel.mesh import (
    make_mesh,
    place_batch_sharded,
    place_replicated,
    shard_batch,
    replicate,
    make_sharded_superstep,
)

__all__ = [
    "make_mesh",
    "make_sharded_superstep",
    "place_batch_sharded",
    "place_replicated",
    "replicate",
    "shard_batch",
]
