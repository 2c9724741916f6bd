from qaig_tpu.parallel.mesh import make_mesh
from qaig_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    transformer_param_spec,
    shard_tree,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "transformer_param_spec",
    "shard_tree",
]
