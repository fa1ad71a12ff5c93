"""Device-mesh parallelism for multi-key bootstrapping."""

from .mesh import kms_bootstrap_sharded, make_mesh, shard_scheme
from .shardmap import kms_bootstrap_shardmap

__all__ = [
    "kms_bootstrap_sharded",
    "kms_bootstrap_shardmap",
    "make_mesh",
    "shard_scheme",
]
