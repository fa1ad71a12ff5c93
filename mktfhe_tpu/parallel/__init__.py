"""Device-mesh parallelism for multi-key bootstrapping."""

from .mesh import kms_bootstrap_sharded, make_mesh, shard_scheme

__all__ = ["kms_bootstrap_sharded", "make_mesh", "shard_scheme"]
