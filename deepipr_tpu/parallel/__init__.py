"""SPMD parallelism: mesh construction and sharding helpers."""

from deepipr_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = ["batch_sharding", "make_mesh", "replicate", "replicated", "shard_batch"]
