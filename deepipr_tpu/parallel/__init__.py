"""SPMD parallelism: mesh construction and sharding helpers."""

from deepipr_tpu.parallel.mesh import (
    batch_sharding,
    count_model_sharded,
    make_mesh,
    model_parallel_spec,
    replicate,
    replicated,
    shard_batch,
    shard_model_parallel,
)

__all__ = [
    "batch_sharding",
    "count_model_sharded",
    "make_mesh",
    "model_parallel_spec",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_model_parallel",
]
