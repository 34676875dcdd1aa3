"""Device mesh + sharding helpers: SPMD data parallelism over ICI.

The reference's only parallelism is single-process torch DataParallel
(experiments/trainer.py:48-49). The TPU-native equivalent is a 1-D 'batch'
mesh over all chips: inputs are batch-sharded, state is replicated, and XLA
SPMD inserts the gradient all-reduce over ICI. A 'model' axis is kept in the
mesh signature so tensor-parallel shardings can be added without breaking
callers (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    batch_axis: int = -1,
    model_axis: int = 1,
) -> Mesh:
    """1-D (batch) or 2-D (batch, model) mesh over the given devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if batch_axis == -1:
        batch_axis = n // model_axis
    if batch_axis * model_axis != n:
        raise ValueError(
            f"make_mesh: {n} devices cannot form a ({batch_axis} batch x "
            f"{model_axis} model) mesh; pass a device count divisible by "
            f"model_axis={model_axis}"
        )
    arr = np.asarray(devices).reshape(batch_axis, model_axis)
    return Mesh(arr, ("batch", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the 'batch' axis."""
    return NamedSharding(mesh, P("batch"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put a {'image','label'} batch with the batch dim sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. TrainState) across the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
