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


# --------------------------------------------------------------------------
# tensor parallelism over the 'model' axis
# --------------------------------------------------------------------------

# residual units whose conv kernels are sharded over 'model'. layer3+layer4
# carry ~3/4 of a ResNet's weight volume and (by the halve-res/double-width
# design) ~half its conv FLOPs.
TP_UNITS = ("layer3_", "layer4_")


def model_parallel_spec(path: str, ndim: int) -> P:
    """PartitionSpec for one parameter under model parallelism.

    The deepest (widest) layers carry most of the weight volume, so they are
    the ones worth sharding over 'model' (megatron-style column/row split;
    XLA GSPMD inserts the all-gather/reduce-scatter pairs over ICI). Block
    inputs/outputs stay replicated, so all communication is block-local:

    - layer3/layer4 convbnrelu_1 conv kernels (HWIO): output channels
      sharded (column-parallel — the activation leaves channel-sharded)
    - every other conv kernel in those units (BasicBlock convbn_2,
      Bottleneck convbnrelu_2 / convbn_3, shortcut): input channels sharded
      (row-parallel — convbn(relu)_2 consumes the channel-sharded activation
      with no resharding; the trailing psum restores a replicated output)
    - final Dense ('linear'/'classifier*') kernels (in, out): output sharded
    - everything else (BN vectors, passports, signatures, small convs):
      replicated
    """
    if (
        ndim == 4
        and any(u in path for u in TP_UNITS)
        and path.endswith("/conv/kernel")
    ):
        if "/convbnrelu_1/" in path:
            return P(None, None, None, "model")
        return P(None, None, "model", None)  # convbn(relu)_2/3, shortcut
    last = path.rsplit("/", 2)
    if (
        ndim == 2
        and path.endswith("/kernel")
        and len(last) >= 2
        and last[-2].startswith(("linear", "classifier"))
    ):
        return P(None, "model")
    return P()


def _leaf_path(key_path) -> str:
    parts = []
    for k in key_path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", str(k))
        parts.append(str(name))
    return "/".join(parts)


def shard_model_parallel(tree, mesh: Mesh):
    """Place a pytree (TrainState) with model-parallel parameter shardings.

    Applies model_parallel_spec by trailing path to every array leaf — the
    optimizer's momentum buffers mirror the parameter tree, so they pick up
    the same specs and stay colocated with their parameters.
    """

    def put(key_path, x):
        spec = model_parallel_spec(_leaf_path(key_path), getattr(x, "ndim", 0))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def count_model_sharded(tree) -> int:
    """Number of array leaves actually sharded over the 'model' axis."""
    n = 0
    for leaf in jax.tree.leaves(tree):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding) and any(
            "model" in (axes if isinstance(axes, tuple) else (axes,))
            for axes in s.spec if axes is not None
        ):
            n += 1
    return n
