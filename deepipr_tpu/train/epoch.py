"""Device-resident epoch training: one dispatch per EPOCH, not per step.

The per-step loop pays a host round-trip per batch: H2D of the batch plus a
dispatch. On a direct-attached host that overhead is small; on a
relay-attached chip (this dev environment) it dominates — the end-to-end
loop runs at ~8-14k img/s while the compute-bound step does 28k
(BASELINE.md). CIFAR-scale datasets fit comfortably in HBM as raw uint8
(50k x 32x32x3 = 150 MB), so the TPU-shaped answer is to park the WHOLE
training set on the device once and run the epoch as a `lax.scan`:

  - per-epoch shuffle = jax.random.permutation on device,
  - per-step minibatch = one gather from the resident uint8 array,
  - augmentation = the fused on-device crop/flip/normalize
    (data/device_augment.py), keyed by the global step counter,
  - V3 trigger batches ride resident too, cycled by step index
    (the reference's cycling trigger loader, trainer.py:115-126).

The scanned epoch is numerically identical to per-step dispatch of the same
step function — same params math, same BN updates, same augmentation stream
(both key off state.step) — proven in tests/test_epoch_scan.py.

Multi-device meshes (pod scale): the resident dataset is REPLICATED across
the mesh — at CIFAR scale the uint8 array is a rounding error against HBM,
and replication makes the per-step gather local to every device. The global
shuffle/permutation stream is unchanged, and the gathered batch carries a
`P('batch')` sharding constraint, so each device gathers only its slice of
rows; XLA SPMD's only collective is the gradient all-reduce it already
inserts for data parallelism. Semantics are therefore IDENTICAL to the
single-chip scan (tests/test_epoch_scan.py::TestMeshEpochScan proves exact
param equality). V3 trigger concatenation pads the trigger batch up to
shard divisibility with weight-0 samples, mirroring the per-step path
(train/experiment.py::_batches).

Scope: single-host, in-memory datasets (CIFAR/synthetic/Caltech). Streaming
ImageNet keeps the per-step host loop — a dataset that cannot live
replicated in HBM cannot ride a resident scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepipr_tpu.data.device_augment import make_device_augment
from deepipr_tpu.train.state import TrainState
from deepipr_tpu.train.steps import make_train_step


def epoch_permutation(epoch_key, n: int, batch_size: int):
    """(steps, (steps, batch_size) index array) for one shuffled epoch with
    drop_last semantics — shared by the single-model and ensemble scans."""
    steps = n // batch_size
    if steps == 0:
        raise ValueError(f"batch_size {batch_size} exceeds the dataset "
                         f"({n} images)")
    perm = jax.random.permutation(epoch_key, n)
    return steps, perm[: steps * batch_size].reshape(steps, batch_size)


def make_epoch_train_fn(
    model,
    private: bool,
    batch_size: int,
    pad: int,
    random_crop: bool = True,
    split_branches: bool = True,
    remat: str = "none",
    wm_batch: int = 2,
    out_dtype=jnp.float32,
    mesh: Optional[Mesh] = None,
    input_stage: str = "xla",
    seed: int = 0,
):
    """Build epoch_fn(state, images_u8, labels, epoch_key[, wm_images_u8,
    wm_labels]) -> (state, mean_metrics).

    images_u8/labels stay on device across epochs (device_put once);
    drop_last semantics like the reference train loader. wm arrays (V3)
    are the raw uint8 trigger set; every step takes the next `wm_batch`
    images round-robin and the train step concatenates them on-device.

    mesh: run the scan SPMD over the mesh's 'batch' axis (see module
    docstring). batch_size must divide by the axis size; the V3 trigger
    batch is padded up to divisibility with weight-0 samples.

    input_stage: 'xla' (gather + fused crop/flip/normalize, the default) or
    'pallas' (ops/pallas_augment.py — per-image DMA gather fused with the
    augment in one kernel; measured 1.56x the XLA stage at bs 256 on v5e).
    'pallas' is single-device: a pallas_call is opaque to SPMD partitioning,
    so meshes keep the XLA stage. Same RNG draws => both stages produce
    bit-identical batches (tests/test_pallas_augment.py).
    """
    n_shards = 1
    if mesh is not None:
        n_shards = int(mesh.shape["batch"])
        if batch_size % n_shards != 0:
            raise ValueError(
                f"epoch scan on a {n_shards}-way batch mesh needs "
                f"batch_size % {n_shards} == 0, got {batch_size}"
            )
    if input_stage not in ("xla", "pallas"):
        raise ValueError(f"input_stage must be 'xla' or 'pallas', "
                         f"got {input_stage!r}")
    if input_stage == "pallas":
        if n_shards > 1:
            raise ValueError(
                "input_stage='pallas' is single-device (the fused gather "
                "kernel is opaque to SPMD partitioning); use 'xla' on meshes")
        if not (random_crop and pad > 0):
            raise ValueError(
                "input_stage='pallas' implements the train transform "
                "(random crop + flip); random_crop=False keeps 'xla'")

    # V3 trigger take per step: exactly wm_batch single-chip; rounded up to
    # shard divisibility on a mesh (the extras carry loss weight 0, like the
    # per-step path's padding — experiment.py::_batches)
    wm_take = wm_batch if n_shards == 1 else -((-wm_batch) // n_shards) * n_shards

    def _constrain(x):
        if mesh is None or n_shards == 1:
            return x
        spec = P("batch", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    aug = make_device_augment(pad, random_crop=random_crop,
                              out_dtype=out_dtype)
    raw_step = make_train_step(
        model, private, split_branches=split_branches,
        device_augment=aug, remat=remat, jit=False, seed=seed,
    )

    def epoch_fn(
        state: TrainState,
        images_u8: jax.Array,
        labels: jax.Array,
        epoch_key: jax.Array,
        wm_images_u8: Optional[jax.Array] = None,
        wm_labels: Optional[jax.Array] = None,
    ):
        steps, perm = epoch_permutation(epoch_key, images_u8.shape[0],
                                        batch_size)

        step_fn = raw_step
        if input_stage == "pallas":
            from deepipr_tpu.ops.pallas_augment import make_pallas_augment

            _, h_, w_, c_ = images_u8.shape
            pal = make_pallas_augment(
                pad, height=h_, width=w_, channels=c_, out_dtype=out_dtype,
                interpret=jax.default_backend() == "cpu")
            # one DMA-tile-aligned relayout per epoch call (u8 writes, <3%
            # of the epoch's HBM traffic); the kernel gathers straight from
            # these rows, so no gathered uint8 batch is ever materialized
            ds_rows = pal.prepare_rows(images_u8)
            step_fn = make_train_step(
                model, private, split_branches=split_branches,
                device_augment=lambda key, packed: pal(key, *packed),
                remat=remat, jit=False, seed=seed,
            )

            def get_image(idx):
                return (ds_rows, idx)
        else:

            def get_image(idx):
                return _constrain(images_u8[idx])
        wm_perm = None
        if wm_images_u8 is not None:
            # fresh per-epoch shuffle of the trigger set, cycled across the
            # epoch — matches the per-step path's reshuffled CyclingIterator
            # (every trigger trains over epochs even when one epoch's
            # steps*wm_batch < len(trigger set))
            wm_perm = jax.random.permutation(
                jax.random.fold_in(epoch_key, 1), wm_images_u8.shape[0])

        def body(state, args):
            t, idx = args
            batch = {"image": get_image(idx),
                     "label": _constrain(labels[idx])}
            if wm_images_u8 is not None:
                m = wm_images_u8.shape[0]
                # cycle advances by wm_batch (the REAL trigger count) per
                # step; on a mesh, wm_take - wm_batch weight-0 lookaheads
                # pad the step batch to shard divisibility
                wm_idx = wm_perm[(t * wm_batch + jnp.arange(wm_take)) % m]
                batch["wm_image"] = _constrain(wm_images_u8[wm_idx])
                batch["wm_label"] = _constrain(wm_labels[wm_idx])
                if wm_take != wm_batch:
                    batch["weight"] = _constrain(jnp.concatenate([
                        jnp.ones(batch_size + wm_batch, jnp.float32),
                        jnp.zeros(wm_take - wm_batch, jnp.float32),
                    ]))
            return step_fn(state, batch)

        state, metrics = jax.lax.scan(
            body, state, (jnp.arange(steps), perm))
        return state, jax.tree.map(lambda a: a.mean(), metrics)

    return jax.jit(epoch_fn, donate_argnums=0)


def device_resident(images_u8, labels, mesh: Optional[Mesh] = None):
    """Park a dataset in HBM once (plain device_put; the arrays are reused
    by every epoch_fn call without re-transfer). On a mesh the arrays are
    replicated — every device holds the dataset, keeping per-step gathers
    local (see module docstring)."""
    if mesh is not None:
        s = NamedSharding(mesh, P())
        return (jax.device_put(jnp.asarray(images_u8), s),
                jax.device_put(jnp.asarray(labels), s))
    return jax.device_put(jnp.asarray(images_u8)), jax.device_put(
        jnp.asarray(labels))
