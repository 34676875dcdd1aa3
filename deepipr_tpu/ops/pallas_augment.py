"""Pallas fused input stage: gather + pad-crop + flip + normalize.

The scanned-epoch input stage (train/epoch.py + data/device_augment.py) is,
in XLA terms: a batched gather from the HBM-resident uint8 dataset, a zero
pad, two one-hot selection einsums (the random crop), a lane-reversing
`where` (the flip), and an affine normalize. This kernel is the round-3
"one targeted Pallas attempt" (VERDICT r2 item 5) at beating that XLA
pipeline by fusing everything into one pass over VMEM:

  - the dataset stays in HBM (`memory_space=ANY`); per image the kernel
    issues ONE sliced async DMA `dataset[idx[i]] -> VMEM`, so the gather
    costs exactly B row copies and the uint8 image is only materialized
    once, in VMEM (XLA's gather materializes a gathered uint8 batch in HBM,
    then reloads it for the crop einsums);
  - pad + random crop collapse into a zero-initialized VMEM scratch write
    plus one dynamic slice at (oy, 3*ox) — no one-hot matrices, no einsum
    FLOPs, no padded f32 batch in HBM;
  - the horizontal flip is one (W*C, W*C) permutation matmul on the MXU,
    selected per image against the identity (channel order preserved);
  - normalize fuses into the same pass, writing the final f32/bf16 batch.

Layout: images travel as (H, W*C) rows — W*C = 96 lanes for CIFAR shapes,
one contiguous 3 KB DMA per image. The host-side RNG draws (crop offsets,
flip flags) are IDENTICAL to make_device_augment's (same key splits, same
draw shapes), so for equal keys this kernel is bit-identical to the
'slice'/'onehot' paths in f32 — proven in tests/test_pallas_augment.py.

Reference behavior being accelerated: dataset.py:268 (RandomCrop + flip +
Normalize), fused with the batch gather the reference does in its
DataLoader sampler.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD


def _flip_permutation(w: int, c: int) -> np.ndarray:
    """(W*C, W*C) one-hot P with (x @ P) reversing pixels, keeping channels:
    output flat column q = out_pixel*c + ch reads in_pixel = w-1-out_pixel."""
    wc = w * c
    p = np.zeros((wc, wc), np.float32)
    for out_pix in range(w):
        in_pix = w - 1 - out_pix
        for ch in range(c):
            p[in_pix * c + ch, out_pix * c + ch] = 1.0
    return p


def make_pallas_augment(
    pad: int,
    height: int = 32,
    width: int = 32,
    channels: int = 3,
    out_dtype=jnp.float32,
    block: int = 8,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
    interpret: bool = False,
):
    """Build augment_fn(key, dataset_u8, idx) -> (B, H, W, C) out_dtype.

    dataset_u8: (N, H, W, C) uint8, resident in HBM (device_resident).
    idx: (B,) int32 rows to gather; B must be a multiple of `block`.
    key: same split/draw pattern as data/device_augment.make_device_augment,
    so equal keys give bit-identical batches to the XLA paths.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = height, width, channels
    wc = w * c
    ph, pwc = h + 2 * pad, wc + 2 * pad * c
    flip_p = _flip_permutation(w, c)
    mean_row = np.tile(np.asarray(mean, np.float32) * 255.0, w)[None, :]
    std_row = np.tile(np.asarray(std, np.float32) * 255.0, w)[None, :]

    def kernel(idx_ref, oy_ref, ox_ref, flip_ref, dataset_ref, flip_p_ref,
               mean_ref, std_ref, out_ref, img_scr, pad_scr, sems):
        i = pl.program_id(0)

        # fire all gather DMAs up front (uint8 rows, one per image)
        for j in range(block):
            pltpu.make_async_copy(
                dataset_ref.at[idx_ref[i * block + j]],
                img_scr.at[j],
                sems.at[j],
            ).start()

        for j in range(block):
            pltpu.make_async_copy(
                dataset_ref.at[idx_ref[i * block + j]],
                img_scr.at[j],
                sems.at[j],
            ).wait()
            oy = oy_ref[i * block + j]
            ox = ox_ref[i * block + j]
            # zero-pad into scratch, then the crop is ONE dynamic slice
            pad_scr[:] = jnp.zeros((ph, pwc), jnp.float32)
            pad_scr[pad:pad + h, pad * c:pad * c + wc] = (
                img_scr[j].astype(jnp.float32))
            cropped = pad_scr[pl.ds(oy, h), pl.ds(ox * c, wc)]
            # flip = MXU permutation matmul, selected against identity
            flipped = jax.lax.cond(
                flip_ref[i * block + j] != 0,
                lambda x: jnp.dot(x, flip_p_ref[:],
                                  preferred_element_type=jnp.float32),
                lambda x: x,
                cropped,
            )
            out_ref[j] = (
                (flipped - mean_ref[:]) / std_ref[:]
            ).astype(out_dtype)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # dataset stays in HBM
        pl.BlockSpec((wc, wc), lambda i, *_: (0, 0)),    # flip P
        pl.BlockSpec((1, wc), lambda i, *_: (0, 0)),     # mean row
        pl.BlockSpec((1, wc), lambda i, *_: (0, 0)),     # std row
    ]
    out_specs = pl.BlockSpec((block, h, wc), lambda i, *_: (i, 0, 0))
    scratch_shapes = [
        pltpu.VMEM((block, h, wc), jnp.uint8),
        pltpu.VMEM((ph, pwc), jnp.float32),
        pltpu.SemaphoreType.DMA((block,)),
    ]

    @partial(jax.jit, static_argnames=())
    def augment(key: jax.Array, dataset_u8: jax.Array,
                idx: jax.Array) -> jax.Array:
        n_imgs = idx.shape[0]
        if n_imgs % block:
            raise ValueError(f"batch {n_imgs} not a multiple of {block}")
        # identical draw pattern to make_device_augment
        kc, kf = jax.random.split(key)
        offs = jax.random.randint(kc, (n_imgs, 2), 0, 2 * pad + 1)
        flips = jax.random.bernoulli(kf, 0.5, (n_imgs,))

        ds_rows = dataset_u8.reshape(dataset_u8.shape[0], h, wc)
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_imgs // block,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((n_imgs, h, wc), out_dtype),
            interpret=interpret,
        )(
            idx.astype(jnp.int32),
            offs[:, 0].astype(jnp.int32),
            offs[:, 1].astype(jnp.int32),
            flips.astype(jnp.int32),
            ds_rows,
            jnp.asarray(flip_p),
            jnp.asarray(mean_row),
            jnp.asarray(std_row),
        )
        return out.reshape(n_imgs, h, w, c)

    return augment
