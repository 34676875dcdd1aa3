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
  - pad + random crop + flip are TWO tiny per-image selection matmuls,
    `V @ img @ M`, where V (H,H) encodes the vertical pad+crop and M
    (W*C, W*C) the horizontal pad+crop composed with the optional flip.
    Both matrices are built in-register from iota comparisons against the
    scalar-prefetched (oy, ox, flip) draws; out-of-range rows are all-zero,
    which IS the zero padding — no padded scratch, no dynamic slices.
    (Mosaic rejects dynamic lane-dimension slices unless the offset is
    provably a multiple of 128, so the natural pad-scratch + dynamic-slice
    formulation does not compile; the selection-matmul form runs the crop
    on the MXU instead and needs no alignment proof.);
  - normalize fuses into the same pass, writing the final f32/bf16 batch.

Layout: images travel as (H, ceil(W*C/128)*128) uint8 rows — Mosaic DMAs
must copy whole (sublane, 128-lane) tiles, so the W*C = 96 CIFAR row is
stored padded to 128 lanes (`prepare_rows`, a one-time 4/3x HBM cost on
the resident set); the padding lanes are masked out of the horizontal
selection matrix, so they never reach the output. The host-side RNG draws
(crop offsets, flip flags) are IDENTICAL to make_device_augment's (same
key splits, same draw shapes), so for equal keys this kernel is
bit-identical to the 'slice'/'onehot' paths in f32 — proven in
tests/test_pallas_augment.py.

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


def _column_maps(w: int, c: int) -> tuple[np.ndarray, np.ndarray]:
    """(1, W*C) int32 maps q -> source flat column *before* the crop shift.

    no-flip: identity (out column q reads cropped column q); flip: output
    pixel p reads cropped pixel w-1-p, channel order preserved. The kernel
    adds (ox - pad) * c to these to fold in the horizontal pad+crop."""
    q = np.arange(w * c, dtype=np.int32)
    pix, ch = q // c, q % c
    return q[None, :], ((w - 1 - pix) * c + ch)[None, :].astype(np.int32)


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
    wcp = -(-wc // 128) * 128  # DMA tiles are 128 lanes wide
    colmap_id, colmap_flip = _column_maps(w, c)
    mean_row = np.tile(np.asarray(mean, np.float32) * 255.0, w)[None, :]
    std_row = np.tile(np.asarray(std, np.float32) * 255.0, w)[None, :]

    def kernel(idx_ref, oy_ref, ox_ref, flip_ref, dataset_ref, cmap_ref,
               fmap_ref, mean_ref, std_ref, out_ref, img_scr, sems):
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
            flip = flip_ref[i * block + j]
            # Mosaic has no direct u8->f32 cast; extui to i32 then sitofp.
            img = img_scr[j].astype(jnp.int32).astype(jnp.float32)
            # Vertical pad+crop: V[r_out, r_in] = (r_in == r_out + oy - pad);
            # out-of-range rows are all-zero, which IS the zero padding.
            r_out = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
            r_in = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
            vsel = ((r_in == r_out + (oy - pad))
                    .astype(jnp.int32).astype(jnp.float32))
            # Horizontal pad+crop composed with flip: one selection matrix
            # M[r, q] = (r == cmap[q] + (ox - pad) * c), cmap picked per the
            # flip draw. One-hot f32 matmuls over <=255 ints are exact.
            # Rows r >= wc are the DMA-tile padding lanes — masked off so
            # their garbage bytes never select into the output.
            cmap = jnp.where(flip != 0, fmap_ref[:], cmap_ref[:])
            rr = jax.lax.broadcasted_iota(jnp.int32, (wcp, wc), 0)
            hsel = (jnp.logical_and(rr == cmap + (ox - pad) * c, rr < wc)
                    .astype(jnp.int32).astype(jnp.float32))
            out = jnp.dot(
                jnp.dot(vsel, img, preferred_element_type=jnp.float32),
                hsel, preferred_element_type=jnp.float32)
            out_ref[j] = ((out - mean_ref[:]) / std_ref[:]).astype(out_dtype)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # dataset stays in HBM
        pl.BlockSpec((1, wc), lambda i, *_: (0, 0)),     # colmap identity
        pl.BlockSpec((1, wc), lambda i, *_: (0, 0)),     # colmap flip
        pl.BlockSpec((1, wc), lambda i, *_: (0, 0)),     # mean row
        pl.BlockSpec((1, wc), lambda i, *_: (0, 0)),     # std row
    ]
    out_specs = pl.BlockSpec((block, h, wc), lambda i, *_: (i, 0, 0))
    scratch_shapes = [
        pltpu.VMEM((block, h, wcp), jnp.uint8),
        pltpu.SemaphoreType.DMA((block,)),
    ]

    @jax.jit
    def prepare_rows(dataset_u8: jax.Array) -> jax.Array:
        """One-time relayout: (N, H, W, C) uint8 -> (N, H, wcp) DMA-tile-
        aligned rows. Production callers hold THIS resident and pass it to
        augment(); passing the 4-D dataset re-pads every call."""
        n = dataset_u8.shape[0]
        rows = dataset_u8.reshape(n, h, wc)
        return jnp.pad(rows, ((0, 0), (0, 0), (0, wcp - wc)))

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

        if dataset_u8.ndim == 4:
            ds_rows = prepare_rows(dataset_u8)
        elif dataset_u8.shape[-1] == wcp:
            ds_rows = dataset_u8
        else:
            raise ValueError(
                f"dataset rows must be (N, {h}, {wcp}) from prepare_rows "
                f"or the raw (N, {h}, {w}, {c}); got {dataset_u8.shape}")
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
            jnp.asarray(colmap_id),
            jnp.asarray(colmap_flip),
            jnp.asarray(mean_row),
            jnp.asarray(std_row),
        )
        return out.reshape(n_imgs, h, w, c)

    augment.prepare_rows = prepare_rows
    return augment
