"""On-device train-time augmentation (TPU-native alternative to the host path).

The reference augments on the host inside torchvision transforms
(dataset.py:268: RandomCrop(pad 4/32*size) + RandomHorizontalFlip +
Normalize). This repo's default host path does the same in one fused native
C++ pass (native/augment.cpp). On-device augmentation moves that work onto
the chip instead:

  - the host ships RAW uint8 batches (4x less PCIe/ICI transfer than f32),
  - zero-pad random crop + hflip + normalize run as one fused XLA kernel on
    data already in HBM, keyed by a deterministic per-step PRNG,
  - at pod scale the host input pipeline stops being a per-worker CPU
    bottleneck (the chip does the math; the host only decodes/shuffles).

Semantics match augment_normalize (data/datasets.py): same zero padding, same
offset range [0, 2*pad], p=0.5 flip, same ImageNet mean/std normalization —
only the RNG stream differs (jax PRNG instead of np.random.Generator).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepipr_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD


def make_device_augment(
    pad: int,
    random_crop: bool = True,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
    out_dtype=jnp.float32,
    crop_impl: str = "onehot",
):
    """Build augment(key, images_u8) -> normalized float batch.

    pad: zero-padding before the random crop (4/32 of the image side, like
    the host loader). pad=0 or random_crop=False degrades to flip+normalize.

    crop_impl: the per-image random crop is a batched gather, which the TPU
    dislikes — 'slice' (vmapped dynamic_slice) measured ~7 ms at bs256
    inside the scanned epoch. 'onehot' re-expresses the crop as two one-hot
    selection matmuls (out = S_y @ img_padded @ S_x^T) that ride the MXU;
    identical output for identical keys (same RNG draws, exact 0/1 weights —
    tests/test_device_augment.py). A/B: benchmarks/bench_epoch_scan.py.
    """
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    if crop_impl not in ("onehot", "slice"):
        raise ValueError(f"crop_impl must be 'onehot' or 'slice', got {crop_impl!r}")

    def augment(key: jax.Array, images_u8: jax.Array) -> jax.Array:
        n, h, w, c = images_u8.shape
        kc, kf = jax.random.split(key)
        x = images_u8.astype(jnp.float32)
        if random_crop and pad > 0:
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            offs = jax.random.randint(kc, (n, 2), 0, 2 * pad + 1)
            if crop_impl == "slice":

                def crop(img, off):
                    return jax.lax.dynamic_slice(
                        img, (off[0], off[1], 0), (h, w, c))

                x = jax.vmap(crop)(xp, offs)
            else:
                # one-hot crop: S_y[i] is (h, h+2p) with S_y[i][r, offs_y+r]=1
                # so S_y @ img selects rows; same for columns. Exact 0/1
                # weights => bit-identical to the slice path in f32.
                sy = jax.nn.one_hot(
                    offs[:, 0, None] + jnp.arange(h)[None, :], h + 2 * pad,
                    dtype=jnp.float32)
                sx = jax.nn.one_hot(
                    offs[:, 1, None] + jnp.arange(w)[None, :], w + 2 * pad,
                    dtype=jnp.float32)
                x = jnp.einsum("nrp,npqc->nrqc", sy, xp,
                               precision=jax.lax.Precision.HIGHEST)
                x = jnp.einsum("nsq,nrqc->nrsc", sx, x,
                               precision=jax.lax.Precision.HIGHEST)
        flips = jax.random.bernoulli(kf, 0.5, (n,))
        x = jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)
        return ((x - mean) / std).astype(out_dtype)

    return augment


def normalize_device(images_u8: jax.Array, out_dtype=jnp.float32) -> jax.Array:
    """Eval-path device normalization (no augmentation)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return ((images_u8.astype(jnp.float32) - mean) / std).astype(out_dtype)
