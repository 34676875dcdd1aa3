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
):
    """Build augment(key, images_u8) -> normalized float batch.

    pad: zero-padding before the random crop (4/32 of the image side, like
    the host loader). pad=0 or random_crop=False degrades to flip+normalize.
    """
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0

    def augment(key: jax.Array, images_u8: jax.Array) -> jax.Array:
        n, h, w, c = images_u8.shape
        kc, kf = jax.random.split(key)
        x = images_u8.astype(jnp.float32)
        if random_crop and pad > 0:
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            offs = jax.random.randint(kc, (n, 2), 0, 2 * pad + 1)

            def crop(img, off):
                return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (h, w, c))

            x = jax.vmap(crop)(xp, offs)
        flips = jax.random.bernoulli(kf, 0.5, (n,))
        x = jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)
        return ((x - mean) / std).astype(out_dtype)

    return augment


def normalize_device(images_u8: jax.Array, out_dtype=jnp.float32) -> jax.Array:
    """Eval-path device normalization (no augmentation)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return ((images_u8.astype(jnp.float32) - mean) / std).astype(out_dtype)
