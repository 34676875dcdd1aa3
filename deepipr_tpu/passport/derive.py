"""Passport -> affine derivation: scale/bias from key conv + global average pool.

Reference semantics (models/layers/passportconv2d.py:142-175):

    scale_c = mean_batch(mean_spatial(conv(skey)[:, c]))
    bias_c  = mean_batch(mean_spatial(conv(key)[:, c]))

All functions here are pure and layout-NHWC. The TPU-first optimization is
:func:`fused_conv_with_passports`: since the input, key, and skey share one
convolution kernel, the three convolutions are batched into a single
convolution so the MXU sees one large matmul instead of one large and two
batch-1 ones.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def conv2d_nhwc(
    x: jax.Array,
    kernel: jax.Array,
    stride: Tuple[int, int],
    padding,
    precision=None,
) -> jax.Array:
    """Plain NHWC convolution with an HWIO kernel (no bias).

    f32 accumulation is forced via preferred_element_type so signature decode
    is robust on TPU regardless of input dtype.
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def gap_channel_mean(y: jax.Array) -> jax.Array:
    """Global average pool + batch mean: (N, H, W, C) -> (C,).

    Equals the reference's view(b, c, -1).mean(2).mean(0) since every batch
    element has the same spatial extent.
    """
    return jnp.mean(y, axis=(0, 1, 2))


def derive_affine(
    conv_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    skey: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """(scale, bias) derived from passports through the layer's own convolution.

    scale comes from skey, bias from key (passportconv2d.py:148-175).
    """
    scale = gap_channel_mean(conv_fn(skey))
    bias = gap_channel_mean(conv_fn(key))
    return scale, bias


def fused_conv_passport_outputs(
    x: jax.Array,
    key: jax.Array,
    skey: jax.Array,
    conv_fn: Callable[[jax.Array], jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One batched convolution over [x; key; skey]; raw per-row outputs.

    Returns (y, key_out, skey_out) in f32: y = conv(x) of shape (N, H', W', C),
    key_out/skey_out = conv over the passports, shape (Bk, H', W', C) — still
    spatial, for consumers that fuse the GAP themselves (the Pallas epilogue).
    """
    n = x.shape[0]
    bk = key.shape[0]
    stacked = jnp.concatenate([x, key.astype(x.dtype), skey.astype(x.dtype)], axis=0)
    out = conv_fn(stacked)
    # y stays in the compute dtype (the normalize path is dtype-aware and
    # bf16 halves its HBM sweeps); scale/bias derivation is always f32 so
    # signature signs stay robust under mixed precision.
    return (
        out[:n],
        out[n : n + bk].astype(jnp.float32),
        out[n + bk :].astype(jnp.float32),
    )


def fused_conv_with_passports(
    x: jax.Array,
    key: jax.Array,
    skey: jax.Array,
    conv_fn: Callable[[jax.Array], jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run conv(x), and derive (scale, bias) from (skey, key) in ONE convolution.

    x: (N, H, W, Cin); key/skey: (Bk, H, W, Cin) with the same spatial dims.
    Returns (y, scale, bias) with y = conv(x) of shape (N, H', W', Cout) and
    scale/bias of shape (Cout,).

    This replaces the reference's three sequential convolutions per passport
    layer (passportconv2d.py:218,148,169) with a single batched convolution —
    the passports ride along as extra batch rows, which keeps the MXU tiles
    large and avoids two tiny batch-1 convolutions.
    """
    y, key_out, skey_out = fused_conv_passport_outputs(x, key, skey, conv_fn)
    bias = gap_channel_mean(key_out)
    scale = gap_channel_mean(skey_out)
    return y, scale, bias
