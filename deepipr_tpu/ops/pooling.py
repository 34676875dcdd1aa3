"""Pooling ops with torch-compatible semantics, NHWC layout, static shapes."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def max_pool2d(x, window: int, stride: int, padding: int = 0):
    """torch nn.MaxPool2d equivalent (floor mode, symmetric int padding)."""
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    if padding:
        x = jnp.pad(x, pad, constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="VALID")


def adaptive_avg_pool2d(x, out_hw):
    """torch nn.AdaptiveAvgPool2d equivalent for NHWC inputs.

    Window i spans [floor(i*H/out), ceil((i+1)*H/out)); all indices are static
    at trace time so XLA sees a fixed gather/reduce pattern.
    """
    oh, ow = out_hw
    n, h, w, c = x.shape
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (N, oh, ow, C)


def global_avg_pool(x):
    """(N, H, W, C) -> (N, C); accumulates in f32 under bf16 activations."""
    return jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
