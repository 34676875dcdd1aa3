"""Normalization layers matching the reference's norm-type choices.

The reference uses (models/layers/conv2d.py:11-18, passportconv2d.py:56-64):

- 'bn': BatchNorm2d (affine for normal blocks, affine-free for passport blocks)
- 'gn': GroupNorm with C//16 groups
- 'in': InstanceNorm2d (torch default: affine-free, no running stats)
- 'none': identity

Torch/Flax BN differences handled here: torch momentum 0.1 == flax momentum 0.9;
epsilon pinned to torch's 1e-5. Torch stores the *unbiased* batch variance into
its running stats while flax stores the biased one — irrelevant for sign
semantics and shrinking with batch size, so we keep flax's convention.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNorm2D(nn.Module):
    """BatchNorm with an optional fused-dual mode for V2 training.

    Drop-in equivalent of flax nn.BatchNorm over NHWC (same variable names:
    params scale/bias, batch_stats mean/var; biased batch variance; running
    update ra = momentum*ra + (1-momentum)*batch).

    dual=True treats the batch as two stacked halves [public; private] and
    normalizes EACH HALF WITH ITS OWN batch statistics, updating the running
    stats twice (public then private) — exactly what the reference's two
    sequential train-mode forwards do to the shared BN
    (trainer_private.py:159-173).
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, dual: bool = False):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features)
        )

        if train and not self.is_initializing():
            if dual:
                n2 = x.shape[0]
                halves = x.reshape(2, n2 // 2, *x.shape[1:])
                mean = jnp.mean(halves, axis=(1, 2, 3))       # (2, C)
                var = jnp.var(halves, axis=(1, 2, 3))         # (2, C)
                xn = (halves - mean[:, None, None, None, :]) * jax.lax.rsqrt(
                    var[:, None, None, None, :] + self.epsilon
                )
                xn = xn.reshape(x.shape)
                m = self.momentum
                ra_mean.value = m * (m * ra_mean.value + (1 - m) * mean[0]) \
                    + (1 - m) * mean[1]
                ra_var.value = m * (m * ra_var.value + (1 - m) * var[0]) \
                    + (1 - m) * var[1]
            else:
                mean = jnp.mean(x, axis=(0, 1, 2))
                var = jnp.var(x, axis=(0, 1, 2))
                xn = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            xn = (x - ra_mean.value) * jax.lax.rsqrt(
                ra_var.value + self.epsilon
            )

        if self.use_affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            xn = scale * xn + bias
        return xn


def make_norm(
    norm_type: str, features: int, affine: Optional[bool] = None, name: str = "bn"
):
    """Create the norm submodule for a block; None for norm_type='none'.

    ``affine=None`` picks the torch default per norm type: BN/GN affine,
    InstanceNorm affine-free.
    """
    if norm_type == "bn":
        use_affine = True if affine is None else affine
        return BatchNorm2D(
            features=features,
            momentum=0.9,
            epsilon=1e-5,
            use_affine=use_affine,
            name=name,
        )
    if norm_type == "gn":
        use_affine = True if affine is None else affine
        if features % 16 != 0:
            raise ValueError(f"GroupNorm requires features % 16 == 0, got {features}")
        return nn.GroupNorm(
            num_groups=features // 16,
            epsilon=1e-5,
            use_scale=use_affine,
            use_bias=use_affine,
            name=name,
        )
    if norm_type == "in":
        # InstanceNorm == GroupNorm with one group per channel; torch's
        # InstanceNorm2d default is affine-free with no running stats.
        use_affine = False if affine is None else affine
        return nn.GroupNorm(
            num_groups=features,
            epsilon=1e-5,
            use_scale=use_affine,
            use_bias=use_affine,
            name=name,
        )
    if norm_type == "none":
        return None
    raise ValueError(f"unknown norm type: {norm_type}")


def apply_norm(norm, x, train: bool, dual: bool = False):
    """Apply a norm module created by make_norm (handles BN's train flag).

    dual only affects BatchNorm (GroupNorm/InstanceNorm are per-sample and
    therefore identical per half)."""
    if norm is None:
        return x
    if isinstance(norm, BatchNorm2D):
        return norm(x, train=train, dual=dual)
    return norm(x)
