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

# flax convention: running = BN_MOMENTUM*running + (1-BN_MOMENTUM)*batch
# (== torch momentum 0.1); the split dual-forward step re-applies this EMA
# for prefix units (train/steps.py).
BN_MOMENTUM = 0.9


class StatsBatchNorm(nn.BatchNorm):
    """nn.BatchNorm plus an accessor for the running statistics.

    Behavior is identical to nn.BatchNorm by construction (nothing is
    overridden); ``running_stats`` lets the fused Pallas passport epilogue
    (ops/pallas_fused.py) consume mean/var directly on the eval path without
    applying the norm separately. The variable layout ('batch_stats' ->
    mean/var) is unchanged, so checkpoints and torch interop are unaffected.
    Within one module apply, exactly one of __call__ / running_stats runs, so
    both declare the same variables without conflict.
    """

    def running_stats(self, features: int):
        # Read-only: the stats always exist by the time this runs (model init
        # goes through __call__, which declares them); reading avoids the
        # declare-outside-compact restriction.
        mean = self.get_variable("batch_stats", "mean")
        var = self.get_variable("batch_stats", "var")
        if mean is None or var is None:
            raise ValueError(
                "running_stats called before batch_stats were initialized; "
                "initialize the model with a __call__ pass first"
            )
        return mean, var


def make_norm(
    norm_type: str, features: int, affine: Optional[bool] = None,
    name: str = "bn", dtype=None,
):
    """Create the norm submodule for a block; None for norm_type='none'.

    ``affine=None`` picks the torch default per norm type: BN/GN affine,
    InstanceNorm affine-free. ``dtype`` is the normalize-path compute dtype
    (statistics are always accumulated in f32 by flax): bf16 halves the HBM
    bytes of the normalize/backward sweeps, which dominate the train step's
    roofline (BASELINE.md round-2 analysis).
    """
    if norm_type == "bn":
        use_affine = True if affine is None else affine
        return StatsBatchNorm(
            momentum=BN_MOMENTUM,
            epsilon=1e-5,
            use_scale=use_affine,
            use_bias=use_affine,
            dtype=dtype,
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
            dtype=dtype,
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
            dtype=dtype,
            name=name,
        )
    if norm_type == "none":
        return None
    raise ValueError(f"unknown norm type: {norm_type}")


def apply_norm(norm, x, train: bool):
    """Apply a norm module created by make_norm (handles BN's train flag)."""
    if norm is None:
        return x
    if isinstance(norm, nn.BatchNorm):
        return norm(x, use_running_average=not train)
    return norm(x)
