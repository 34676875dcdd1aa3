"""Inference folding: collapse BN + affine chains into conv kernels.

At eval time every block in this zoo is `conv -> per-channel affine chain ->
(ReLU)`: BatchNorm with running statistics is an affine, the passport-derived
scale/bias is an affine, the public learned scale/bias is an affine. Affines
compose, and a per-channel affine after a linear convolution folds into the
convolution itself:

    s*r*(conv(x) + b0 - m) + b  ==  conv'(x) + B
    with  conv'.kernel = kernel * A,  A = s*r,  r = rsqrt(var + eps),
          B = A*(b0 - m) + b

so the folded model is the plain normal architecture with norm_type='none'
(conv + bias + ReLU), which is both faster (no normalization work at all)
and the right deployment artifact: the folded public model contains **no
passports, no signatures, and no BN statistics** — exactly what the paper
ships to users, while the owner keeps the passport model for verification
(reference deployment story, README.md:40-61).

Folding targets norm_type='bn' (and 'none') models; GroupNorm/InstanceNorm
normalize per sample at eval and cannot be folded.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepipr_tpu.utils.tree import flatten_paths, unflatten_paths

_EPS = 1e-5  # torch/flax BN epsilon used across this package (ops/norms.py)


def _build_normal_none(model):
    """The equivalent normal architecture with norm_type='none'."""
    from deepipr_tpu.models.alexnet import AlexNet
    from deepipr_tpu.models.resnet import ResNet

    if isinstance(model, AlexNet):
        return AlexNet(
            num_classes=model.num_classes, in_channels=model.in_channels,
            norm_type="none", imagenet=model.imagenet, dtype=model.dtype,
        )
    if isinstance(model, ResNet):
        return ResNet(
            block_cls=model.block_cls, num_blocks=model.num_blocks,
            num_classes=model.num_classes, norm_type="none",
            imagenet=model.imagenet, dtype=model.dtype,
        )
    raise TypeError(f"cannot fold model of type {type(model).__name__}")


def fold_for_inference(
    model,
    variables: Dict,
    input_shape: Optional[Tuple[int, ...]] = None,
    ind: int = 0,
) -> Tuple[object, Dict]:
    """(folded_model, folded_variables) for pure-inference deployment.

    ind=0 folds the public/deployment branch (learned affines); ind=1 folds
    the private/verification branch (passport-derived affines — input_shape
    is required to derive them). Normal models fold their BN affine.
    """
    norm_type = getattr(model, "norm_type", "bn")
    if norm_type not in ("bn", "none"):
        raise ValueError(
            f"fold_for_inference supports norm_type 'bn'/'none', got "
            f"{norm_type!r} (GN/IN normalize per sample at eval)"
        )

    params = flatten_paths(variables["params"])
    stats = flatten_paths(dict(variables.get("batch_stats", {})))

    derived: Dict[str, Dict] = {}
    if getattr(model, "passport_kwargs", None) is not None:
        from deepipr_tpu.attacks.common import derived_affines

        if input_shape is None:
            raise ValueError("input_shape is required to fold passport models")
        derived = derived_affines(
            model, variables, input_shape,
            private=getattr(model, "private", False),
        )

    folded_model = _build_normal_none(model)
    tmpl = folded_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros(input_shape or (1, 32, 32, 3), jnp.float32),
        train=False,
    )
    out = dict(flatten_paths(tmpl["params"]))

    for path in out:
        if path.endswith("/conv/kernel"):
            mod = path[: -len("/conv/kernel")]
            kernel = jnp.asarray(params[f"{mod}/conv/kernel"], jnp.float32)
            b0 = jnp.asarray(
                params.get(f"{mod}/conv/bias", jnp.zeros(kernel.shape[-1])),
                jnp.float32,
            )
            use_private_stats = (
                ind == 1 and f"{mod}/bn_private/mean" in stats
            )
            bn = f"{mod}/bn_private" if use_private_stats else f"{mod}/bn"
            mean = stats.get(f"{bn}/mean")
            var = stats.get(f"{bn}/var")

            is_private_model = getattr(model, "private", False)
            if f"{mod}/bn/scale" in params:  # normal block, affine BN
                s = jnp.asarray(params[f"{mod}/bn/scale"], jnp.float32)
                b = jnp.asarray(params[f"{mod}/bn/bias"], jnp.float32)
            elif is_private_model and ind == 1 and mod in derived:
                # V2/V3 private branch: passport-derived affine
                s = jnp.asarray(derived[mod]["scale"], jnp.float32).reshape(-1)
                b = jnp.asarray(derived[mod]["bias"], jnp.float32).reshape(-1)
            elif f"{mod}/scale" in params:
                # learned affine: V2 public branch, or V1 learnable_affine
                # (the eval forward prefers it unless force_passport)
                s = jnp.asarray(params[f"{mod}/scale"], jnp.float32)
                b = jnp.asarray(params[f"{mod}/bias"], jnp.float32)
            elif mod in derived:  # V1 standard: always derived
                s = jnp.asarray(derived[mod]["scale"], jnp.float32).reshape(-1)
                b = jnp.asarray(derived[mod]["bias"], jnp.float32).reshape(-1)
            else:  # plain conv (+bias), no affine
                s = jnp.ones(kernel.shape[-1], jnp.float32)
                b = jnp.zeros(kernel.shape[-1], jnp.float32)

            if mean is not None:
                r = jax.lax.rsqrt(jnp.asarray(var, jnp.float32) + _EPS)
                a = s * r
                bias = a * (b0 - jnp.asarray(mean, jnp.float32)) + b
            else:
                a = s
                bias = a * b0 + b
            out[path] = kernel * a  # broadcast over the output-channel dim
            out[f"{mod}/conv/bias"] = bias
        elif path.endswith("/conv/bias"):
            pass  # written alongside the kernel above
        else:  # dense layers (classifier/linear) copy through
            out[path] = params[path]

    return folded_model, {"params": unflatten_paths(out)}
