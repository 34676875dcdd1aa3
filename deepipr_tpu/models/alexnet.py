"""AlexNet family: normal / V1 passport / V2-V3 private passport (Flax).

Topology matches the reference (models/alexnet_normal.py, alexnet_passport.py,
alexnet_passport_private.py):

CIFAR variant: 5 conv blocks (64,192,384,256,256; k=5,5,3,3,3) with MaxPool
after blocks 0, 1(=2nd conv), and the last; single Dense classifier on the
4x4x256 feature map. ImageNet variant: torchvision-AlexNet shapes with
AdaptiveAvgPool(6,6) and a 3-layer dropout MLP classifier.

Layers 0,2,4,5,6 (reference feature indices) are individually switchable to
passport blocks via passport_kwargs['0'|'2'|'4'|'5'|'6']['flag']. Module names
features_{idx} keep the reference indexing for config/interop parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from deepipr_tpu.models.layers import ConvBlock, PassportBlock, PassportPrivateBlock
from deepipr_tpu.ops.pooling import adaptive_avg_pool2d, max_pool2d

# (layer_idx, features, kernel, stride, padding) for the CIFAR variant
_CIFAR_CONVS = [
    ("0", 64, 5, 1, 2),
    ("2", 192, 5, 1, 2),
    ("4", 384, 3, 1, 1),
    ("5", 256, 3, 1, 1),
    ("6", 256, 3, 1, 1),
]
# ImageNet variant: layer 0 uses k=11, s=4, p=2 (alexnet_passport.py:28)
_IMAGENET_CONVS = [
    ("0", 64, 11, 4, 2),
    ("2", 192, 5, 1, 2),
    ("4", 384, 3, 1, 1),
    ("5", 256, 3, 1, 1),
    ("6", 256, 3, 1, 1),
]
# maxpool comes after these conv layer indices
_POOL_AFTER = {"0", "2", "6"}


def _make_feature_block(
    layer_kwargs: Optional[Dict[str, Any]],
    norm_type: str,
    features: int,
    k: int,
    s: int,
    p: int,
    name: str,
    private: bool,
    dtype,
):
    """Pick ConvBlock vs Passport(Private)Block per the layer's config flag."""
    if layer_kwargs is not None and layer_kwargs["flag"]:
        common = dict(
            features=features,
            kernel_size=k,
            strides=s,
            padding=p,
            norm_type=layer_kwargs["norm_type"],
            key_type=layer_kwargs["key_type"],
            alpha=layer_kwargs["sign_loss"],
            b_spec=layer_kwargs.get("b"),
            dtype=dtype,
            name=name,
        )
        if private:
            return PassportPrivateBlock(
                separate_stats=layer_kwargs.get("separate_stats", False),
                **common,
            )
        return PassportBlock(
            learnable_affine=layer_kwargs.get("learnable_affine", False), **common
        )
    nt = layer_kwargs["norm_type"] if layer_kwargs is not None else norm_type
    return ConvBlock(
        features=features,
        kernel_size=k,
        strides=s,
        padding=p,
        norm_type=nt,
        dtype=dtype,
        name=name,
    )


def _call_block(block, x, force_passport, ind, train):
    if isinstance(block, PassportPrivateBlock):
        return block(x, ind=ind, force_passport=force_passport, train=train)
    if isinstance(block, PassportBlock):
        return block(x, force_passport=force_passport, train=train)
    return block(x, train=train)


class AlexNet(nn.Module):
    """Unified AlexNet; passport_kwargs=None gives the normal model.

    private=True selects PassportPrivateBlock for flagged layers (V2/V3).
    """

    num_classes: int
    in_channels: int = 3
    norm_type: str = "bn"
    passport_kwargs: Optional[Dict[str, Any]] = None
    private: bool = False
    imagenet: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x,
        force_passport: bool = False,
        ind: int = 0,
        train: bool = False,
        start_at: str = None,
        tap_at: str = None,
    ):
        """start_at: run only from the named features block onward (x is that
        block's input — used by the split dual-forward train step).
        tap_at: sow the named block's input into 'branch_tap'."""
        # Reference quirk (alexnet_passport_private.py:27,36,52): conv/pool
        # SHAPES key on num_classes==1000 alone, while the avgpool+MLP head
        # keys on (num_classes==1000 or imagenet) — so imagenet=True with
        # another class count keeps CIFAR-shaped convs under the MLP head.
        full_imagenet = self.num_classes == 1000
        head_imagenet = self.imagenet or full_imagenet
        convs = _IMAGENET_CONVS if full_imagenet else _CIFAR_CONVS
        pool_k = 3 if full_imagenet else 2
        started = start_at is None

        for idx, feats, k, s, p in convs:
            name = f"features_{idx}"
            if not started:
                if name == start_at:
                    started = True
                else:
                    continue
            if tap_at == name and not self.is_initializing():
                self.sow("branch_tap", "x", x)
            lk = None if self.passport_kwargs is None else self.passport_kwargs[idx]
            block = _make_feature_block(
                lk, self.norm_type, feats, k, s, p, name,
                self.private, self.dtype,
            )
            x = _call_block(block, x, force_passport, ind, train)
            if idx in _POOL_AFTER:
                x = max_pool2d(x, pool_k, 2)

        if head_imagenet:
            x = adaptive_avg_pool2d(x, (6, 6))
            x = x.reshape(x.shape[0], -1)
            x = nn.Dropout(0.5, deterministic=not train)(x)
            x = nn.relu(nn.Dense(4096, name="classifier_1")(x))
            x = nn.Dropout(0.5, deterministic=not train)(x)
            x = nn.relu(nn.Dense(4096, name="classifier_4")(x))
            x = nn.Dense(self.num_classes, name="classifier_6")(x)
        else:
            x = x.reshape(x.shape[0], -1)  # 4*4*256
            x = nn.Dense(self.num_classes, name="classifier")(x)
        return x


def AlexNetNormal(num_classes, in_channels=3, norm_type="bn", imagenet=False, dtype=None):
    return AlexNet(
        num_classes=num_classes, in_channels=in_channels, norm_type=norm_type,
        imagenet=imagenet, dtype=dtype,
    )


def AlexNetPassport(num_classes, passport_kwargs, in_channels=3, norm_type="bn",
                    imagenet=False, dtype=None):
    return AlexNet(
        num_classes=num_classes, in_channels=in_channels, norm_type=norm_type,
        passport_kwargs=passport_kwargs, imagenet=imagenet, dtype=dtype,
    )


def AlexNetPassportPrivate(num_classes, passport_kwargs, in_channels=3,
                           norm_type="bn", imagenet=False, dtype=None):
    return AlexNet(
        num_classes=num_classes, in_channels=in_channels, norm_type=norm_type,
        passport_kwargs=passport_kwargs, private=True, imagenet=imagenet,
        dtype=dtype,
    )
