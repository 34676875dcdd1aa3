"""Model construction by architecture + scheme, mirroring the reference's
construct_model dispatch (experiments/classification.py:66-126,
classification_private.py:66-106)."""

from __future__ import annotations

from typing import Any, Dict, Optional

from deepipr_tpu.models.alexnet import AlexNet
from deepipr_tpu.models.resnet import ResNet18, ResNet34, ResNet50, ResNet9

ARCHS = ("alexnet", "resnet", "resnet9", "resnet34", "resnet50")

NUM_CLASSES = {
    "cifar10": 10,
    "cifar100": 100,
    "caltech-101": 101,
    "caltech-256": 256,
    "imagenet1000": 1000,
    "synthetic": 10,
}


def build_model(
    arch: str,
    num_classes: int,
    norm_type: str = "bn",
    passport_kwargs: Optional[Dict[str, Any]] = None,
    private: bool = False,
    imagenet: bool = False,
    dtype: Any = None,
):
    """Build normal (passport_kwargs=None), V1 passport, or V2/V3 private model."""
    if arch == "alexnet":
        return AlexNet(
            num_classes=num_classes, norm_type=norm_type,
            passport_kwargs=passport_kwargs, private=private,
            imagenet=imagenet, dtype=dtype,
        )
    if arch in ("resnet", "resnet18"):
        return ResNet18(
            num_classes=num_classes, norm_type=norm_type,
            passport_kwargs=passport_kwargs, private=private,
            imagenet=imagenet, dtype=dtype,
        )
    if arch == "resnet34":
        return ResNet34(
            num_classes=num_classes, norm_type=norm_type,
            passport_kwargs=passport_kwargs, private=private,
            imagenet=imagenet, dtype=dtype,
        )
    if arch == "resnet50":
        return ResNet50(
            num_classes=num_classes, norm_type=norm_type,
            passport_kwargs=passport_kwargs, private=private,
            imagenet=imagenet, dtype=dtype,
        )
    if arch == "resnet9":
        return ResNet9(
            num_classes=num_classes, norm_type=norm_type,
            passport_kwargs=passport_kwargs, private=private,
            imagenet=imagenet, dtype=dtype,
        )
    raise ValueError(f"unknown arch: {arch} (choose from {ARCHS})")
