"""Model zoo: AlexNet and ResNet families with passport variants."""

from deepipr_tpu.models.alexnet import (
    AlexNet,
    AlexNetNormal,
    AlexNetPassport,
    AlexNetPassportPrivate,
)
from deepipr_tpu.models.layers import ConvBlock, PassportBlock, PassportPrivateBlock
from deepipr_tpu.models.registry import ARCHS, NUM_CLASSES, build_model
from deepipr_tpu.models.resnet import (
    BasicBlock,
    Bottleneck,
    ResNet,
    ResNet9,
    ResNet9Passport,
    ResNet18,
    ResNet18Passport,
    ResNet18Private,
    ResNet34,
    ResNet50,
    ResNet50Passport,
    ResNet50Private,
    ResNet101,
    ResNet152,
)

__all__ = [
    "AlexNet",
    "AlexNetNormal",
    "AlexNetPassport",
    "AlexNetPassportPrivate",
    "ConvBlock",
    "PassportBlock",
    "PassportPrivateBlock",
    "ARCHS",
    "NUM_CLASSES",
    "build_model",
    "BasicBlock",
    "Bottleneck",
    "ResNet",
    "ResNet9",
    "ResNet9Passport",
    "ResNet18",
    "ResNet18Passport",
    "ResNet18Private",
    "ResNet34",
    "ResNet50",
    "ResNet50Passport",
    "ResNet50Private",
    "ResNet101",
    "ResNet152",
]
