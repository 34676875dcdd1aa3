"""Interop: model surgery between variants + PyTorch checkpoint import."""

from deepipr_tpu.interop.surgery import (
    copy_matching,
    normal_to_normal,
    normal_to_passport,
    passport_to_normal,
)

__all__ = [
    "copy_matching",
    "normal_to_normal",
    "normal_to_passport",
    "passport_to_normal",
]
