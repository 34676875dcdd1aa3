"""Interop: model surgery between variants + PyTorch checkpoint import."""

from deepipr_tpu.interop.surgery import (
    copy_matching,
    normal_to_normal,
    normal_to_passport,
    passport_to_normal,
)
from deepipr_tpu.interop.torch_import import (
    convert_torch_state_dict,
    import_torch_checkpoint,
    load_torch_checkpoint,
)

__all__ = [
    "copy_matching",
    "normal_to_normal",
    "normal_to_passport",
    "passport_to_normal",
    "convert_torch_state_dict",
    "import_torch_checkpoint",
    "load_torch_checkpoint",
]
