"""Config + logging utilities."""

from deepipr_tpu.utils.config import (
    construct_passport_kwargs,
    construct_passport_kwargs_from_dict,
    load_lr_config,
    load_passport_config,
)
__all__ = [
    "construct_passport_kwargs",
    "construct_passport_kwargs_from_dict",
    "load_lr_config",
    "load_passport_config",
]
