"""Core passport mechanism: signature codec, sign loss, affine derivation, selection."""

from deepipr_tpu.passport.codec import (
    bit_accuracy,
    bits_to_string,
    decode_bits,
    decode_string,
    encode_signature,
    string_to_bits,
)
from deepipr_tpu.passport.derive import (
    conv2d_nhwc,
    derive_affine,
    fused_conv_with_passports,
    gap_channel_mean,
)
from deepipr_tpu.passport.selection import passport_selection, random_passport
from deepipr_tpu.passport.sign_loss import (
    HINGE_MARGIN,
    SCALE_REG,
    sign_accuracy,
    sign_loss,
    total_sign_loss,
)

__all__ = [
    "bit_accuracy",
    "bits_to_string",
    "decode_bits",
    "decode_string",
    "encode_signature",
    "string_to_bits",
    "conv2d_nhwc",
    "derive_affine",
    "fused_conv_with_passports",
    "gap_channel_mean",
    "passport_selection",
    "random_passport",
    "HINGE_MARGIN",
    "SCALE_REG",
    "sign_accuracy",
    "sign_loss",
    "total_sign_loss",
]
