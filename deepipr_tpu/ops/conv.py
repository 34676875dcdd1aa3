"""Conv2D: explicit NHWC/HWIO convolution module with MXU dtype control.

Casts inputs/kernel to the compute dtype (bf16 hits the MXU's fast path;
the MXU accumulates in f32 internally) and returns the compute dtype — the
calling block upcasts to f32 immediately after, so the normalize/affine/ReLU
epilogue and passport scale derivation run in full f32 on the VPU and
signature signs stay robust under mixed precision. (Forcing an f32 output
via preferred_element_type would break the conv VJP's dtype matching.)

Module name is kept as 'conv' with param 'kernel' so variable trees match
flax nn.Conv and the torch interop mapping.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
from jax import lax


class Conv2D(nn.Module):
    features: int
    kernel_size: int
    strides: int = 1
    padding: int = 0
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = None  # compute (MXU input) dtype; None = input dtype

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, cin, self.features)
        )
        compute_dtype = self.dtype or x.dtype
        out = lax.conv_general_dilated(
            x.astype(compute_dtype),
            kernel.astype(compute_dtype),
            window_strides=(self.strides, self.strides),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.reshape(1, 1, 1, -1)
        return out
