"""Pallas TPU kernel: fused passport epilogue.

After the batched convolution of a passport layer (input rows + key row +
skey row in ONE conv — passport/derive.py), the remaining work is:

    scale = GAP(skey_out)                     # (C,)
    bias  = GAP(key_out)                      # (C,)
    out   = relu(scale * (y - mean)/sqrt(var+eps) + bias)

This kernel fuses all of it into a single VMEM-resident pass over the conv
output: one HBM read of y, one HBM write of out, with the scale/bias GAP
derivation computed on-chip (the key/skey rows stay pinned in VMEM across the
batch grid). The XLA fallback (passport/derive.py + ops/norms.py) is the
correctness reference; this kernel serves the eval/inference path where BN
uses running statistics (training needs cross-batch stats and uses XLA).

Grid: one program per batch row. C is the lane dimension (all model widths
here are multiples of 128 except the 64/192-channel stems, which Mosaic pads).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget guard: y-block + key + skey + out per program (f32)
_VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def _epilogue_kernel(y_ref, key_ref, skey_ref, mean_ref, var_ref,
                     out_ref, scale_ref, bias_ref, *, eps: float, relu: bool):
    # GAP over the key/skey conv outputs -> per-channel affine.
    # (1, H, W, C) -> (C,); f32 accumulation on the VPU.
    scale = jnp.mean(skey_ref[0], axis=(0, 1), dtype=jnp.float32)
    bias = jnp.mean(key_ref[0], axis=(0, 1), dtype=jnp.float32)

    inv = jax.lax.rsqrt(var_ref[0] + eps)
    y = y_ref[0].astype(jnp.float32)
    out = scale * ((y - mean_ref[0]) * inv) + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype)
    scale_ref[0] = scale
    bias_ref[0] = bias


def passport_epilogue_pallas(
    y: jax.Array,
    key_out: jax.Array,
    skey_out: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
    relu: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused eval-mode passport epilogue.

    y: (N, H, W, C) conv output of the inputs; key_out/skey_out: (1, H, W, C)
    conv outputs of the passports; mean/var: (C,) BN running stats.
    Returns (out, scale, bias).
    """
    n, h, w, c = y.shape
    kernel = functools.partial(_epilogue_kernel, eps=eps, relu=relu)

    grid = (n,)
    block = (1, h, w, c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(block, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # every program writes the identical derived affine; the TPU grid
            # is sequential per core, so the last write simply repeats it
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), y.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(y, key_out, skey_out, mean.reshape(1, -1), var.reshape(1, -1))


def epilogue_fits_vmem(h: int, w: int, c: int, itemsize: int = 4) -> bool:
    """Whether the per-program working set fits the VMEM budget."""
    return 4 * h * w * c * itemsize <= _VMEM_LIMIT_BYTES


# --------------------------------------------------------------- dispatch mode
#
# Measured STANDALONE on v5e (benchmarks/bench_epilogue.py, 2026-08-16):
#   (256, 4, 4, 512): XLA 1636us  Pallas  827us   <- 2.0x win (dispatch-bound)
#   (256, 8, 8, 256): XLA  745us  Pallas  967us
#   (256,56,56, 64):  XLA 1192us  Pallas 3653us   (bandwidth-bound; XLA wins)
# But measured IN-MODEL (benchmarks/bench_inference.py, ResNet-18 private
# branch, same day): off 119.2k img/s vs auto 99.9k at bs1024 — inside the
# full jitted forward XLA fuses the epilogue into its neighbors, and the
# pallas_call boundary breaks that fusion. The standalone win is a dispatch
# artifact, so the DEFAULT IS OFF; 'auto'/'on' remain for model families
# whose epilogues are genuinely unfused, 'interpret' for CPU tests.

_EPILOGUE_MODE = "off"  # off | auto | on | interpret (CPU tests)


def set_epilogue_mode(mode: str) -> None:
    """Global dispatch mode for the fused epilogue.

    'off' (default — measured fastest end-to-end on ResNet-18/v5e).
    'auto': TPU backend + standalone-profitable shapes. 'on': force (still
    requires the VMEM fit). 'interpret': run the kernel in interpreter mode
    on any backend — for CPU integration tests.
    """
    global _EPILOGUE_MODE
    if mode not in ("auto", "on", "off", "interpret"):
        raise ValueError(f"unknown epilogue mode: {mode}")
    _EPILOGUE_MODE = mode


def epilogue_mode() -> str:
    return _EPILOGUE_MODE


def epilogue_should_run(n: int, h: int, w: int, c: int, bk: int = 1) -> bool:
    """Shape-dispatch decision for the eval-path passport epilogue."""
    if _EPILOGUE_MODE == "off" or bk != 1 or not epilogue_fits_vmem(h, w, c):
        return False
    if _EPILOGUE_MODE in ("on", "interpret"):
        return True
    # auto: only the measured dispatch-bound regime, and only on real TPU
    return h * w <= 16 and c >= 256 and jax.default_backend() == "tpu"
