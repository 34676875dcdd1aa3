"""Pallas fused passport epilogue: correctness vs the XLA reference path.

Runs in interpreter mode (tests are on CPU); the same kernel compiles for TPU
via Mosaic and is exercised by benchmarks/bench_epilogue.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.ops.pallas_fused import (
    epilogue_fits_vmem,
    passport_epilogue_pallas,
)


def _reference(y, ko, so, mean, var, eps=1e-5, relu=True):
    scale = jnp.mean(so, axis=(0, 1, 2))
    bias = jnp.mean(ko, axis=(0, 1, 2))
    yn = (y - mean) * jax.lax.rsqrt(var + eps)
    out = scale * yn + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    return out, scale, bias


@pytest.mark.parametrize("shape", [(4, 8, 8, 128), (2, 16, 16, 256)])
@pytest.mark.parametrize("relu", [True, False])
def test_epilogue_matches_xla(shape, relu):
    n, h, w, c = shape
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ko = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
    so = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=c).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))

    out, scale, bias = passport_epilogue_pallas(
        y, ko, so, mean, var, relu=relu, interpret=True
    )
    ref_out, ref_scale, ref_bias = _reference(y, ko, so, mean, var, relu=relu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scale[0]), np.asarray(ref_scale),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bias[0]), np.asarray(ref_bias),
                               rtol=1e-5, atol=1e-6)


def test_vmem_guard():
    assert epilogue_fits_vmem(32, 32, 512)
    assert not epilogue_fits_vmem(224, 224, 512)
