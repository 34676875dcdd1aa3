"""Pallas fused gather+augment kernel vs the XLA paths (interpret mode).

The kernel must reproduce the existing input stage exactly: same RNG draw
pattern, same crop/flip/normalize semantics. The only permitted deviation
is 1 ulp in the final normalize (the kernel divides by std; XLA compiles
the same division to a constant-reciprocal multiply)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepipr_tpu.data.device_augment import make_device_augment
from deepipr_tpu.ops.pallas_augment import make_pallas_augment


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    ds = rng.integers(0, 256, (64, 32, 32, 3)).astype(np.uint8)
    idx = rng.permutation(64)[:16].astype(np.int32)
    return ds, idx


class TestPallasAugment:
    def test_matches_xla_paths_within_one_ulp(self, data):
        ds, idx = data
        key = jax.random.key(7)
        pal = make_pallas_augment(4, block=8, interpret=True)
        got = np.asarray(pal(key, jnp.asarray(ds), jnp.asarray(idx)))
        for impl in ("slice", "onehot"):
            ref = np.asarray(
                make_device_augment(4, crop_impl=impl)(
                    key, jnp.asarray(ds)[jnp.asarray(idx)]))
            np.testing.assert_allclose(got, ref, rtol=0, atol=3e-7)

    def test_unnormalized_pixels_exact(self, data):
        """Gather + crop + flip are EXACT (integer pixel values survive
        denormalization bit-for-bit); only the normalize divide is 1 ulp."""
        ds, idx = data
        key = jax.random.key(3)
        pal = make_pallas_augment(4, block=8, interpret=True,
                                  mean=np.zeros(3), std=np.ones(3) / 255.0)
        got = np.asarray(pal(key, jnp.asarray(ds), jnp.asarray(idx)))
        ref = np.asarray(
            make_device_augment(4, crop_impl="slice", mean=np.zeros(3),
                                std=np.ones(3) / 255.0)(
                key, jnp.asarray(ds)[jnp.asarray(idx)]))
        np.testing.assert_array_equal(got, ref)
        assert got.min() >= 0.0 and got.max() <= 255.0

    def test_rng_stream_matches_device_augment(self, data):
        """Same key => same crops/flips as the XLA augment (the kernel
        re-draws with the identical split pattern)."""
        ds, idx = data
        k1, k2 = jax.random.key(11), jax.random.key(12)
        pal = make_pallas_augment(4, block=8, interpret=True)
        a = np.asarray(pal(k1, jnp.asarray(ds), jnp.asarray(idx)))
        b = np.asarray(pal(k2, jnp.asarray(ds), jnp.asarray(idx)))
        assert np.abs(a - b).max() > 0  # different keys, different batches

    def test_rejects_indivisible_batch(self, data):
        ds, _ = data
        pal = make_pallas_augment(4, block=8, interpret=True)
        with pytest.raises(ValueError, match="multiple"):
            pal(jax.random.key(0), jnp.asarray(ds),
                jnp.arange(12, dtype=jnp.int32))
