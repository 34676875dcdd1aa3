"""Unit tests for the passport core: codec, sign loss, derivation, selection.

Golden values are checked against an independent PyTorch-CPU formulation of the
same math (the reference's semantics, re-expressed — not its code).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from deepipr_tpu.passport import (
    bit_accuracy,
    bits_to_string,
    decode_string,
    derive_affine,
    encode_signature,
    fused_conv_with_passports,
    passport_selection,
    random_passport,
    sign_accuracy,
    sign_loss,
    string_to_bits,
)
from deepipr_tpu.passport.derive import conv2d_nhwc


class TestCodec:
    def test_string_roundtrip(self):
        for text in ["this is mine", "DeepIPR", "a"]:
            bits = string_to_bits(text)
            assert len(bits) == 8 * len(text)
            assert bits_to_string(bits) == text

    def test_string_matches_torch_reference_encoding(self):
        # The reference encodes with format(ord(c),'b').zfill(8)
        text = "ok!"
        expected = "".join(format(ord(c), "b").zfill(8) for c in text)
        got = "".join(str(int(b)) for b in string_to_bits(text))
        assert got == expected

    def test_encode_random_is_pm1(self):
        b = encode_signature(jax.random.key(0), 64)
        assert b.shape == (64,)
        assert set(np.unique(np.asarray(b))) <= {-1.0, 1.0}

    def test_encode_int(self):
        b = encode_signature(jax.random.key(0), 16, spec=-1)
        assert np.all(np.asarray(b) == -1.0)

    def test_encode_string_and_decode(self):
        text = "hi"
        b = encode_signature(jax.random.key(1), 64, spec=text)
        # a scale vector with exactly those signs decodes back to the text
        scale = b * jnp.abs(jax.random.normal(jax.random.key(2), (64,)))
        assert decode_string(scale, num_chars=len(text)) == text

    def test_encode_string_too_long_raises(self):
        with pytest.raises(ValueError):
            encode_signature(jax.random.key(0), 8, spec="ab")

    def test_bit_accuracy(self):
        b = jnp.array([1.0, -1.0, 1.0, -1.0])
        scale = jnp.array([0.5, -0.2, -0.3, -0.9])
        assert float(bit_accuracy(scale, b)) == pytest.approx(0.75)


class TestSignLoss:
    def test_matches_torch_formula(self):
        rng = np.random.default_rng(0)
        scale = rng.normal(size=32).astype(np.float32)
        b = np.sign(rng.normal(size=32)).astype(np.float32)
        alpha = 0.1

        # Independent torch formulation of the reference loss
        # (sign_loss.py:27,53): sum(alpha*relu(-b*scale+0.1)) + 1e-5*sum(scale^2)
        ts, tb = torch.tensor(scale), torch.tensor(b)
        expected = (alpha * F.relu(-tb * ts + 0.1)).sum() + 1e-5 * ts.pow(2).sum()

        got = sign_loss(jnp.asarray(scale), jnp.asarray(b), alpha)
        assert float(got) == pytest.approx(float(expected), rel=1e-6)

    def test_zero_when_signs_correct_and_margin_met(self):
        b = jnp.array([1.0, -1.0])
        scale = jnp.array([0.5, -0.5])
        # only the tiny L2 reg remains
        assert float(sign_loss(scale, b, 1.0)) == pytest.approx(1e-5 * 0.5, rel=1e-5)

    def test_sign_accuracy(self):
        b = jnp.array([1.0, -1.0, 1.0])
        assert float(sign_accuracy(jnp.array([2.0, 1.0, 3.0]), b)) == pytest.approx(2 / 3)


class TestDerive:
    @pytest.mark.parametrize("stride,pad", [((1, 1), 1), ((2, 2), 2)])
    def test_matches_torch_conv_gap(self, stride, pad):
        """scale/bias derivation == torch conv2d + GAP + batch mean, bit-close."""
        rng = np.random.default_rng(42)
        cin, cout, k = 3, 8, 3
        key = rng.normal(size=(1, 16, 16, cin)).astype(np.float32)
        skey = rng.normal(size=(1, 16, 16, cin)).astype(np.float32)
        w_hwio = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1

        def conv_fn(x):
            return conv2d_nhwc(x, jnp.asarray(w_hwio), stride, pad,
                               precision=jax.lax.Precision.HIGHEST)

        scale, bias = derive_affine(conv_fn, jnp.asarray(key), jnp.asarray(skey))

        # torch NCHW equivalent
        w_oihw = torch.tensor(w_hwio).permute(3, 2, 0, 1)
        for src, got in [(skey, scale), (key, bias)]:
            t = torch.tensor(src).permute(0, 3, 1, 2)
            y = F.conv2d(t, w_oihw, stride=stride, padding=pad)
            expected = y.flatten(2).mean(2).mean(0)
            np.testing.assert_allclose(
                np.asarray(got), expected.numpy(), rtol=1e-4, atol=1e-5
            )

    def test_fused_equals_separate(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32))
        key = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
        skey = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 16)).astype(np.float32))

        def conv_fn(v):
            return conv2d_nhwc(v, w, (1, 1), 1)

        y_f, scale_f, bias_f = fused_conv_with_passports(x, key, skey, conv_fn)
        y = conv_fn(x)
        scale, bias = derive_affine(conv_fn, key, skey)

        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(scale_f), np.asarray(scale), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bias_f), np.asarray(bias), rtol=1e-5, atol=1e-5)


class TestSelection:
    def test_input_channel_picks_whole_image(self):
        cands = np.random.default_rng(0).normal(size=(5, 4, 4, 3)).astype(np.float32)
        p = passport_selection(cands, seed=0)
        assert p.shape == (1, 4, 4, 3)
        # must be exactly one of the candidates
        assert any(np.array_equal(p[0], cands[i]) for i in range(5))

    def test_shuffle_selection_draws_from_round_robin_images(self):
        b, c = 4, 16
        cands = np.zeros((b, 2, 2, c), dtype=np.float32)
        for i in range(b):
            for ch in range(c):
                cands[i, :, :, ch] = i * 100 + ch  # encode (img, channel)
        p = passport_selection(cands, seed=3)
        assert p.shape == (1, 2, 2, c)
        used = set()
        for j in range(c):
            val = p[0, 0, 0, j]
            img, ch = int(val) // 100, int(val) % 100
            assert img == j % b  # round-robin over images
            assert (img, ch) not in used  # without replacement
            used.add((img, ch))

    def test_deterministic_given_seed(self):
        cands = np.random.default_rng(1).normal(size=(3, 4, 4, 8)).astype(np.float32)
        np.testing.assert_array_equal(
            passport_selection(cands, seed=9), passport_selection(cands, seed=9)
        )

    def test_random_passport_shape_and_range(self):
        p = random_passport((32, 16, 16, 3), seed=5)
        assert p.shape == (1, 16, 16, 3)
        assert p.min() >= -1.0 and p.max() <= 1.0
