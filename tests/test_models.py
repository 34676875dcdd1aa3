"""Model zoo tests: shapes, passport branches, aux collection, torch golden check."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.models import (
    AlexNet,
    ResNet18,
    ResNet50,
    build_model,
)
from deepipr_tpu.utils.config import construct_passport_kwargs

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


def _alexnet_kwargs(sl=0.1, key_type="shuffle", norm="bn", b=None):
    cfg = {"0": False, "2": False, "4": True, "5": True, "6": b or True}
    kw, plkeys = construct_passport_kwargs(cfg, norm, key_type, sl)
    return kw, plkeys


def _resnet18_kwargs(sl=0.1, key_type="shuffle", norm="bn"):
    cfg = json.load(open("passport_configs/resnet18_passport.json"))
    return construct_passport_kwargs(cfg, norm, key_type, sl)


class TestNormalModels:
    def test_alexnet_cifar_shape(self):
        m = AlexNet(num_classes=10)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(RNGS, x)
        y = m.apply(v, x)
        assert y.shape == (2, 10)
        assert "passport" not in v

    def test_alexnet_imagenet_shape(self):
        m = AlexNet(num_classes=1000)
        x = jnp.ones((1, 224, 224, 3))
        v = m.init({**RNGS, "dropout": jax.random.key(2)}, x)
        assert m.apply(v, x).shape == (1, 1000)

    def test_resnet18_cifar_shape(self):
        m = ResNet18(num_classes=10)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(RNGS, x)
        assert m.apply(v, x).shape == (2, 10)

    def test_resnet50_bottleneck(self):
        m = ResNet50(num_classes=10)
        x = jnp.ones((1, 32, 32, 3))
        v = m.init(RNGS, x)
        assert m.apply(v, x).shape == (1, 10)

    def test_resnet18_imagenet_stem(self):
        m = ResNet18(num_classes=1000)
        x = jnp.ones((1, 224, 224, 3))
        v = m.init(RNGS, x)
        assert m.apply(v, x).shape == (1, 1000)


class TestPassportModels:
    def test_alexnet_v1_passport_layers_and_aux(self):
        kw, plkeys = _alexnet_kwargs()
        assert plkeys == ["4", "5", "6"]
        m = AlexNet(num_classes=10, passport_kwargs=kw)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(RNGS, x)
        # passports exist exactly for flagged layers
        assert sorted(v["passport"].keys()) == [
            "features_4", "features_5", "features_6",
        ]
        y, upd = m.apply(v, x, mutable=["passport_aux", "batch_stats"])
        assert y.shape == (2, 10)
        auxes = jax.tree.leaves(
            upd["passport_aux"], is_leaf=lambda t: isinstance(t, dict) and "scale" in t
        )
        assert len(auxes) == 3
        for a in auxes:
            assert a["scale"].shape == a["b"].shape
            assert a["alpha"] == 0.1

    def test_alexnet_ascii_signature(self):
        kw, _ = _alexnet_kwargs(b="hi")  # layer 6 embeds "hi"
        m = AlexNet(num_classes=10, passport_kwargs=kw)
        v = m.init(RNGS, jnp.ones((1, 32, 32, 3)))
        b6 = v["signature"]["features_6"]["b"]
        from deepipr_tpu.passport import string_to_bits
        bits = string_to_bits("hi")
        got = (np.asarray(b6[:16]) > 0).astype(int)
        np.testing.assert_array_equal(got, bits)

    def test_resnet18_private_branches_differ(self):
        kw, plkeys = _resnet18_kwargs()
        assert len(plkeys) == 5  # layer4: 2 blocks * 2 convs + 1 shortcut
        m = ResNet18(num_classes=10, passport_kwargs=kw, private=True)
        x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
        v = m.init(RNGS, x)
        y0 = m.apply(v, x, ind=0)
        y1 = m.apply(v, x, ind=1)
        assert y0.shape == y1.shape == (2, 10)
        assert not np.allclose(np.asarray(y0), np.asarray(y1))
        # private branch sows aux, public doesn't
        _, upd1 = m.apply(v, x, ind=1, mutable=["passport_aux"])
        _, upd0 = m.apply(v, x, ind=0, mutable=["passport_aux"])
        n1 = len(jax.tree.leaves(upd1.get("passport_aux", {})))
        n0 = len(jax.tree.leaves(upd0.get("passport_aux", {})))
        assert n1 > 0 and n0 == 0

    def test_force_passport_on_private_public_branch(self):
        kw, _ = _resnet18_kwargs()
        m = ResNet18(num_classes=10, passport_kwargs=kw, private=True)
        x = jax.random.normal(jax.random.key(4), (2, 32, 32, 3))
        v = m.init(RNGS, x)
        y_forced = m.apply(v, x, ind=0, force_passport=True)
        y_private = m.apply(v, x, ind=1)
        np.testing.assert_allclose(
            np.asarray(y_forced), np.asarray(y_private), rtol=1e-5, atol=1e-5
        )

    def test_v1_jit_forward(self):
        kw, _ = _alexnet_kwargs()
        m = AlexNet(num_classes=10, passport_kwargs=kw)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(RNGS, x)
        fwd = jax.jit(lambda v, x: m.apply(v, x))
        assert fwd(v, x).shape == (2, 10)

    def test_build_model_registry(self):
        for arch in ["alexnet", "resnet", "resnet9"]:
            m = build_model(arch, 10)
            v = m.init(RNGS, jnp.ones((1, 32, 32, 3)))
            assert m.apply(v, jnp.ones((1, 32, 32, 3))).shape == (1, 10)


class TestTorchGolden:
    def test_passport_block_forward_matches_torch(self):
        """PassportBlock eval forward == torch conv->BN(affine-free, running
        stats)->scale*x+bias->relu with identical weights/passports."""
        import torch
        import torch.nn.functional as F

        from deepipr_tpu.models.layers import PassportBlock

        rng = np.random.default_rng(0)
        cin, cout = 3, 16
        x = rng.normal(size=(2, 8, 8, cin)).astype(np.float32)

        blk = PassportBlock(features=cout, alpha=0.1)
        v = blk.init(RNGS, jnp.asarray(x))
        y = blk.apply(v, jnp.asarray(x), train=False)

        w = np.asarray(v["params"]["conv"]["kernel"])  # HWIO
        key = np.asarray(v["passport"]["key"])
        skey = np.asarray(v["passport"]["skey"])

        tw = torch.tensor(w).permute(3, 2, 0, 1)
        tx = torch.tensor(x).permute(0, 3, 1, 2)

        def tconv(t):
            return F.conv2d(torch.tensor(t).permute(0, 3, 1, 2), tw, padding=1)

        scale = tconv(skey).flatten(2).mean(2).mean(0).view(1, -1, 1, 1)
        bias = tconv(key).flatten(2).mean(2).mean(0).view(1, -1, 1, 1)
        ty = F.conv2d(tx, tw, padding=1)
        # eval-mode affine-free BN with fresh running stats (mean 0, var 1)
        ty = F.batch_norm(ty, torch.zeros(cout), torch.ones(cout), eps=1e-5)
        ty = F.relu(scale * ty + bias)

        np.testing.assert_allclose(
            np.asarray(y),
            ty.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-5,
        )


class TestConfigBuilder:
    def test_from_dict_alias(self):
        """The reference exposes both construct_passport_kwargs and
        construct_passport_kwargs_from_dict (experiments/utils.py:6-97);
        here the dict form is canonical and the _from_dict name is an alias."""
        from deepipr_tpu.utils import construct_passport_kwargs_from_dict
        kw, plkeys = construct_passport_kwargs_from_dict(
            {"4": True, "5": "hi", "2": False}, "bn", "shuffle", 0.1
        )
        assert plkeys == ["4", "5"]
        assert kw["5"]["b"] == "hi" and kw["5"]["flag"] is True
        assert kw["2"]["flag"] is False
