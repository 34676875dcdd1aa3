"""Behavioral parity against the ACTUAL reference code (/root/reference).

Unlike test_interop.py (which builds reference-*layout* state dicts by hand),
these tests instantiate the reference's own PyTorch modules, run its real
``set_intermediate_keys`` / forwards, save the genuine ``state_dict()``, import
it through ``interop.torch_import``, and assert:

  (i)   eval-mode forward logits match within f32 tolerance on both branches,
  (ii)  passport-derived scales/biases agree (and are sign-exact),
  (iii) an ASCII signature embedded by the reference decodes here.

Reference entry points exercised: models/alexnet_passport_private.py:103-121,
models/resnet_passport_private.py:143-186, models/layers/passportconv2d.py,
models/layers/passportconv2d_private.py:139-219.
"""

import json
import random
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepipr_tpu.attacks.common import derived_affines
from deepipr_tpu.interop.torch_import import import_torch_checkpoint
from deepipr_tpu.models import AlexNet, ResNet18
from deepipr_tpu.passport.codec import bits_to_string, decode_bits
from deepipr_tpu.utils.config import construct_passport_kwargs

REFERENCE = "/root/reference"
RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}
SECRET = "this is mine"  # 12 chars = 96 bits, fits 384 channels of layer 4


def _stub_torchvision():
    """The reference model files import torchvision at module scope purely for
    the pretrained=True paths (alexnet_passport_private.py:3); torchvision is
    not installed here, and those paths are never taken in these tests."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stub: pretrained weights unavailable")

    tvm.alexnet = _unavailable
    tvm.resnet18 = _unavailable
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm


@pytest.fixture(scope="module")
def ref():
    """The reference package, imported from /root/reference."""
    _stub_torchvision()
    sys.path.insert(0, REFERENCE)
    try:
        import models.alexnet_normal as alexnet_normal
        import models.alexnet_passport as alexnet_passport
        import models.alexnet_passport_private as alexnet_private
        import models.resnet_normal as resnet_normal
        import models.resnet_passport_private as resnet_private

        yield types.SimpleNamespace(
            alexnet_normal=alexnet_normal.AlexNetNormal,
            alexnet_passport=alexnet_passport.AlexNetPassport,
            alexnet_private=alexnet_private.AlexNetPassportPrivate,
            resnet_normal=resnet_normal.ResNet18,
            resnet_private=resnet_private.ResNet18Private,
        )
    finally:
        sys.path.remove(REFERENCE)


def _ref_layer_kwargs(flag, b=None, key_type="shuffle", sign_loss=0.1):
    kw = {"flag": bool(flag) or b is not None, "norm_type": "bn",
          "key_type": key_type, "sign_loss": sign_loss}
    if b is not None:
        kw["b"] = b
    return kw


def _seed_everything(seed=0):
    torch.manual_seed(seed)
    random.seed(seed)
    np.random.seed(seed)


def _nhwc(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def _torch_name_to_path(name):
    """torch module name -> our flax module path.

    'features.4' -> 'features_4'; 'layer4.0.convbnrelu_1' ->
    'layer4_0/convbnrelu_1'; 'convbnrelu_1' -> itself.
    """
    parts = name.split(".")
    if parts[0] == "features":
        return f"features_{parts[1]}"
    if len(parts) == 3:
        return f"{parts[0]}_{parts[1]}/{parts[2]}"
    return name


def _torch_derived_affines(torch_model):
    """{module path: (scale, bias)} via the reference's own get_scale/get_bias
    (passportconv2d_private.py:139-173 with force_passport=True)."""
    out = {}
    for name, mod in torch_model.named_modules():
        if type(mod).__name__ in ("PassportBlock", "PassportPrivateBlock"):
            with torch.no_grad():
                s = mod.get_scale(True).flatten().numpy()
                bias = mod.get_bias(True).flatten().numpy()
            out[_torch_name_to_path(name)] = (s, bias)
    return out


class TestAlexNetPrivateParity:
    """V2/V3 AlexNet: reference model -> real state_dict -> our variables."""

    @pytest.fixture(scope="class")
    def pair(self, ref):
        _seed_everything(0)
        ref_kwargs = {
            "0": _ref_layer_kwargs(False),
            "2": _ref_layer_kwargs(False),
            "4": _ref_layer_kwargs(True, b=SECRET),
            "5": _ref_layer_kwargs(True),
            "6": _ref_layer_kwargs(True),
        }
        tmodel = ref.alexnet_private(3, 10, ref_kwargs)
        pretrained = ref.alexnet_normal(3, 10, "bn")

        # the reference key-setup pass: 20 candidate images, channel-shuffled
        key_x, key_y = torch.randn(20, 3, 32, 32), torch.randn(20, 3, 32, 32)
        tmodel.set_intermediate_keys(pretrained, key_x, key_y)

        # move BN running stats off their init so eval parity is non-trivial
        tmodel.train()
        with torch.no_grad():
            for _ in range(2):
                xb = torch.randn(8, 3, 32, 32)
                tmodel(xb, ind=0)
                tmodel(xb, ind=1)
        tmodel.eval()

        cfg = {"0": False, "2": False, "4": SECRET, "5": True, "6": True}
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        jmodel = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
        tmpl = jmodel.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)
        variables = import_torch_checkpoint(tmodel.state_dict(), tmpl,
                                            strict=True)
        return tmodel, jmodel, variables

    @pytest.mark.parametrize("ind", [0, 1])
    def test_eval_logits_match(self, pair, ind):
        tmodel, jmodel, variables = pair
        x = torch.randn(4, 3, 32, 32, generator=torch.Generator().manual_seed(7))
        with torch.no_grad():
            want = tmodel(x, ind=ind).numpy()
        got = np.asarray(jmodel.apply(variables, _nhwc(x), ind=ind,
                                      train=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    def test_derived_affines_match_and_sign_exact(self, pair):
        tmodel, jmodel, variables = pair
        ours = derived_affines(jmodel, variables, (1, 32, 32, 3), private=True)
        theirs = _torch_derived_affines(tmodel)
        assert set(ours) == set(theirs)
        for path, (t_scale, t_bias) in theirs.items():
            j_scale = np.asarray(ours[path]["scale"]).flatten()
            j_bias = np.asarray(ours[path]["bias"]).flatten()
            np.testing.assert_allclose(j_scale, t_scale, rtol=1e-3, atol=1e-5)
            np.testing.assert_allclose(j_bias, t_bias, rtol=1e-3, atol=1e-5)
            assert np.array_equal(np.sign(j_scale), np.sign(t_scale))

    def test_reference_embedded_ascii_decodes_here(self, pair):
        tmodel, jmodel, variables = pair
        b = np.asarray(variables["signature"]["features_4"]["b"])
        np.testing.assert_array_equal(
            b, tmodel.features[4].b.numpy())  # buffer imported exactly
        bits = np.asarray(decode_bits(jnp.asarray(b)))
        assert bits_to_string(bits[: len(SECRET) * 8]) == SECRET


class TestAlexNetV1Parity:
    """V1 AlexNet: derived-affine-only forward (passportconv2d.py:209-223)."""

    def test_eval_logits_match(self, ref):
        _seed_everything(1)
        ref_kwargs = {
            "0": _ref_layer_kwargs(False),
            "2": _ref_layer_kwargs(False),
            "4": _ref_layer_kwargs(True),
            "5": _ref_layer_kwargs(True),
            "6": _ref_layer_kwargs(True),
        }
        tmodel = ref.alexnet_passport(3, 10, ref_kwargs)
        pretrained = ref.alexnet_normal(3, 10, "bn")
        tmodel.set_intermediate_keys(
            pretrained, torch.randn(20, 3, 32, 32), torch.randn(20, 3, 32, 32))
        tmodel.train()
        with torch.no_grad():
            tmodel(torch.randn(8, 3, 32, 32))
        tmodel.eval()

        cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        jmodel = AlexNet(num_classes=10, passport_kwargs=kw, private=False)
        tmpl = jmodel.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)
        variables = import_torch_checkpoint(tmodel.state_dict(), tmpl,
                                            strict=True)

        x = torch.randn(4, 3, 32, 32, generator=torch.Generator().manual_seed(3))
        with torch.no_grad():
            want = tmodel(x).numpy()
        got = np.asarray(jmodel.apply(variables, _nhwc(x), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


class TestAlexNetImageNetParity:
    """ImageNet-shaped AlexNet: exercises the AdaptiveAvgPool(6,6) + 3-layer
    classifier path and the classifier_1 (256*6*6 -> 4096) flatten-order
    import (interop _FLATTENED_LINEAR_SHAPES second entry)."""

    def test_eval_logits_match(self, ref):
        _seed_everything(4)
        ref_kwargs = {
            "0": _ref_layer_kwargs(False),
            "2": _ref_layer_kwargs(False),
            "4": _ref_layer_kwargs(True),
            "5": _ref_layer_kwargs(True),
            "6": _ref_layer_kwargs(True),
        }
        tmodel = ref.alexnet_private(3, 1000, ref_kwargs)
        pretrained = ref.alexnet_normal(3, 1000, "bn")
        tmodel.set_intermediate_keys(
            pretrained, torch.randn(4, 3, 224, 224), torch.randn(4, 3, 224, 224))
        tmodel.eval()

        cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        jmodel = AlexNet(num_classes=1000, passport_kwargs=kw, private=True)
        rngs = dict(RNGS, dropout=jax.random.key(9))
        tmpl = jmodel.init(rngs, jnp.zeros((1, 224, 224, 3)), train=False)
        variables = import_torch_checkpoint(tmodel.state_dict(), tmpl,
                                            strict=True)

        x = torch.randn(2, 3, 224, 224,
                        generator=torch.Generator().manual_seed(11))
        for ind in (0, 1):
            with torch.no_grad():
                want = tmodel(x, ind=ind).numpy()
            got = np.asarray(jmodel.apply(variables, _nhwc(x), ind=ind,
                                          train=False))
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)


class TestResNet18PrivateParity:
    """Flagship ResNet-18 V2 with the shipped passport config."""

    @pytest.fixture(scope="class")
    def pair(self, ref):
        _seed_everything(2)
        cfg = json.load(open("passport_configs/resnet18_passport.json"))
        ref_kwargs = {}
        for lk, v in cfg.items():
            if isinstance(v, dict):
                ref_kwargs[lk] = {
                    i: {m: _ref_layer_kwargs(flag) for m, flag in mods.items()}
                    for i, mods in v.items()
                }
            else:
                ref_kwargs[lk] = _ref_layer_kwargs(v)
        tmodel = ref.resnet_private(num_classes=10, passport_kwargs=ref_kwargs)
        pretrained = ref.resnet_normal(num_classes=10, norm_type="bn")
        tmodel.set_intermediate_keys(
            pretrained, torch.randn(20, 3, 32, 32), torch.randn(20, 3, 32, 32))
        tmodel.train()
        with torch.no_grad():
            xb = torch.randn(8, 3, 32, 32)
            tmodel(xb, ind=0)
            tmodel(xb, ind=1)
        tmodel.eval()

        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        jmodel = ResNet18(num_classes=10, passport_kwargs=kw, private=True)
        tmpl = jmodel.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)
        variables = import_torch_checkpoint(tmodel.state_dict(), tmpl,
                                            strict=True)
        return tmodel, jmodel, variables

    @pytest.mark.parametrize("ind", [0, 1])
    def test_eval_logits_match(self, pair, ind):
        tmodel, jmodel, variables = pair
        x = torch.randn(4, 3, 32, 32, generator=torch.Generator().manual_seed(5))
        with torch.no_grad():
            want = tmodel(x, ind=ind).numpy()
        got = np.asarray(jmodel.apply(variables, _nhwc(x), ind=ind,
                                      train=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    def test_derived_scales_sign_exact(self, pair):
        tmodel, jmodel, variables = pair
        ours = derived_affines(jmodel, variables, (1, 32, 32, 3), private=True)
        theirs = _torch_derived_affines(tmodel)
        assert set(ours) == set(theirs)
        for path, (t_scale, _) in theirs.items():
            j_scale = np.asarray(ours[path]["scale"]).flatten()
            np.testing.assert_allclose(j_scale, t_scale, rtol=1e-3, atol=1e-5)
            assert np.array_equal(np.sign(j_scale), np.sign(t_scale))
