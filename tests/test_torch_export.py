"""Export OUR checkpoints into the reference's PyTorch layout and prove the
ACTUAL reference code (/root/reference) loads them with strict=True and
reproduces our model bit-for-bit-signed / logit-close.

This is the inverse direction of test_reference_parity.py: a reference user
can take a model trained in this framework and verify ownership inside their
own PyTorch stack.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepipr_tpu.attacks.common import derived_affines
from deepipr_tpu.interop.torch_export import export_torch_state_dict
from deepipr_tpu.interop.torch_import import import_torch_checkpoint
from deepipr_tpu.models import AlexNet, ResNet18
from deepipr_tpu.train.keys import setup_passports
from deepipr_tpu.utils.config import construct_passport_kwargs

from test_reference_parity import _ref_layer_kwargs, _stub_torchvision

REFERENCE = "/root/reference"
RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


@pytest.fixture(scope="module")
def ref():
    _stub_torchvision()
    sys.path.insert(0, REFERENCE)
    try:
        import models.alexnet_passport as alexnet_passport
        import models.alexnet_passport_private as alexnet_private
        import models.resnet_passport_private as resnet_private

        yield {
            "alexnet_v1": alexnet_passport.AlexNetPassport,
            "alexnet_private": alexnet_private.AlexNetPassportPrivate,
            "resnet_private": resnet_private.ResNet18Private,
        }
    finally:
        sys.path.remove(REFERENCE)


def _ours_with_keys(model_fn, cfg, arch_normal_fn):
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = model_fn(kw)
    variables = dict(model.init(RNGS, jnp.zeros((2, 32, 32, 3)), train=True))

    normal = arch_normal_fn()
    nv = normal.init({"params": jax.random.key(5)},
                     jnp.zeros((2, 32, 32, 3)), train=True)
    imgs = np.random.default_rng(3).standard_normal((20, 32, 32, 3)).astype(np.float32)
    variables["passport"] = setup_passports(normal, nv, variables["passport"],
                                            imgs, imgs, seed=4)

    # move BN stats off init so eval parity is non-trivial
    x = jnp.asarray(np.random.default_rng(4).standard_normal((8, 32, 32, 3)),
                    jnp.float32)
    for ind in (0, 1):
        _, upd = model.apply(variables, x, ind=ind, train=True,
                             mutable=["batch_stats", "passport_aux"])
        variables["batch_stats"] = upd["batch_stats"]
    return model, variables


class TestAlexNetExport:
    @pytest.fixture(scope="class")
    def pair(self, ref):
        cfg = {"0": False, "2": False, "4": "hi", "5": True, "6": True}
        model, variables = _ours_with_keys(
            lambda kw: AlexNet(num_classes=10, passport_kwargs=kw, private=True),
            cfg,
            lambda: AlexNet(num_classes=10),
        )
        sd = export_torch_state_dict(model, variables)
        ref_kwargs = {
            "0": _ref_layer_kwargs(False), "2": _ref_layer_kwargs(False),
            "4": _ref_layer_kwargs(True, b="hi"), "5": _ref_layer_kwargs(True),
            "6": _ref_layer_kwargs(True),
        }
        tmodel = ref["alexnet_private"](3, 10, ref_kwargs)
        missing, unexpected = tmodel.load_state_dict(sd, strict=True)
        assert not missing and not unexpected
        tmodel.eval()
        return model, variables, tmodel

    @pytest.mark.parametrize("ind", [0, 1])
    def test_reference_reproduces_our_logits(self, pair, ind):
        model, variables, tmodel = pair
        x = np.random.default_rng(7).standard_normal((4, 32, 32, 3)).astype(np.float32)
        ours = np.asarray(model.apply(variables, jnp.asarray(x), ind=ind,
                                      train=False))
        with torch.no_grad():
            theirs = tmodel(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
                            ind=ind).numpy()
        np.testing.assert_allclose(theirs, ours, rtol=1e-3, atol=2e-4)

    def test_reference_decodes_our_signature(self, pair):
        """The reference's own get_scale reproduces our derived scales with
        exact sign agreement — their test_signature verifies our model."""
        model, variables, tmodel = pair
        ours = derived_affines(model, variables, (1, 32, 32, 3), private=True)
        for name, mod in tmodel.named_modules():
            if type(mod).__name__ == "PassportPrivateBlock":
                path = f"features_{name.split('.')[-1]}"
                with torch.no_grad():
                    t_scale = mod.get_scale(True).flatten().numpy()
                j_scale = np.asarray(ours[path]["scale"]).flatten()
                np.testing.assert_allclose(t_scale, j_scale, rtol=1e-3,
                                           atol=1e-5)
                assert np.array_equal(np.sign(t_scale), np.sign(j_scale))
                np.testing.assert_array_equal(
                    mod.b.numpy(),
                    np.asarray(variables["signature"][path]["b"]))

    def test_round_trip_is_exact(self, pair):
        model, variables, _ = pair
        sd = export_torch_state_dict(model, variables)
        tmpl = model.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)
        back = import_torch_checkpoint(sd, tmpl, strict=True)
        for coll in ("params", "batch_stats", "passport", "signature"):
            jax.tree.map(np.testing.assert_array_equal,
                         back[coll], dict(variables[coll]))


class TestV1Export:
    def test_reference_v1_loads_and_reproduces(self, ref):
        """V1 (non-private) passport export: key/skey without the _private
        suffix, sign_loss (not sign_loss_private) alias."""
        cfg = {"0": False, "2": False, "4": "hi", "5": True, "6": True}
        model, variables = _ours_with_keys(
            lambda kw: AlexNet(num_classes=10, passport_kwargs=kw),
            cfg,
            lambda: AlexNet(num_classes=10),
        )
        sd = export_torch_state_dict(model, variables)
        ref_kwargs = {
            "0": _ref_layer_kwargs(False), "2": _ref_layer_kwargs(False),
            "4": _ref_layer_kwargs(True, b="hi"), "5": _ref_layer_kwargs(True),
            "6": _ref_layer_kwargs(True),
        }
        tmodel = ref["alexnet_v1"](3, 10, ref_kwargs)
        missing, unexpected = tmodel.load_state_dict(sd, strict=True)
        assert not missing and not unexpected
        tmodel.eval()

        x = np.random.default_rng(7).standard_normal((4, 32, 32, 3)).astype(np.float32)
        ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        with torch.no_grad():
            theirs = tmodel(torch.from_numpy(
                np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
        np.testing.assert_allclose(theirs, ours, rtol=1e-3, atol=2e-4)


class TestResNetExport:
    def test_imagenet_stem_loads_and_reproduces(self, ref):
        """ImageNet-stem export: the stem rides inside the reference's
        nn.Sequential (convbnrelu_1.0.*, resnet_passport_private.py:96-99)."""
        from deepipr_tpu.utils.config import load_passport_config

        cfg = load_passport_config("passport_configs/resnet18_passport.json")
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        model = ResNet18(num_classes=10, passport_kwargs=kw, private=True,
                         imagenet=True)
        variables = dict(model.init(RNGS, jnp.zeros((2, 64, 64, 3)),
                                    train=True))
        x = jnp.asarray(
            np.random.default_rng(4).standard_normal((2, 64, 64, 3)),
            jnp.float32)
        _, upd = model.apply(variables, x, ind=0, train=True,
                             mutable=["batch_stats", "passport_aux"])
        variables["batch_stats"] = upd["batch_stats"]

        sd = export_torch_state_dict(model, variables)
        tmodel = ref["resnet_private"](num_classes=10, passport_kwargs=kw,
                                       imagenet=True)
        missing, unexpected = tmodel.load_state_dict(sd, strict=True)
        assert not missing and not unexpected
        tmodel.eval()
        xe = np.random.default_rng(8).standard_normal((2, 64, 64, 3)).astype(np.float32)
        for ind in (0, 1):
            ours = np.asarray(model.apply(variables, jnp.asarray(xe), ind=ind,
                                          train=False))
            with torch.no_grad():
                theirs = tmodel(torch.from_numpy(
                    np.ascontiguousarray(xe.transpose(0, 3, 1, 2))),
                    ind=ind).numpy()
            np.testing.assert_allclose(theirs, ours, rtol=1e-3, atol=3e-4)

    def test_reference_loads_and_reproduces(self, ref):
        from deepipr_tpu.utils.config import load_passport_config

        cfg = load_passport_config("passport_configs/resnet18_passport.json")
        model, variables = _ours_with_keys(
            lambda kw: ResNet18(num_classes=10, passport_kwargs=kw,
                                private=True),
            cfg,
            lambda: ResNet18(num_classes=10),
        )
        sd = export_torch_state_dict(model, variables)

        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        tmodel = ref["resnet_private"](num_classes=10, passport_kwargs=kw)
        missing, unexpected = tmodel.load_state_dict(sd, strict=True)
        assert not missing and not unexpected
        tmodel.eval()

        x = np.random.default_rng(8).standard_normal((4, 32, 32, 3)).astype(np.float32)
        for ind in (0, 1):
            ours = np.asarray(model.apply(variables, jnp.asarray(x), ind=ind,
                                          train=False))
            with torch.no_grad():
                theirs = tmodel(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
                                ind=ind).numpy()
            np.testing.assert_allclose(theirs, ours, rtol=1e-3, atol=3e-4)
