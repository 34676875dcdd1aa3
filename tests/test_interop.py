"""Interop tests: torch checkpoint import with bit-exact signature decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from deepipr_tpu.attacks.common import derived_affines
from deepipr_tpu.interop.torch_import import (
    convert_torch_state_dict,
    import_torch_checkpoint,
)
from deepipr_tpu.models import AlexNet, ResNet18
from deepipr_tpu.passport.codec import bit_accuracy
from deepipr_tpu.utils.config import construct_passport_kwargs

RNGS = {"params": jax.random.key(0), "passport": jax.random.key(1)}


def make_alexnet_private_torch_sd(rng, size=32, nclass=10, private=True):
    """A reference-layout state dict for the CIFAR AlexNet private model."""
    sd = {}
    chans = {"0": (3, 64, 5), "2": (64, 192, 5), "4": (192, 384, 3),
             "5": (384, 256, 3), "6": (256, 256, 3)}
    spatial = {"0": 32, "2": 16, "4": 8, "5": 8, "6": 8}
    passport_layers = ("4", "5", "6")
    for idx, (cin, cout, k) in chans.items():
        p = f"features.{idx}"
        sd[f"{p}.conv.weight"] = torch.tensor(
            rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05)
        sd[f"{p}.bn.running_mean"] = torch.zeros(cout)
        sd[f"{p}.bn.running_var"] = torch.ones(cout)
        sd[f"{p}.bn.num_batches_tracked"] = torch.tensor(0)
        if idx in passport_layers:
            kn = "key_private" if private else "key"
            skn = "skey_private" if private else "skey"
            s = spatial[idx]
            sd[f"{p}.{kn}"] = torch.tensor(
                rng.normal(size=(1, cin, s, s)).astype(np.float32))
            sd[f"{p}.{skn}"] = torch.tensor(
                rng.normal(size=(1, cin, s, s)).astype(np.float32))
            sd[f"{p}.b"] = torch.tensor(
                np.sign(rng.normal(size=cout)).astype(np.float32))
            if private:
                sd[f"{p}.scale"] = torch.ones(cout)
                sd[f"{p}.bias"] = torch.zeros(cout)
                sd[f"{p}.sign_loss_private.b"] = sd[f"{p}.b"].clone()
        else:
            sd[f"{p}.bn.weight"] = torch.ones(cout)
            sd[f"{p}.bn.bias"] = torch.zeros(cout)
    sd["classifier.weight"] = torch.tensor(
        rng.normal(size=(nclass, 4096)).astype(np.float32) * 0.01)
    sd["classifier.bias"] = torch.zeros(nclass)
    return sd


class TestTorchImport:
    def test_alexnet_private_full_import_and_bit_exact_decode(self):
        rng = np.random.default_rng(0)
        sd = make_alexnet_private_torch_sd(rng)

        cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
        tmpl = model.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)

        variables = import_torch_checkpoint(sd, tmpl, strict=True)

        # forward works with imported weights
        y = model.apply(variables, jnp.zeros((2, 32, 32, 3)), ind=1)
        assert y.shape == (2, 10)

        # derived scale must agree in SIGN with torch's conv+GAP, bit-exactly
        affines = derived_affines(model, variables, (1, 32, 32, 3), private=True)
        for idx in ("4", "5", "6"):
            path = f"features_{idx}"
            w = sd[f"features.{idx}.conv.weight"]
            skey = sd[f"features.{idx}.skey_private"]
            torch_scale = F.conv2d(skey, w, padding=1).flatten(2).mean(2).mean(0)
            ours = np.asarray(affines[path]["scale"])
            np.testing.assert_allclose(ours, torch_scale.numpy(),
                                       rtol=1e-3, atol=1e-5)
            assert np.array_equal(np.sign(ours), np.sign(torch_scale.numpy()))
            # signature b imported exactly
            np.testing.assert_array_equal(
                np.asarray(variables["signature"][path]["b"]),
                sd[f"features.{idx}.b"].numpy(),
            )

    def test_unmatched_key_raises_in_strict_mode(self):
        rng = np.random.default_rng(0)
        sd = make_alexnet_private_torch_sd(rng)
        sd["features.4.bogus"] = torch.zeros(3)
        cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
        tmpl = model.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)
        with pytest.raises(ValueError, match="bogus"):
            import_torch_checkpoint(sd, tmpl, strict=True)

    def test_resnet_key_mapping(self):
        """layerN.i.sub and linear keys map to our module paths."""
        sd = {
            "convbnrelu_1.conv.weight": torch.zeros(64, 3, 3, 3),
            "layer4.0.convbnrelu_1.conv.weight": torch.zeros(512, 256, 3, 3),
            "layer4.0.shortcut.conv.weight": torch.zeros(512, 256, 1, 1),
            "linear.weight": torch.zeros(10, 512),
            "linear.bias": torch.zeros(10),
        }
        flat, skipped = convert_torch_state_dict(sd)
        assert "params/convbnrelu_1/conv/kernel" in flat
        assert "params/layer4_0/convbnrelu_1/conv/kernel" in flat
        assert "params/layer4_0/shortcut/conv/kernel" in flat
        assert flat["params/linear/kernel"].shape == (512, 10)
        assert not skipped

    def test_resnet18_private_roundtrip_shapes(self):
        """Every leaf of a real ResNet18Private template is fillable from a
        synthetic reference-layout state dict built from the template."""
        import json

        cfg = json.load(open("passport_configs/resnet18_passport.json"))
        kw, plkeys = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        model = ResNet18(num_classes=10, passport_kwargs=kw, private=True)
        tmpl = model.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=True)

        # build the torch-side dict by inverting our mapping
        from deepipr_tpu.utils.tree import flatten_paths

        sd = {}
        for path, v in flatten_paths(dict(tmpl)).items():
            col, rest = path.split("/", 1)
            mod = rest.replace("/", ".")
            for li in range(1, 5):
                mod = mod.replace(f"layer{li}_", f"layer{li}.")
            arr = torch.tensor(np.asarray(v))
            if col == "params" and mod.endswith(".conv.kernel"):
                sd[mod[:-7] + ".weight"] = arr.permute(3, 2, 0, 1)
            elif col == "params" and mod.endswith(".bn.scale"):
                sd[mod[:-6] + ".weight"] = arr
            elif col == "params" and mod.endswith(".bn.bias"):
                sd[mod] = arr
            elif col == "params" and mod.endswith(("linear.kernel",)):
                sd["linear.weight"] = arr.permute(1, 0)
            elif col == "params" and mod == "linear.bias":
                sd[mod] = arr
            elif col == "params" and mod.endswith((".scale", ".bias")):
                sd[mod] = arr  # private public affine
            elif col == "batch_stats" and mod.endswith(".bn.mean"):
                sd[mod[:-5] + ".running_mean"] = arr
            elif col == "batch_stats" and mod.endswith(".bn.var"):
                sd[mod[:-4] + ".running_var"] = arr
            elif col == "passport":
                leaf = "key_private" if mod.endswith(".key") else "skey_private"
                sd[mod.rsplit(".", 1)[0] + "." + leaf] = arr.permute(0, 3, 1, 2)
            elif col == "signature":
                sd[mod] = arr
        variables = import_torch_checkpoint(sd, tmpl, strict=True)
        y = model.apply(variables, jnp.zeros((1, 32, 32, 3)), ind=1)
        assert y.shape == (1, 10)
