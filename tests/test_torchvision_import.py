"""torchvision-format checkpoint import (built-by-hand state dicts —
torchvision itself is not installed in this environment)."""

import jax
import jax.numpy as jnp
import torch

from deepipr_tpu.interop.torchvision_import import import_torchvision
from deepipr_tpu.models import AlexNet, ResNet18


def tv_alexnet_sd():
    """Standard torchvision AlexNet state-dict keys/shapes."""
    convs = {  # idx: (cout, cin, k)
        "0": (64, 3, 11), "3": (192, 64, 5), "6": (384, 192, 3),
        "8": (256, 384, 3), "10": (256, 256, 3),
    }
    sd = {}
    for i, (co, ci, k) in convs.items():
        sd[f"features.{i}.weight"] = torch.zeros(co, ci, k, k)
        sd[f"features.{i}.bias"] = torch.zeros(co)
    for i, (o, n) in {"1": (4096, 9216), "4": (4096, 4096),
                      "6": (1000, 4096)}.items():
        sd[f"classifier.{i}.weight"] = torch.zeros(o, n)
        sd[f"classifier.{i}.bias"] = torch.zeros(o)
    return sd


def tv_resnet18_sd():
    sd = {"conv1.weight": torch.zeros(64, 3, 7, 7)}
    for p in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{p}"] = torch.zeros(64)
    sd["bn1.num_batches_tracked"] = torch.tensor(0)
    chans = {"layer1": (64, 64), "layer2": (64, 128),
             "layer3": (128, 256), "layer4": (256, 512)}
    for layer, (cin, cout) in chans.items():
        for b in range(2):
            c1_in = cin if b == 0 else cout
            sd[f"{layer}.{b}.conv1.weight"] = torch.zeros(cout, c1_in, 3, 3)
            sd[f"{layer}.{b}.conv2.weight"] = torch.zeros(cout, cout, 3, 3)
            for bn in ("bn1", "bn2"):
                for p in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{layer}.{b}.{bn}.{p}"] = torch.zeros(cout)
                sd[f"{layer}.{b}.{bn}.num_batches_tracked"] = torch.tensor(0)
            if b == 0 and layer != "layer1":
                sd[f"{layer}.0.downsample.0.weight"] = torch.zeros(cout, cin, 1, 1)
                for p in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{layer}.0.downsample.1.{p}"] = torch.zeros(cout)
                sd[f"{layer}.0.downsample.1.num_batches_tracked"] = torch.tensor(0)
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def test_alexnet_torchvision_import():
    model = AlexNet(num_classes=1000, norm_type="none")
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(2)}
    tmpl = model.init(rngs, jnp.zeros((1, 224, 224, 3)), train=False)
    v = import_torchvision(tv_alexnet_sd(), tmpl, "alexnet")
    y = model.apply(v, jnp.zeros((1, 224, 224, 3)))
    assert y.shape == (1, 1000)


def test_resnet18_torchvision_import():
    model = ResNet18(num_classes=1000)
    tmpl = model.init({"params": jax.random.key(0)},
                      jnp.zeros((1, 224, 224, 3)), train=False)
    v = import_torchvision(tv_resnet18_sd(), tmpl, "resnet18")
    y = model.apply(v, jnp.zeros((1, 224, 224, 3)))
    assert y.shape == (1, 1000)


def tv_resnet50_sd():
    """torchvision ResNet-50 (Bottleneck) state-dict keys/shapes."""
    sd = {"conv1.weight": torch.zeros(64, 3, 7, 7)}
    for p in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{p}"] = torch.zeros(64)
    sd["bn1.num_batches_tracked"] = torch.tensor(0)
    layers = {"layer1": (64, 64, 3), "layer2": (256, 128, 4),
              "layer3": (512, 256, 6), "layer4": (1024, 512, 3)}
    for layer, (cin, planes, nblocks) in layers.items():
        cout = planes * 4
        for b in range(nblocks):
            c1_in = cin if b == 0 else cout
            sd[f"{layer}.{b}.conv1.weight"] = torch.zeros(planes, c1_in, 1, 1)
            sd[f"{layer}.{b}.conv2.weight"] = torch.zeros(planes, planes, 3, 3)
            sd[f"{layer}.{b}.conv3.weight"] = torch.zeros(cout, planes, 1, 1)
            for bn, ch in (("bn1", planes), ("bn2", planes), ("bn3", cout)):
                for p in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{layer}.{b}.{bn}.{p}"] = torch.zeros(ch)
                sd[f"{layer}.{b}.{bn}.num_batches_tracked"] = torch.tensor(0)
            if b == 0:  # every layer's first block projects (cin != cout)
                sd[f"{layer}.0.downsample.0.weight"] = torch.zeros(cout, cin, 1, 1)
                for p in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{layer}.0.downsample.1.{p}"] = torch.zeros(cout)
                sd[f"{layer}.0.downsample.1.num_batches_tracked"] = torch.tensor(0)
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def test_resnet50_torchvision_import():
    from deepipr_tpu.models import ResNet50

    model = ResNet50(num_classes=1000, imagenet=True)
    tmpl = model.init({"params": jax.random.key(0)},
                      jnp.zeros((1, 224, 224, 3)), train=False)
    v = import_torchvision(tv_resnet50_sd(), tmpl, "resnet50")
    y = model.apply(v, jnp.zeros((1, 224, 224, 3)))
    assert y.shape == (1, 1000)


class TestLoadTorchPretrained:
    """--pretrained-path .pth dispatch: layout sniffing + CLI wiring
    (reference classification.py:72-91 accepts both a trained checkpoint
    and the torchvision download; we accept both as files)."""

    def test_torchvision_layout_sniffed(self, tmp_path):
        from deepipr_tpu.interop.torchvision_import import load_torch_pretrained

        sd = tv_resnet18_sd()
        sd["conv1.weight"] = torch.full((64, 3, 7, 7), 0.125)
        p = tmp_path / "tv_resnet18.pth"
        torch.save(sd, p)
        model = ResNet18(num_classes=1000)
        tmpl = model.init({"params": jax.random.key(0)},
                          jnp.zeros((1, 224, 224, 3)), train=False)
        v = load_torch_pretrained(str(p), tmpl, "resnet")
        assert float(v["params"]["convbnrelu_1"]["conv"]["kernel"][0, 0, 0, 0]) == 0.125

    def test_reference_layout_sniffed(self, tmp_path):
        import numpy as np

        from deepipr_tpu.interop.torchvision_import import load_torch_pretrained
        from deepipr_tpu.interop.torch_export import export_torch_state_dict

        model = ResNet18(num_classes=10)
        tmpl = model.init({"params": jax.random.key(1)},
                          jnp.zeros((1, 32, 32, 3)), train=False)
        sd = export_torch_state_dict(model, tmpl)
        p = tmp_path / "reference.pth"
        torch.save({"state_dict": sd}, p)  # wrapped, as many .pth are
        v = load_torch_pretrained(str(p), tmpl, "resnet")
        k0 = tmpl["params"]["convbnrelu_1"]["conv"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(v["params"]["convbnrelu_1"]["conv"]["kernel"]),
            np.asarray(k0), rtol=0, atol=0)

    def test_experiment_pretrained_path_pth(self, tmp_path):
        """A torch .pth flows through Experiment._load_pretrained_state for
        key derivation (train CLI --pretrained-path semantics)."""
        from deepipr_tpu.interop.torch_export import export_torch_state_dict
        from deepipr_tpu.train.experiment import ClassificationExperiment

        src = ResNet18(num_classes=10)
        vars_src = src.init({"params": jax.random.key(3)},
                            jnp.zeros((1, 32, 32, 3)), train=False)
        p = tmp_path / "pre.pth"
        torch.save(export_torch_state_dict(src, vars_src), p)

        exp = ClassificationExperiment({
            "arch": "resnet", "dataset": "synthetic", "batch_size": 16,
            "epochs": 1, "lr": 0.01, "norm_type": "bn",
            "key_type": "shuffle", "sign_loss": 0.1,
            "train_passport": True, "train_backdoor": False,
            "train_private": False,
            "lr_config": "lr_configs/finetune.json",
            "passport_config": "passport_configs/resnet18_passport.json",
            "logdir": str(tmp_path / "logs"),
            "synthetic_train": 64, "synthetic_test": 32,
            "use_trigger_as_passport": False, "transfer_learning": False,
            "pretrained_path": str(p), "seed": 0,
        })
        # keys were derived (passport collection populated, no exception)
        assert exp.state.passport
