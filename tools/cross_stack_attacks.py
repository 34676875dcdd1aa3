"""Cross-stack ATTACK validation: each stack's attack-2/attack-3 run against
the OTHER stack's checkpoint (VERDICT r3 item 7, second half).

Attack-1 parity is validated natively in both stacks by
tools/cross_stack_parity.py; this closes the loop for the retraining attacks:

  - a V2 private AlexNet is trained in BOTH stacks on byte-identical
    synthetic data (reusing cross_stack_parity's run_torch/run_jax);
  - the jax checkpoint is exported to the reference's state-dict layout
    (interop/torch_export.py) and attacked by the REFERENCE'S OWN attack
    code — its importable train/test hot loops (passport_attack_2.py:26-113)
    and train_maximize (passport_attack_3.py:26-113), with the attack
    construction replicated line-for-line (cited below) on CPU;
  - the torch checkpoint is imported here (interop/torch_import.py) and
    attacked by THIS framework's attacks/reverse.py + attacks/ambiguity.py;
  - each attack also runs natively (jax-on-jax, torch-on-torch), giving a
    2x2 grid per attack whose endpoints must agree.

Run: python tools/cross_stack_attacks.py --out docs/demo
(CPU-only; the reference side cannot see a TPU and the comparison must share
an environment.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cross_stack_parity import (  # noqa: E402 (same tools/ dir)
    load_cfg,
    make_shared_data,
    ref_passport_kwargs,
    run_jax,
    run_torch,
)


def plkeys_for(arch: str):
    """Dotted passport-layer keys, the reference's plkeys format
    (experiments/utils.py construct_passport_kwargs_from_dict)."""
    from deepipr_tpu.utils.config import construct_passport_kwargs

    _, plkeys = construct_passport_kwargs(load_cfg(arch), "bn", "shuffle",
                                          0.1)
    return plkeys


def _ref_block(model, plkey):
    """Walk a reference model to the block a plkey names
    (passport_attack_2.py:180-199: features[i] for alexnet,
    layer_key[i].module_key for resnet)."""
    if plkey.isdigit():
        return model.features[int(plkey)]
    layer_key, i, module_key = plkey.split(".")
    return getattr(getattr(model, layer_key)[int(i)], module_key)


def _ref_passport_model(arch: str, scheme2_private: bool = True):
    """Construct the reference's private passport model for `arch`."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_reference_parity import _ref_layer_kwargs

    kwargs = ref_passport_kwargs(arch, load_cfg(arch), _ref_layer_kwargs)
    if arch == "alexnet":
        from models.alexnet_passport_private import AlexNetPassportPrivate

        return AlexNetPassportPrivate(3, 10, kwargs)
    from models.resnet_passport_private import ResNet18Private

    return ResNet18Private(num_classes=10, passport_kwargs=kwargs)


def _ref_normal_model(arch: str):
    """Scheme-2 attacker model: GN normal net (passport_attack_2.py:144-148)."""
    if arch == "alexnet":
        from models.alexnet_normal import AlexNetNormal

        return AlexNetNormal(3, 10, "gn")
    from models.resnet_normal import ResNet18

    return ResNet18(num_classes=10, norm_type="gn")


def _jax_models(arch: str):
    """(private passport model, GN normal attacker model) here."""
    from deepipr_tpu.models import AlexNet, ResNet18
    from deepipr_tpu.utils.config import construct_passport_kwargs

    kw, _ = construct_passport_kwargs(load_cfg(arch), "bn", "shuffle", 0.1)
    if arch == "alexnet":
        return (AlexNet(num_classes=10, passport_kwargs=kw, private=True),
                AlexNet(num_classes=10, norm_type="gn"))
    return (ResNet18(num_classes=10, passport_kwargs=kw, private=True),
            ResNet18(num_classes=10, norm_type="gn"))


def _stub_torchvision_full():
    """The reference attack MODULES (unlike its model files) import
    dataset.py at module scope, which imports torchvision.datasets/.transforms
    (reference dataset.py:9-11). None of those paths run here — the attack
    loops get our shared-tensor loaders — so register inert submodules."""
    import types

    from test_reference_parity import _stub_torchvision

    _stub_torchvision()
    if "torchvision.datasets" in sys.modules:
        return
    tv = sys.modules["torchvision"]
    ds = types.ModuleType("torchvision.datasets")
    cifar = types.ModuleType("torchvision.datasets.cifar")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision stub: datasets unavailable")

    cifar.CIFAR10 = cifar.CIFAR100 = _Unavailable
    folder = types.ModuleType("torchvision.datasets.folder")
    folder.pil_loader = folder.make_dataset = _Unavailable
    folder.IMG_EXTENSIONS = ()
    folder.ImageFolder = _Unavailable
    tf = types.ModuleType("torchvision.transforms")
    tf.transforms = types.SimpleNamespace()
    ds.cifar, ds.folder = cifar, folder
    tv.datasets, tv.transforms = ds, tf
    sys.modules["torchvision.datasets"] = ds
    sys.modules["torchvision.datasets.cifar"] = cifar
    sys.modules["torchvision.datasets.folder"] = folder
    sys.modules["torchvision.transforms"] = tf


def _batches(x, y, batch_size):
    """Re-iterable list of dict batches for the jax attack loops."""
    import numpy as np

    return [
        {"image": x[i:i + batch_size],
         "label": y[i:i + batch_size].astype(np.int32)}
        for i in range(0, len(x) - batch_size + 1, batch_size)
    ]


def _torch_loaders(data, batch_size):
    import numpy as np
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    xtr, ytr, xte, yte = data
    to_t = lambda a: torch.from_numpy(np.ascontiguousarray(
        a.transpose(0, 3, 1, 2)))
    g = torch.Generator().manual_seed(0)
    train = DataLoader(TensorDataset(to_t(xtr), torch.from_numpy(ytr)),
                       batch_size=batch_size, shuffle=True, drop_last=True,
                       generator=g)
    valid = DataLoader(TensorDataset(to_t(xte), torch.from_numpy(yte)),
                       batch_size=batch_size)
    return train, valid


# ------------------------------------------------------------ torch attacks


def torch_attack2(sd, data, epochs, lr=0.01, flipperc=0.0, seed=0,
                  batch_size=64, arch="alexnet"):
    """The reference's attack 2 on a state dict (passport_attack_2.py:
    119-316 construction, replicated; its train/test loops imported)."""
    import numpy as np
    import torch
    import torch.nn as nn

    plkeys = plkeys_for(arch)
    _stub_torchvision_full()
    sys.path.insert(0, REFERENCE)
    try:
        from passport_attack_2 import test, train

        torch.manual_seed(seed)
        np.random.seed(seed)
        trainloader, valloader = _torch_loaders(data, batch_size)

        passport_model = _ref_passport_model(arch)
        passport_model.load_state_dict(sd)
        # scheme 2 attacker model is GN (passport_attack_2.py:144-148)
        model = _ref_normal_model(arch)
        model.load_state_dict(sd, strict=False)

        for param in model.parameters():
            param.requires_grad_(False)
        # copy derived scale/bias into the affines (lines 179-199)
        for fidx in plkeys:
            blk, pblk = _ref_block(model, fidx), _ref_block(passport_model,
                                                            fidx)
            blk.bn.weight.data.copy_(pblk.get_scale().view(-1))
            blk.bn.bias.data.copy_(pblk.get_bias().view(-1))
            blk.bn.weight.requires_grad_(True)
            blk.bn.bias.requires_grad_(True)

        optimizer = torch.optim.SGD(model.parameters(), lr=lr, momentum=0.9,
                                    weight_decay=0.0005)
        criterion = nn.CrossEntropyLoss()

        # reset scales to +-1 keeping (1-flipperc) of the signs, zero the
        # biases (lines 227-287)
        conv_weights_to_reset, total = [], 0
        for fidx in plkeys:
            blk = _ref_block(model, fidx)
            w = blk.bn.weight
            conv_weights_to_reset.append(w)
            total += w.size(0)
            blk.bn.bias.data.zero_()
        idxs = torch.randperm(total)[: int(total * flipperc)]
        for w in conv_weights_to_reset:
            size = w.size(0)
            widxs = idxs[(idxs - size) < 0]
            newsign = w.data.sign()
            newsign[widxs] *= -1
            w.data.copy_(newsign)
            idxs = idxs[(idxs - size) >= 0] - size

        device = torch.device("cpu")
        res = None
        for _ in range(epochs):
            train(model, optimizer, criterion, trainloader, device)
            res = test(model, criterion, valloader, device)
        return {"final_acc": 100 * res["acc"]}
    finally:
        sys.path.remove(REFERENCE)


def torch_attack3(sd, data, epochs, lr=0.01, flipperc=0.0, seed=0,
                  batch_size=64, arch="alexnet"):
    """The reference's ambiguity attack on a state dict
    (passport_attack_3.py:176-330 construction, replicated; its
    train_maximize/test loops imported)."""
    import numpy as np
    import torch
    import torch.nn as nn

    _stub_torchvision_full()
    sys.path.insert(0, REFERENCE)
    try:
        from models.layers.passportconv2d import PassportBlock
        from models.layers.passportconv2d_private import (
            PassportPrivateBlock,
        )
        from passport_attack_3 import test, train_maximize

        torch.manual_seed(seed)
        np.random.seed(seed)
        trainloader, valloader = _torch_loaders(data, batch_size)

        model = _ref_passport_model(arch)
        model.load_state_dict(sd)
        for param in model.parameters():
            param.requires_grad_(False)

        # fake passports = originals + N(0, .001), made trainable
        # (passport_attack_3.py:220-243)
        passblocks, origpassport, fakepassport = [], [], []
        for m in model.modules():
            if isinstance(m, (PassportBlock, PassportPrivateBlock)):
                passblocks.append(m)
                keyname, skeyname = "key_private", "skey_private"
                key = m.__getattr__(keyname).data.clone()
                skey = m.__getattr__(skeyname).data.clone()
                origpassport += [key, skey]
                m.__delattr__(keyname)
                m.__delattr__(skeyname)
                m.register_parameter(keyname, nn.Parameter(
                    key.clone() + torch.randn(*key.size()) * 0.001))
                m.register_parameter(skeyname, nn.Parameter(
                    skey.clone() + torch.randn(*skey.size()) * 0.001))
                fakepassport += [m.__getattr__(keyname),
                                 m.__getattr__(skeyname)]

        if flipperc:
            for m in passblocks:
                oldb = m.sign_loss_private.b
                newb = oldb.clone()
                npidx = np.arange(len(oldb))
                randomidx = np.random.choice(
                    npidx, int(oldb.view(-1).size(0) * flipperc),
                    replace=False)
                newb[randomidx] = oldb[randomidx] * -1
                m.sign_loss_private.set_b(newb)

        optimizer = torch.optim.SGD(fakepassport, lr=lr, momentum=0.9,
                                    weight_decay=0.0005)
        criterion = nn.CrossEntropyLoss()
        device = torch.device("cpu")
        res = None
        for _ in range(epochs):
            train_maximize(origpassport, fakepassport, model, optimizer,
                           criterion, trainloader, device, 2)
            res = test(model, criterion, valloader, device, 2)
        return {"final_acc": 100 * res["acc"],
                "final_signacc": 100 * res["signacc"]}
    finally:
        sys.path.remove(REFERENCE)


# -------------------------------------------------------------- jax attacks


def jax_attack2(model, state, data, epochs, lr=0.01, flipperc=0.0, seed=0,
                batch_size=64, arch="alexnet"):
    from deepipr_tpu.attacks import plkey_to_module_path, reverse_attack

    xtr, ytr, xte, yte = data
    train_b = _batches(xtr, ytr, batch_size)
    valid_b = _batches(xte, yte, batch_size)
    _, normal = _jax_models(arch)
    plpaths = [plkey_to_module_path(k) for k in plkeys_for(arch)]
    hist = reverse_attack(model, state, normal, train_b, valid_b,
                          (1, 32, 32, 3), True, plpaths,
                          flipperc=flipperc, epochs=epochs, lr=lr, seed=seed)
    return {"final_acc": hist[-1]["valid_acc"]}


def jax_attack3(model, state, data, epochs, lr=0.01, flipperc=0.0, seed=0,
                batch_size=64, arch="alexnet"):
    from deepipr_tpu.attacks import ambiguity_attack
    from deepipr_tpu.train.steps import make_eval_step, run_eval

    xtr, ytr, xte, yte = data
    train_b = _batches(xtr, ytr, batch_size)
    valid_b = _batches(xte, yte, batch_size)

    # private-branch eval under the FAKE passports (passport_attack_3.py
    # CLI eval_fn); ambiguity_attack itself records only train metrics
    eval_step = make_eval_step(model, ind=1)

    def eval_fn(fake_pp):
        st = state.replace(passport=fake_pp)
        return {f"valid_{k}": v
                for k, v in run_eval(eval_step, st, valid_b).items()}

    _, hist = ambiguity_attack(model, state, train_b, valid_b,
                               epochs=epochs, private=True,
                               flipperc=flipperc, lr=lr, seed=seed,
                               eval_fn=eval_fn)
    last = hist[-1]
    return {"final_acc": last["valid_acc"],
            "final_signacc": 100 * last.get("train_signacc", float("nan"))}


# --------------------------------------------------------------------- main


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="alexnet",
                    choices=["alexnet", "resnet18"])
    ap.add_argument("--train-epochs", type=int, default=10)
    ap.add_argument("--attack-epochs", type=int, default=15)
    ap.add_argument("--num-train", type=int, default=1024)
    ap.add_argument("--num-test", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--flipperc", type=float, nargs="+", default=[0.0],
                    help="flip percentages to sweep (attacking.sh sweeps "
                         "0.0/0.1/0.5 for attack 3)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="docs/demo")
    args = ap.parse_args()

    import jax.numpy as jnp

    from deepipr_tpu.interop.torch_export import export_torch_state_dict
    from deepipr_tpu.interop.torch_import import import_torch_checkpoint
    from deepipr_tpu.train import TrainState, sgd_optimizer

    arch = args.arch
    data = make_shared_data(args.num_train, args.num_test, args.seed)

    t0 = time.time()
    print(f"== training both stacks on shared data ({arch}) ==", flush=True)
    tres = run_torch(data, args.train_epochs, args.batch_size, 1, 5,
                     args.seed, arch=arch)
    jres = run_jax(data, args.train_epochs, args.batch_size, 1, 5, args.seed,
                   arch=arch)
    tmodel = tres.pop("_model")
    jmodel, jstate = jres.pop("_model"), jres.pop("_state")
    print(f"trained: torch priv {tres['valid_acc_private']:.1f}% / "
          f"jax priv {jres['valid_acc_private']:.1f}% "
          f"({time.time() - t0:.0f}s)", flush=True)

    # --- checkpoint conversion both ways
    sd_from_jax = export_torch_state_dict(jmodel, jstate.model_variables())
    jmodel_t, _ = _jax_models(arch)
    tmpl = jmodel_t.init(
        {"params": jax.random.key(0), "passport": jax.random.key(1)},
        jnp.zeros((2, 32, 32, 3)), train=True)
    v_from_torch = import_torch_checkpoint(tmodel.state_dict(), tmpl,
                                           strict=True)
    jstate_t = TrainState.create(v_from_torch, sgd_optimizer(0.01))

    cells = {}
    ae, sd_own = args.attack_epochs, tmodel.state_dict()
    for fp in args.flipperc:
        # every cell gets the CLI's seed + batch size (the recipe JSON
        # records them, so the cells must actually be computed with them)
        kw = dict(flipperc=fp, seed=args.seed, batch_size=args.batch_size,
                  arch=arch)
        runs = [
            ("attack2/jax_ckpt/jax_attack",
             lambda: jax_attack2(jmodel, jstate, data, ae, **kw)),
            ("attack2/jax_ckpt/torch_attack",
             lambda: torch_attack2(sd_from_jax, data, ae, **kw)),
            ("attack2/torch_ckpt/jax_attack",
             lambda: jax_attack2(jmodel_t, jstate_t, data, ae, **kw)),
            ("attack2/torch_ckpt/torch_attack",
             lambda: torch_attack2(sd_own, data, ae, **kw)),
            ("attack3/jax_ckpt/jax_attack",
             lambda: jax_attack3(jmodel, jstate, data, ae, **kw)),
            ("attack3/jax_ckpt/torch_attack",
             lambda: torch_attack3(sd_from_jax, data, ae, **kw)),
            ("attack3/torch_ckpt/jax_attack",
             lambda: jax_attack3(jmodel_t, jstate_t, data, ae, **kw)),
            ("attack3/torch_ckpt/torch_attack",
             lambda: torch_attack3(sd_own, data, ae, **kw)),
        ]
        for name, fn in runs:
            name = f"{name}/fp{fp:g}"
            t0 = time.time()
            cells[name] = fn()
            cells[name]["seconds"] = round(time.time() - t0, 1)
            print(json.dumps({name: cells[name]}), flush=True)

    payload = {
        "cells": cells,
        "baseline": {"torch_valid_acc_private": tres["valid_acc_private"],
                     "jax_valid_acc_private": jres["valid_acc_private"]},
        "recipe": {"arch": arch, "scheme": 2,
                   "train_epochs": args.train_epochs,
                   "attack_epochs": args.attack_epochs,
                   "num_train": args.num_train, "num_test": args.num_test,
                   "flipperc": args.flipperc, "seed": args.seed,
                   "backend": "cpu (shared environment, both stacks)"},
    }
    os.makedirs(args.out, exist_ok=True)
    fname = ("cross_stack_attacks.json" if arch == "alexnet"
             else f"cross_stack_attacks_{arch}.json")
    with open(os.path.join(args.out, fname), "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", os.path.join(args.out, fname))


if __name__ == "__main__":
    main()
