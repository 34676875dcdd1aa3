"""Cross-stack training-dynamics parity: train the ACTUAL reference code
(PyTorch, /root/reference) and this framework on the IDENTICAL synthetic
dataset with the canonical recipe scaled down, and compare what matters:

  - final public/private task accuracy (within a few points),
  - sign accuracy -> 100% in both stacks,
  - the attack-1 accuracy collapse magnitude (random fake passports).

Forward/logit/signature parity is already proven bit-for-bit
(tests/test_reference_parity.py, tests/test_torch_export.py); this harness
closes the remaining gap — that both stacks' TRAINING DYNAMICS land in the
same place. Real CIFAR is blocked (zero-egress env, BASELINE.md), so the
shared testbed is the deterministic synthetic dataset both stacks can load.

Recipe (reference training.sh:3-16 / classification.py:47-57, scaled):
AlexNet V2 private, bs 64, SGD lr .01 momentum .9 wd 1e-4, sign-loss .1,
key-type shuffle, passports from 20 val images through a deterministic
randomly-initialized "pretrained" normal model (both stacks; the reference
would download a torchvision-pretrained one — zero egress). No train-time
augmentation on either side so both stacks consume byte-identical tensors.

Run: python tools/cross_stack_parity.py --epochs 30 --out docs/demo
(CPU; takes ~10 min. The slow-marked test runs a scaled-down version.)

Attack-1 parity (reference passport_attack_1.py:209-289): R reps of
replace-passports-with-random-val-images, measure private-branch accuracy
collapse in both stacks.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

ALEXNET_CFG = {"0": False, "2": False, "4": True, "5": True, "6": True}


def load_cfg(arch: str):
    if arch == "alexnet":
        return ALEXNET_CFG
    import json as _json

    with open(os.path.join(REPO,
                           "passport_configs/resnet18_passport.json")) as f:
        return _json.load(f)


def ref_passport_kwargs(arch: str, cfg, _ref_layer_kwargs):
    """Our config JSON -> the reference's per-layer kwargs dict (nested for
    resnet, flat for alexnet — reference amalgamate passport_kwargs shape)."""
    if arch == "alexnet":
        return {k: _ref_layer_kwargs(v) for k, v in cfg.items()}
    out = {}
    for lk, v in cfg.items():
        if isinstance(v, dict):
            out[lk] = {i: {m: _ref_layer_kwargs(flag)
                           for m, flag in mods.items()}
                       for i, mods in v.items()}
        else:
            out[lk] = _ref_layer_kwargs(v)
    return out


def make_shared_data(num_train: int, num_test: int, seed: int = 0):
    """Identical f32 NCHW/NHWC tensors for both stacks: synthetic uint8 ->
    ImageNet-normalized, no augmentation."""
    import numpy as np

    from deepipr_tpu.data.datasets import normalize, synthetic_dataset

    xtr_u8, ytr, xte_u8, yte = synthetic_dataset(
        num_train=num_train, num_test=num_test, size=32, seed=seed)
    return (normalize(xtr_u8), ytr.astype(np.int64),
            normalize(xte_u8), yte.astype(np.int64))


# --------------------------------------------------------------------- torch


def run_torch(data, epochs: int, batch_size: int, attack_reps: int,
              eval_every: int, seed: int = 0, arch: str = "alexnet",
              key_override=None):
    """Train the reference's AlexNet/ResNet18 PassportPrivate with the
    reference's own TrainerPrivate hot loop (trainer_private.py:118-210)
    on CPU."""
    import numpy as np
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_reference_parity import _ref_layer_kwargs, _stub_torchvision

    _stub_torchvision()
    sys.path.insert(0, REFERENCE)
    try:
        import passport_generator
        from experiments.trainer_private import TrainerPrivate
        from models.alexnet_normal import AlexNetNormal
        from models.alexnet_passport_private import AlexNetPassportPrivate
        from models.resnet_normal import ResNet18 as RefResNet18
        from models.resnet_passport_private import (
            ResNet18Private as RefResNet18Private,
        )

        torch.manual_seed(seed)
        np.random.seed(seed)

        xtr, ytr, xte, yte = data
        to_t = lambda x: torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        train_ds = TensorDataset(to_t(xtr), torch.from_numpy(ytr))
        test_ds = TensorDataset(to_t(xte), torch.from_numpy(yte))
        g = torch.Generator().manual_seed(seed)
        train_loader = DataLoader(train_ds, batch_size=batch_size,
                                  shuffle=True, drop_last=True, generator=g)
        test_loader = DataLoader(test_ds, batch_size=batch_size)

        kwargs = ref_passport_kwargs(arch, load_cfg(arch), _ref_layer_kwargs)
        if arch == "alexnet":
            model = AlexNetPassportPrivate(3, 10, kwargs)
            # reference alexnet key-setup path uses norm_type='none'
            # (classification_private.py:73) and leaves the module in train
            # mode
            pretrained = AlexNetNormal(3, 10, "none")
        else:
            model = RefResNet18Private(num_classes=10, passport_kwargs=kwargs)
            # reference resnet key-setup path uses norm_type='bn'
            # (classification_private.py:79-82); random init stands in for
            # the torchvision-pretrained weights (zero egress) in both stacks
            pretrained = RefResNet18(num_classes=10, norm_type="bn")

        def set_keys_from(src_images):
            # reference setup_keys samples key_x and key_y independently
            # (classification_private.py:108-118)
            idx_x = np.random.choice(len(src_images), 20, replace=False)
            idx_y = np.random.choice(len(src_images), 20, replace=False)
            passport_generator.set_key(pretrained, model,
                                       to_t(src_images[idx_x]),
                                       to_t(src_images[idx_y]))

        set_keys_from(xte)
        if key_override is not None:
            # passport-transplant hook (tools/diagnose_attack3.py): replace
            # the freshly selected keys in place, AFTER set_key registered
            # the buffers, so training proceeds with the caller's passports
            key_override(model)

        optimizer = torch.optim.SGD(model.parameters(), lr=0.01,
                                    momentum=0.9, weight_decay=1e-4)
        trainer = TrainerPrivate(model, optimizer, None, torch.device("cpu"))

        history = []
        for ep in range(1, epochs + 1):
            t0 = time.time()
            m = trainer.train(ep, train_loader)
            row = {"stack": "torch", "epoch": ep,
                   "train_acc_public": m["acc_public"],
                   "train_acc_private": m["acc_private"],
                   "sign_acc": m["sign_acc"],
                   "time": time.time() - t0}
            if ep % eval_every == 0 or ep == epochs:
                v = trainer.test(test_loader)
                row.update({"valid_acc_public": v["acc_public"],
                            "valid_acc_private": v["acc_private"]})
            history.append(row)

        final = trainer.test(test_loader)
        sig = trainer.tester.test_signature()
        genuine_acc = final["acc_private"]

        # attack 1: reference reset_passport (passport_attack_1.py:258-261)
        attack_accs = []
        for _ in range(attack_reps):
            set_keys_from(xte)
            a = trainer.test(test_loader)
            attack_accs.append(a["acc_private"])

        return {
            "stack": "torch",
            "history": history,
            "valid_acc_public": final["acc_public"],
            "valid_acc_private": genuine_acc,
            "sign_acc_min": min(sig.values()),
            "attack1_acc_mean": float(np.mean(attack_accs)),
            "attack1_acc_max": float(np.max(attack_accs)),
            "attack1_collapse": genuine_acc - float(np.mean(attack_accs)),
            # trained module for per-checkpoint cross-validation
            # (tools/cross_stack_attacks.py); not JSON-serialized
            "_model": model,
        }
    finally:
        sys.path.remove(REFERENCE)


# ----------------------------------------------------------------------- jax


def run_jax(data, epochs: int, batch_size: int, attack_reps: int,
            eval_every: int, seed: int = 0, arch: str = "alexnet",
            passports=None):
    """Train our AlexNet/ResNet18 V2 with the canonical step on the same
    tensors."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from deepipr_tpu.attacks.fake_passport import random_passport_attack
    from deepipr_tpu.models import AlexNet
    from deepipr_tpu.train import (
        TrainState,
        make_train_step,
        sample_candidates,
        setup_passports,
        sgd_optimizer,
    )
    from deepipr_tpu.train.steps import (
        make_dual_eval_step,
        run_dual_eval,
        test_signature,
    )
    from deepipr_tpu.utils.config import construct_passport_kwargs

    xtr, ytr, xte, yte = data
    ytr32, yte32 = ytr.astype(np.int32), yte.astype(np.int32)

    kw, _ = construct_passport_kwargs(load_cfg(arch), "bn", "shuffle", 0.1)
    if arch == "alexnet":
        model = AlexNet(num_classes=10, passport_kwargs=kw, private=True)
    else:
        from deepipr_tpu.models import ResNet18

        model = ResNet18(num_classes=10, passport_kwargs=kw, private=True)
    rngs = {"params": jax.random.key(seed),
            "passport": jax.random.key(seed + 1)}
    variables = dict(model.init(rngs, jnp.zeros((2, 32, 32, 3)), train=True))

    # passports: 20 val images through a random-init normal model (the same
    # deterministic stand-in for torchvision-pretrained both stacks use);
    # norm 'none' mirrors the reference's alexnet key-setup path
    # (classification_private.py:73) — and matters: with BN in the tap path
    # the taps are batch-normalized and passports from a homogeneous
    # candidate pool CONCENTRATE, blunting the fake-passport attack.
    # resnet key setup keeps 'bn' (classification_private.py:79-82).
    if arch == "alexnet":
        normal = AlexNet(num_classes=10, norm_type="none")
    else:
        from deepipr_tpu.models import ResNet18 as _RN

        normal = _RN(num_classes=10, norm_type="bn")
    nv = normal.init({"params": jax.random.key(seed + 2)},
                     jnp.zeros((2, 32, 32, 3)), train=True)

    def fresh_passports(pp, select_seed):
        kx = sample_candidates(xte, 20, seed=select_seed)
        ky = sample_candidates(xte, 20, seed=select_seed + 1)
        return setup_passports(normal, nv, pp, kx, ky, seed=select_seed + 2)

    variables["passport"] = (passports if passports is not None
                             else fresh_passports(
                                 jax.device_get(variables["passport"]),
                                 seed + 10))
    state = TrainState.create(variables, sgd_optimizer(0.01))

    step = make_train_step(model, private=True)
    dual_eval = make_dual_eval_step(model)

    def eval_batches():
        for i in range(0, len(xte) - batch_size + 1, batch_size):
            yield {"image": jnp.asarray(xte[i:i + batch_size]),
                   "label": jnp.asarray(yte32[i:i + batch_size])}

    steps_per_epoch = len(xtr) // batch_size
    rng = np.random.default_rng(seed)
    history = []
    for ep in range(1, epochs + 1):
        t0 = time.time()
        perm = rng.permutation(len(xtr))
        sums = None
        for t in range(steps_per_epoch):
            idx = perm[t * batch_size:(t + 1) * batch_size]
            state, m = step(state, {"image": jnp.asarray(xtr[idx]),
                                    "label": jnp.asarray(ytr32[idx])})
            sums = m if sums is None else jax.tree.map(
                lambda a, b: a + b, sums, m)
        row = {"stack": "jax", "epoch": ep,
               "train_acc_public": float(sums["acc_public"]) / steps_per_epoch,
               "train_acc_private": float(sums["acc_private"]) / steps_per_epoch,
               "sign_acc": float(sums["sign_acc"]) / steps_per_epoch,
               "time": time.time() - t0}
        if ep % eval_every == 0 or ep == epochs:
            v = run_dual_eval(dual_eval, state, eval_batches())
            row.update({"valid_acc_public": v["acc_public"],
                        "valid_acc_private": v["acc_private"]})
        history.append(row)

    final = run_dual_eval(dual_eval, state, eval_batches())
    sig = test_signature(model, state, (1, 32, 32, 3), private=True)
    genuine_acc = final["acc_private"]

    # attack 1: R candidate fake passports in one vmapped sweep
    res = random_passport_attack(
        model, state, normal, nv, candidates=xte,
        data=list(eval_batches()), reps=attack_reps, private=True,
        seed=seed + 100)
    attack_accs = [row["valid_acc"] for row in res if row["attack_rep"] >= 0]

    return {
        "stack": "jax",
        "history": history,
        "valid_acc_public": final["acc_public"],
        "valid_acc_private": genuine_acc,
        "sign_acc_min": min(sig.values()),
        "attack1_acc_mean": float(np.mean(attack_accs)),
        "attack1_acc_max": float(np.max(attack_accs)),
        "attack1_collapse": genuine_acc - float(np.mean(attack_accs)),
        # trained model/state for per-checkpoint cross-validation
        # (tools/cross_stack_attacks.py); not JSON-serialized
        "_model": model,
        "_state": state,
    }


# ---------------------------------------------------------------------- main


def run_both(epochs=30, batch_size=64, num_train=2048, num_test=512,
             attack_reps=8, eval_every=5, seed=0, out=None, arch="alexnet"):
    data = make_shared_data(num_train, num_test, seed)
    torch_res = run_torch(data, epochs, batch_size, attack_reps, eval_every,
                          seed, arch=arch)
    jax_res = run_jax(data, epochs, batch_size, attack_reps, eval_every,
                      seed, arch=arch)

    if out:
        os.makedirs(out, exist_ok=True)
        rows = torch_res["history"] + jax_res["history"]
        cols = ["stack", "epoch", "train_acc_public", "train_acc_private",
                "sign_acc", "valid_acc_public", "valid_acc_private", "time"]
        with open(os.path.join(out, "cross_stack_parity.csv"), "w",
                  newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols, extrasaction="ignore")
            w.writeheader()
            w.writerows(rows)
        summary = {k: {kk: vv for kk, vv in v.items()
                       if kk != "history" and not kk.startswith("_")}
                   for k, v in (("torch", torch_res), ("jax", jax_res))}
        summary["recipe"] = {
            "epochs": epochs, "batch_size": batch_size,
            "num_train": num_train, "num_test": num_test,
            "attack_reps": attack_reps, "seed": seed,
            "optimizer": "SGD lr .01 momentum .9 wd 1e-4, sign-loss .1",
        }
        with open(os.path.join(out, "cross_stack_parity.json"), "w") as f:
            json.dump(summary, f, indent=1)
    return torch_res, jax_res


def main():
    # this is a CPU harness (the torch side is CPU-only and the jax side
    # must match it bit-for-bit in environment); never grab the TPU relay
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--num-train", type=int, default=2048)
    ap.add_argument("--num-test", type=int, default=512)
    ap.add_argument("--attack-reps", type=int, default=8)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--seeds", default="0",
                    help="comma-separated seeds; the attack-1 collapse is "
                         "seed-dominated at small scale, so report several")
    ap.add_argument("--arch", default="alexnet",
                    choices=["alexnet", "resnet18"],
                    help="resnet18 = the flagship V2 arch (VERDICT r3 "
                         "item 7); artifacts gain an _resnet18 suffix")
    ap.add_argument("--out", default="docs/demo")
    args = ap.parse_args()

    seeds = [int(s) for s in args.seeds.split(",")]
    all_rows, summaries = [], []
    for seed in seeds:
        torch_res, jax_res = run_both(
            args.epochs, args.batch_size, args.num_train, args.num_test,
            args.attack_reps, args.eval_every, seed, out=None,
            arch=args.arch)
        for res in (torch_res, jax_res):
            for row in res["history"]:
                all_rows.append({**row, "seed": seed})
            s = {k: v for k, v in res.items()
                 if k != "history" and not k.startswith("_")}
            s["seed"] = seed
            summaries.append(s)
            print(json.dumps(s), flush=True)

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        suffix = "" if args.arch == "alexnet" else f"_{args.arch}"
        cols = ["stack", "seed", "epoch", "train_acc_public",
                "train_acc_private", "sign_acc", "valid_acc_public",
                "valid_acc_private", "time"]
        with open(os.path.join(args.out, f"cross_stack_parity{suffix}.csv"),
                  "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols, extrasaction="ignore")
            w.writeheader()
            w.writerows(all_rows)
        payload = {
            "runs": summaries,
            "recipe": {
                "arch": args.arch,
                "epochs": args.epochs, "batch_size": args.batch_size,
                "num_train": args.num_train, "num_test": args.num_test,
                "attack_reps": args.attack_reps, "seeds": seeds,
                "optimizer": "SGD lr .01 momentum .9 wd 1e-4, sign-loss .1",
            },
        }
        with open(os.path.join(args.out, f"cross_stack_parity{suffix}.json"),
                  "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
