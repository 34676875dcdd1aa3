#!/usr/bin/env python
"""Train a fleet of licensee models in one compiled step (train/ensemble.py).

Each member gets its own passports (distinct key-selection seed) and its own
signature (per-member ASCII string via --signatures, or the config/random
default), all advanced simultaneously by jit(vmap(train_step)). Per-member
checkpoints land in --out as standalone TrainStates loadable by every other
tool (eval, attacks, tools/export_torch_checkpoint.py).

Example:
    python tools/train_ensemble.py --arch alexnet --dataset synthetic \\
        --members 4 --signatures "Alice,Bob,Carol,Dave" --epochs 5 \\
        --passport-config passport_configs/alexnet_passport.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="alexnet", choices=["alexnet", "resnet"])
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "cifar10", "cifar100"])
    p.add_argument("--data-root", default="data")
    p.add_argument("--members", type=int, default=2)
    p.add_argument("--signatures",
                   help="comma-separated ASCII string per member")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--sign-loss", type=float, default=0.1)
    p.add_argument("--norm-type", default="bn")
    p.add_argument("--key-type", default="shuffle")
    p.add_argument("--passport-config", required=True)
    p.add_argument("--pretrained-path",
                   help="normal-model ckpt whose activations seed the passports")
    p.add_argument("--epoch-scan", action="store_true",
                   help="device-resident scanned epochs for the whole fleet: "
                        "one dispatch advances every member through an epoch")
    p.add_argument("--separate-stats", action="store_true",
                   help="per-branch BN stats: keeps the public branch healthy "
                        "when passports come from an untrained model (shared "
                        "stats diverge in that regime — docs/demo/README.md)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="logs/ensemble")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepipr_tpu.data.datasets import DataLoader, load_cifar, synthetic_dataset
    from deepipr_tpu.models.registry import build_model
    from deepipr_tpu.train.ensemble import (
        ensemble_size,
        init_ensemble,
        make_ensemble_signature_fn,
        make_ensemble_train_step,
        member_state,
        setup_ensemble_passports,
    )
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.train.steps import make_dual_eval_step, run_dual_eval
    from deepipr_tpu.utils.checkpoint import load_state, save_state
    from deepipr_tpu.utils.config import construct_passport_kwargs

    signatures = None
    if args.signatures:
        signatures = args.signatures.split(",")
        if len(signatures) != args.members:
            p.error(f"--signatures lists {len(signatures)} strings for "
                    f"{args.members} members")

    if args.dataset == "synthetic":
        xtr, ytr, xte, yte = synthetic_dataset(seed=args.seed)
        nclass = 10
    else:
        nclass = 10 if args.dataset == "cifar10" else 100
        xtr, ytr, xte, yte = load_cifar(args.data_root, args.dataset)
    train = DataLoader(xtr, ytr, args.batch_size, shuffle=True,
                       train_augment=True, drop_last=True, seed=args.seed)
    val = DataLoader(xte, yte, args.batch_size)
    if len(train) == 0:
        p.error(f"--batch-size {args.batch_size} exceeds the train set "
                f"({len(xtr)} images with drop_last)")

    cfg = json.load(open(args.passport_config))
    kw, _ = construct_passport_kwargs(cfg, args.norm_type, args.key_type,
                                      args.sign_loss)
    if args.separate_stats:
        from deepipr_tpu.utils.config import mark_separate_stats

        mark_separate_stats(kw)
    model = build_model(args.arch, nclass, args.norm_type,
                        passport_kwargs=kw, private=True)
    size = xtr.shape[1]

    ens = init_ensemble(model, sgd_optimizer(args.lr),
                        (2, size, size, 3), n=args.members,
                        seed=args.seed, signatures=signatures)

    # passports from a pretrained (or fresh) normal model's activations,
    # candidates drawn from the val set (reference classification.py:37-40)
    normal = build_model(args.arch, nclass, args.norm_type)
    nv = normal.init({"params": jax.random.key(args.seed + 1)},
                     jnp.zeros((2, size, size, 3)), train=True)
    if args.pretrained_path:
        tmpl = TrainState.create(nv, sgd_optimizer(0.0))
        nv = load_state(args.pretrained_path, tmpl,
                        restore_opt=False).model_variables()
    from deepipr_tpu.data.datasets import normalize
    from deepipr_tpu.train.keys import sample_candidates

    # two independent candidate draws for key/skey, like the runner
    # (train/experiment.py) and the reference's two get_key calls
    # (passport_generator.py:6-17)
    kx = normalize(sample_candidates(xte, 20, args.seed + 10))
    ky = normalize(sample_candidates(xte, 20, args.seed + 11))
    ens = setup_ensemble_passports(model, ens, normal, nv, kx, ky,
                                   seed=args.seed)

    sigfn = make_ensemble_signature_fn(model, (1, size, size, 3), private=True)
    eval_step = make_dual_eval_step(model)
    if args.epoch_scan:
        from deepipr_tpu.train.ensemble import make_ensemble_epoch_fn
        from deepipr_tpu.train.epoch import device_resident

        epoch_fn = make_ensemble_epoch_fn(
            model, True, args.batch_size, pad=int((4 / 32) * size))
        xs, ys = device_resident(xtr, ytr)
    else:
        step = make_ensemble_train_step(model, private=True)

    for epoch in range(1, args.epochs + 1):
        if args.epoch_scan:
            ens, last = epoch_fn(
                ens, xs, ys,
                jax.random.fold_in(jax.random.key(args.seed + 100), epoch))
        else:
            last = None
            for batch in train:
                ens, last = step(ens, {"image": jnp.asarray(batch["image"]),
                                       "label": jnp.asarray(batch["label"])})
        tr = {k: np.asarray(v) for k, v in last.items()}
        sig = sigfn(ens)
        sig_min = np.stack(list(sig.values())).min(axis=0)
        line = " ".join(
            f"m{i}[loss={tr['loss'][i]:.3f} sign={sig_min[i]:.3f}]"
            for i in range(ensemble_size(ens)))
        print(f"Epoch {epoch:3d} {line}")

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.members):
        st = member_state(ens, i)
        res = run_dual_eval(eval_step, st, val)
        path = os.path.join(args.out, f"member_{i}.ckpt")
        save_state(path, st)
        tag = f" sig='{signatures[i]}'" if signatures else ""
        print(f"member {i}:{tag} acc_public={res['acc_public']:.2f} "
              f"acc_private={res['acc_private']:.2f} -> {path}")


if __name__ == "__main__":
    main()
