#!/usr/bin/env python
"""Attack 1 — random fake passports (CLI mirroring the reference
passport_attack_1.py): replace the passports with ones derived from random
validation images and watch accuracy collapse. All reps are evaluated in one
vmapped TPU sweep."""

import numpy as np


def main():
    from deepipr_tpu.attacks.cli_common import (
        attack_logdir,
        base_parser,
        load_attacked_model,
        make_loaders,
        nclass_for,
        write_history_csv,
    )

    p = base_parser("fake attack 1: random passport")
    p.add_argument("--attack-rep", default=1, type=int)
    p.add_argument("--pretrained-path",
                   help="normal-model ckpt used to derive fake passports")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepipr_tpu.attacks import random_passport_attack
    from deepipr_tpu.models.registry import build_model
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.utils.checkpoint import load_state

    model, state, _, _, private, size = load_attacked_model(args)
    _, valloader = make_loaders(args)

    arch = "resnet" if args.arch == "resnet18" else args.arch
    pretrained = build_model(arch, nclass_for(args.dataset), args.norm_type,
                             imagenet=args.dataset == "imagenet1000")
    pv = pretrained.init({"params": jax.random.key(2)},
                         jnp.zeros((1, size, size, 3)), train=True)
    if args.pretrained_path:
        tmpl = TrainState.create(pv, sgd_optimizer(0.0))
        pv = load_state(args.pretrained_path, tmpl).model_variables()

    cands = np.concatenate([b["image"] for b in valloader][:4])
    hist = random_passport_attack(
        model, state, pretrained, pv, cands, valloader,
        reps=args.attack_rep, private=private, seed=args.seed,
    )
    for row in hist:
        print(row)
    write_history_csv(
        hist, attack_logdir("passport_attack_1", args.loadpath),
        f"{args.arch}-{args.scheme}-history-{args.dataset}-"
        f"{args.attack_rep}-{args.tagnum}.csv",
    )


if __name__ == "__main__":
    main()
