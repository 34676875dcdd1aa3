#!/usr/bin/env python
"""Attack 2 — reverse-engineer scale/bias (CLI mirroring the reference
passport_attack_2.py): build a normal model from the passport checkpoint,
flip a fraction of the materialized scale signs, retrain ONLY those affines."""


def main():
    from deepipr_tpu.attacks.cli_common import (
        attack_logdir,
        base_parser,
        load_attacked_model,
        make_loaders,
        make_wm_loader,
        nclass_for,
        write_history_csv,
    )

    p = base_parser("fake attack 2: reverse engineer passport scale & bias")
    p.add_argument("--rep", default=1, type=int)
    p.add_argument("--flipperc", default=0.0, type=float,
                   help="fraction of signature signs to flip (0..1)")
    p.add_argument("--epochs", type=int, default=None)
    args = p.parse_args()

    from deepipr_tpu.attacks import plkey_to_module_path, reverse_attack
    from deepipr_tpu.models.registry import build_model

    model, state, _, plkeys, private, size = load_attacked_model(args)
    trainloader, valloader = make_loaders(args)

    arch = "resnet" if args.arch == "resnet18" else args.arch
    # reference builds the attacker's model with bn (scheme 1) / gn (private)
    norm = "bn" if args.scheme == 1 else "gn"
    normal = build_model(arch, nclass_for(args.dataset), norm,
                         imagenet=args.dataset == "imagenet1000")

    epochs = args.epochs or (30 if args.dataset == "imagenet1000" else 100)
    plpaths = [plkey_to_module_path(k) for k in plkeys]
    hist = reverse_attack(
        model, state, normal, trainloader, valloader,
        (1, size, size, 3), private, plpaths,
        flipperc=args.flipperc, epochs=epochs, lr=args.lr, seed=args.seed,
        wm_data=make_wm_loader(args, size),
    )
    for row in hist[-3:]:
        print(row)
    write_history_csv(
        hist, attack_logdir("passport_attack_2", args.loadpath),
        # flipperc in the name so sweeps don't overwrite (the reference's
        # naming, passport_attack_2.py:343, collides across flipperc runs)
        f"{args.arch}-{args.scheme}-history-{args.dataset}-{args.tagnum}-"
        f"{args.flipperc}.csv",
    )


if __name__ == "__main__":
    main()
