#!/usr/bin/env python
"""Forgery/ambiguity attack on the DEPLOYED model (beyond the reference
suite): forge passports from scratch against a stolen V2 checkpoint — no
original passports, no training data — and sweep the fraction of signature
bits the attacker flips to embed their own identity
(deepipr_tpu/attacks/forge.py).

Output CSV per flip fraction: forged-affine regression quality, the forged
signature's bit accuracy, and the private-branch validation accuracy under
the forged passports — the ambiguity tradeoff curve."""


def main():
    from deepipr_tpu.attacks.cli_common import (
        attack_logdir,
        base_parser,
        load_attacked_model,
        make_loaders,
        write_history_csv,
    )

    p = base_parser("forgery attack: forge passports for a stolen model")
    p.add_argument("--flippercs", default="0,0.05,0.1,0.25,0.5,1.0",
                   help="comma-separated signature flip fractions to sweep")
    p.add_argument("--steps", type=int, default=300,
                   help="forgery optimization steps per fraction")
    p.add_argument("--forge-lr", type=float, default=0.05)
    p.add_argument("--refine-epochs", type=int, default=0,
                   help="data-assisted escalation: fine-tune each forgery "
                        "with CE + sign loss for this many epochs over the "
                        "train loader")
    p.add_argument("--refine-data-frac", type=float, default=1.0,
                   help="fraction of the train set the attacker holds")
    args = p.parse_args()
    if args.scheme == 1:
        p.error("forge attack targets the deployed V2/V3 public affine; "
                "a V1 deployment ships its passports, so the equivalent "
                "threat is attack 3 (passport_attack_3.py)")

    from deepipr_tpu.attacks.forge import (
        forge_attack,
        forged_signature_accuracy,
        refine_with_data,
    )
    from deepipr_tpu.train.steps import make_eval_step, run_eval

    model, state, _, _, private, size = load_attacked_model(args)
    trainloader, valloader = make_loaders(args)
    if args.refine_data_frac < 1.0:
        from deepipr_tpu.data.datasets import DataLoader

        n = max(args.batch_size,
                int(len(trainloader.images) * args.refine_data_frac))
        trainloader = DataLoader(
            trainloader.images[:n], trainloader.labels[:n], args.batch_size,
            shuffle=True, train_augment=True, drop_last=True, seed=args.seed)
    shape = (1, size, size, 3)

    eval_step = make_eval_step(model, ind=1 if private else 0,
                               force_passport=not private)
    base = run_eval(eval_step, state, valloader)
    print(f"owner passports: private acc {base['acc']:.2f}")

    rows = []
    for perc in [float(x) for x in args.flippercs.split(",")]:
        forged_pp, attacker_b, hist = forge_attack(
            model, state, shape, flipperc=perc, steps=args.steps,
            lr=args.forge_lr, seed=args.seed, private=private,
        )
        forged_state = state.replace(passport=forged_pp)
        res = run_eval(eval_step, forged_state, valloader)
        sig = forged_signature_accuracy(
            model, state, forged_pp, attacker_b, shape, private)
        row = {
            "flipperc": perc,
            "forge_mse": hist[-1]["mse"],
            "forged_signacc_vs_attacker_b": round(sig, 4),
            "valid_acc_forged": res["acc"],
            "valid_acc_owner": base["acc"],
        }
        if args.refine_epochs:
            refined_pp, rhist = refine_with_data(
                model, state, forged_pp, attacker_b, trainloader,
                epochs=args.refine_epochs, private=private)
            rres = run_eval(
                eval_step, state.replace(passport=refined_pp), valloader)
            row["valid_acc_refined"] = rres["acc"]
            row["refined_signacc"] = round(rhist[-1]["sign_acc"], 4)
        rows.append(row)
        print(row)

    write_history_csv(
        rows, attack_logdir("passport_forge_attack", args.loadpath),
        f"{args.arch}-{args.scheme}-forge-{args.dataset}-{args.tagnum}.csv",
    )


if __name__ == "__main__":
    main()
