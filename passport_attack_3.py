#!/usr/bin/env python
"""Attack 3 — ambiguity attack (CLI mirroring the reference
passport_attack_3.py): optimize fake passports with CE + sign loss +
maximize-distance; optionally flip signature bits first."""


def main():
    from deepipr_tpu.attacks.cli_common import (
        attack_logdir,
        base_parser,
        load_attacked_model,
        make_loaders,
        make_wm_loader,
        write_history_csv,
    )

    p = base_parser("fake attack 3: ambiguity / maximize attack")
    p.add_argument("--rep", default=1, type=int)
    p.add_argument("--flipperc", default=0.0, type=float,
                   help="fraction of signature bits to flip (0..1)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--epoch-scan", action="store_true",
                   help="run each attack epoch as one lax.scan dispatch over "
                        "resident data (in-memory datasets)")
    args = p.parse_args()

    import numpy as np

    from deepipr_tpu.attacks import ambiguity_attack
    from deepipr_tpu.train.steps import make_eval_step, run_eval

    model, state, _, _, private, size = load_attacked_model(args)
    trainloader, valloader = make_loaders(args)
    wm_data = make_wm_loader(args, size)

    eval_step = make_eval_step(model, ind=1 if private else 0,
                               force_passport=not private)
    wm_pub_step = make_eval_step(model, ind=0) if wm_data is not None else None

    def eval_fn(fake_pp):
        st = state.replace(passport=fake_pp)
        out = run_eval(eval_step, st, valloader)
        row = {f"valid_{k}": v for k, v in out.items()}
        if wm_data is not None:
            # black-box WM check of the model under the FAKE passports:
            # private (attacked) branch + deployed public branch
            row["wm_acc"] = run_eval(eval_step, st, wm_data)["acc"]
            row["wm_acc_public"] = run_eval(wm_pub_step, st, wm_data)["acc"]
        return row

    epochs = args.epochs or (30 if args.dataset == "imagenet1000" else 100)
    fake_pp, hist = ambiguity_attack(
        model, state, trainloader, valloader, epochs=epochs,
        private=private, flipperc=args.flipperc, lr=args.lr,
        seed=args.seed, eval_fn=eval_fn, scan_epochs=args.epoch_scan,
    )
    for row in hist[-3:]:
        print({k: v for k, v in row.items() if not isinstance(v, np.ndarray)})
    write_history_csv(
        hist, attack_logdir("passport_attack_3", args.loadpath),
        f"{args.arch}-{args.scheme}-history-{args.dataset}-{args.rep}-"
        f"{args.tagnum}-{args.flipperc}.csv",
    )


if __name__ == "__main__":
    main()
