#!/usr/bin/env python
"""Pruning attack (CLI mirroring the reference pruning_attack.py): global
magnitude pruning at 0..100%, reporting signature detection + accuracy."""


def main():
    from deepipr_tpu.attacks.cli_common import (
        attack_logdir,
        base_parser,
        load_attacked_model,
        make_loaders,
        make_wm_loader,
        write_history_csv,
    )

    p = base_parser("pruning attack: signature detection & acc vs pruning")
    args = p.parse_args()

    from deepipr_tpu.attacks import pruning_attack

    model, state, _, _, private, size = load_attacked_model(args)
    _, valloader = make_loaders(args)

    hist = pruning_attack(model, state, valloader, (1, size, size, 3), private,
                          wm_data=make_wm_loader(args, size))
    for row in hist:
        print({k: round(v, 4) if isinstance(v, float) else v
               for k, v in row.items()})
    write_history_csv(
        hist, attack_logdir("pruning_attack", args.loadpath),
        f"{args.arch}-{args.scheme}-history-{args.dataset}-{args.tagnum}.csv",
    )


if __name__ == "__main__":
    main()
