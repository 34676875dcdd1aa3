#!/usr/bin/env python
"""Sign-flipping attack (CLI mirroring the reference flip_attack.py):
materialize derived affines, flip p% of scale signs globally, report accuracy
and (passport-derived) signature detection."""


def main():
    from deepipr_tpu.attacks.cli_common import (
        attack_logdir,
        base_parser,
        load_attacked_model,
        make_loaders,
        make_wm_loader,
        write_history_csv,
    )

    p = base_parser("flipping attack: sig. detection & acc after sign flips")
    p.add_argument("--fidxs", default="",
                   help="comma-separated alexnet feature indices to flip "
                        "(default: all passport layers)")
    args = p.parse_args()

    from deepipr_tpu.attacks import flip_attack, plkey_to_module_path

    # V1 models need explicit affine params to hold the flipped values
    model, state, _, plkeys, private, size = load_attacked_model(
        args, learnable_affine=args.scheme == 1
    )
    _, valloader = make_loaders(args)

    plpaths = [plkey_to_module_path(k) for k in plkeys]
    flip_paths = None
    if args.fidxs:
        assert args.arch == "alexnet", "--fidxs only supported for alexnet"
        flip_paths = [f"features_{i}" for i in args.fidxs.split(",")]

    hist = flip_attack(
        model, state, valloader, (1, size, size, 3), private,
        plpaths=plpaths, seed=args.seed, flip_paths=flip_paths,
        wm_data=make_wm_loader(args, size),
    )
    for row in hist:
        print({k: round(v, 4) if isinstance(v, float) else v
               for k, v in row.items()})
    write_history_csv(
        hist, attack_logdir("flipping_attack", args.loadpath),
        f"{args.arch}-{args.scheme}-history-{args.dataset}-{args.tagnum}.csv",
    )


if __name__ == "__main__":
    main()
