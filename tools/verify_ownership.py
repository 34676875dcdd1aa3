#!/usr/bin/env python
"""White-box ownership verification from the command line.

Rebuilds the model from its passport config, loads the checkpoint, derives
the scales from the passports, and reports per-layer signature detection
rates (+ decoded ASCII with --num-chars) as one JSON object — the paper's
verification workflow (reference TesterPrivate.test_signature,
experiments/trainer_private.py:37-71) end to end.

A counterfeit claim is checked with --claimed-ckpt: the passports from that
checkpoint are substituted before deriving (random/optimized fakes land at
~50% detection and fail verification).

Example:
    python tools/verify_ownership.py \\
        --ckpt logs/resnet_cifar10_v2/1/models/best.ckpt --arch resnet \\
        --passport-config passport_configs/resnet18_passport.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--arch", default="resnet",
                   choices=["alexnet", "resnet", "resnet9", "resnet50"])
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--norm-type", default="bn")
    p.add_argument("--key-type", default="shuffle")
    p.add_argument("--sign-loss", type=float, default=0.1)
    p.add_argument("--passport-config", required=True)
    p.add_argument("--private", action=argparse.BooleanOptionalAction,
                   default=True, help="V2/V3 model (--no-private for V1)")
    p.add_argument("--separate-stats", action="store_true")
    p.add_argument("--imgcrop", type=int, default=32)
    p.add_argument("--num-chars", type=int,
                   help="decode this many ASCII chars per layer")
    p.add_argument("--claimed-ckpt",
                   help="take the passports from this checkpoint instead "
                        "(verify an adversarial ownership claim)")
    p.add_argument("--commit",
                   help="write a passport pre-commitment record (SHA-256 of "
                        "passports+signatures+derived signs) to this path — "
                        "publish it to timestamp ownership before release "
                        "(passport/commitment.py)")
    p.add_argument("--check-commitment",
                   help="verify the checkpoint against a previously written "
                        "commitment record")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepipr_tpu.models.registry import build_model
    from deepipr_tpu.serve import verify_ownership
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.utils.checkpoint import load_state
    from deepipr_tpu.utils.config import construct_passport_kwargs

    cfg = json.load(open(args.passport_config))
    kw, _ = construct_passport_kwargs(cfg, args.norm_type, args.key_type,
                                      args.sign_loss)
    if args.separate_stats:
        from deepipr_tpu.utils.config import mark_separate_stats

        mark_separate_stats(kw)
    model = build_model(args.arch, args.num_classes, args.norm_type,
                        passport_kwargs=kw, private=args.private)
    shape = (1, args.imgcrop, args.imgcrop, 3)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    variables = model.init(rngs, jnp.zeros(shape, jnp.float32), train=True)
    tmpl = TrainState.create(variables, sgd_optimizer(0.0))
    # commit restored numpy leaves to device once (relay H2D is slow)
    state = jax.device_put(load_state(args.ckpt, tmpl, restore_opt=False))

    claimed = None
    if args.claimed_ckpt:
        claimed = load_state(args.claimed_ckpt, tmpl,
                             restore_opt=False).passport

    res = verify_ownership(model, state, shape, private=args.private,
                           claimed_passports=claimed,
                           num_chars=args.num_chars)

    if args.commit:
        from deepipr_tpu.passport.commitment import commit as make_commitment

        rec = make_commitment(state, model=model, input_shape=shape,
                              private=args.private)
        with open(args.commit, "w") as f:
            json.dump(rec, f, indent=2, sort_keys=True)
        res["commitment_written"] = args.commit
        res["commitment"] = rec["commitment"]
    if args.check_commitment:
        from deepipr_tpu.passport.commitment import verify_commitment

        rec = json.load(open(args.check_commitment))
        ok = verify_commitment(state, rec, model=model, input_shape=shape,
                               private=args.private)
        res["commitment_valid"] = ok
        res["verified"] = res["verified"] and ok

    print(json.dumps(res, indent=2, sort_keys=True))
    sys.exit(0 if res["verified"] else 1)


if __name__ == "__main__":
    main()
