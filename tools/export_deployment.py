#!/usr/bin/env python
"""Export a trained passport checkpoint as a folded deployment model.

The deployment artifact is the plain conv+bias architecture with BN and all
affines folded into the kernels (interop/fold.py): it contains NO passports,
signatures, or BN statistics — the model the paper's workflow ships to users
while the owner keeps the passport checkpoint for verification
(reference README.md:40-61).

Example:
    python tools/export_deployment.py \\
        --ckpt logs/resnet_cifar10_v2/1/models/best.ckpt \\
        --arch resnet --num-classes 10 \\
        --passport-config passport_configs/resnet18_passport.json \\
        --out deploy.ckpt
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="full train-state checkpoint")
    p.add_argument("--out", required=True, help="output path for the folded model")
    p.add_argument("--arch", default="resnet", choices=["alexnet", "resnet", "resnet9"])
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--norm-type", default="bn")
    p.add_argument("--key-type", default="shuffle")
    p.add_argument("--sign-loss", type=float, default=0.1)
    p.add_argument("--passport-config",
                   help="passport config JSON; omit for a normal model")
    p.add_argument("--private", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="V2/V3 model; --no-private for a V1 passport "
                        "checkpoint (default: private iff --passport-config "
                        "is given)")
    p.add_argument("--ind", type=int, default=0, choices=[0, 1],
                   help="branch to fold: 0 public/deployment, 1 private")
    p.add_argument("--imgcrop", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepipr_tpu.interop.fold import fold_for_inference
    from deepipr_tpu.models.registry import build_model
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.utils.checkpoint import load_state, save_state
    from deepipr_tpu.utils.config import construct_passport_kwargs

    kwargs = None
    if args.passport_config:
        cfg = json.load(open(args.passport_config))
        kwargs, _ = construct_passport_kwargs(
            cfg, args.norm_type, args.key_type, args.sign_loss)
    private = args.private
    if private is None:
        private = kwargs is not None

    model = build_model(args.arch, args.num_classes, args.norm_type,
                        passport_kwargs=kwargs, private=private,
                        imagenet=args.num_classes == 1000)
    shape = (1, args.imgcrop, args.imgcrop, 3)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    variables = model.init(rngs, jnp.zeros(shape, jnp.float32), train=True)
    state = load_state(args.ckpt, TrainState.create(variables, sgd_optimizer(0.0)),
                       restore_opt=False)

    fmodel, fvars = fold_for_inference(
        model, state.model_variables(), shape, ind=args.ind)
    save_state(args.out, fvars)
    n = sum(x.size for x in jax.tree.leaves(fvars))
    print(f"folded {args.arch} (ind={args.ind}) -> {args.out}: "
          f"{n:,} params, collections={sorted(fvars)} "
          "(no passports/signatures/batch stats)")


if __name__ == "__main__":
    main()
