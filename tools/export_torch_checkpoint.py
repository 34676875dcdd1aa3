#!/usr/bin/env python
"""Export a trained checkpoint as a reference-loadable PyTorch .pth.

The inverse of the import path: the produced state dict loads with
strict=True into the actual kamwoh/DeepIPR modules (AlexNetPassportPrivate,
ResNet18Private, ...), so ownership of a model trained in this framework can
be verified inside the reference's own PyTorch stack — their
TesterPrivate.test_signature, their attack scripts (reference
experiments/trainer_private.py:37-71).

Example:
    python tools/export_torch_checkpoint.py \\
        --ckpt logs/resnet_cifar10_v2/1/models/best.ckpt \\
        --arch resnet --num-classes 10 \\
        --passport-config passport_configs/resnet18_passport.json \\
        --out ours_for_reference.pth
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="full train-state checkpoint")
    p.add_argument("--out", required=True, help="output .pth path")
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
    p.add_argument("--imgcrop", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepipr_tpu.interop.torch_export import save_torch_checkpoint
    from deepipr_tpu.models.registry import build_model
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.utils.checkpoint import load_state
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
                        passport_kwargs=kwargs, private=private)
    shape = (1, args.imgcrop, args.imgcrop, 3)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    variables = model.init(rngs, jnp.zeros(shape, jnp.float32), train=True)
    state = load_state(args.ckpt, TrainState.create(variables, sgd_optimizer(0.0)),
                       restore_opt=False)

    save_torch_checkpoint(args.out, model, state.model_variables())
    import torch

    sd = torch.load(args.out)
    n = sum(t.numel() for t in sd.values())
    print(f"exported {args.arch} -> {args.out}: {len(sd)} tensors, "
          f"{n:,} elements, reference PyTorch state-dict layout")


if __name__ == "__main__":
    main()
