#!/usr/bin/env python
"""Serving-path benchmark: public-branch inference throughput (ResNet-18 V2).

Prints one JSON line per batch size. Run on the default (TPU) platform.
"""

import json
import time

import jax
import jax.numpy as jnp

from deepipr_tpu.models import ResNet18Private
from deepipr_tpu.serve import Predictor
from deepipr_tpu.train.schedule import sgd_optimizer
from deepipr_tpu.train.state import TrainState
from deepipr_tpu.utils.config import construct_passport_kwargs, load_passport_config


def main():
    cfg = load_passport_config("passport_configs/resnet18_passport.json")
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = ResNet18Private(num_classes=10, passport_kwargs=kw,
                            dtype=jnp.bfloat16)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    x0 = jnp.zeros((8, 32, 32, 3))
    state = TrainState.create(model.init(rngs, x0, train=True),
                              sgd_optimizer(0.0))
    pred = Predictor(model, state, ind=0)

    for bs in (256, 1024, 4096):
        x = jax.random.normal(jax.random.key(1), (bs, 32, 32, 3))
        y = pred.predict(x)
        float(y[0])  # hard sync
        t0 = time.time()
        steps = 30
        for _ in range(steps):
            y = pred.predict(x)
        float(y[0])
        dt = time.time() - t0
        print(json.dumps({
            "metric": "inference images/sec/chip (ResNet-18 public branch)",
            "batch_size": bs,
            "value": round(bs * steps / dt, 1),
        }))

    # Folded deployment model (interop/fold.py): conv+bias only.
    for ind in (0, 1):
        pf = Predictor(model, state, ind=ind, folded=True,
                       input_shape=(1, 32, 32, 3))
        for bs in (1024,):
            x = jax.random.normal(jax.random.key(1), (bs, 32, 32, 3))
            y = pf.predict(x)
            float(y[0])
            t0 = time.time()
            steps = 30
            for _ in range(steps):
                y = pf.predict(x)
            float(y[0])
            dt = time.time() - t0
            print(json.dumps({
                "metric": "inference images/sec/chip (ResNet-18, folded)",
                "ind": ind,
                "batch_size": bs,
                "value": round(bs * steps / dt, 1),
            }))

    # Private (verification) branch: A/B the fused Pallas epilogue dispatch.
    # The epilogue is f32-only (bf16 activations bypass it), so this A/B runs
    # the f32 model.
    from deepipr_tpu.ops.pallas_fused import set_epilogue_mode
    model32 = ResNet18Private(num_classes=10, passport_kwargs=kw)
    state32 = TrainState.create(model32.init(rngs, x0, train=True),
                                sgd_optimizer(0.0))
    for mode in ("off", "auto"):
        set_epilogue_mode(mode)
        pred_priv = Predictor(model32, state32, ind=1)
        for bs in (256, 1024):
            x = jax.random.normal(jax.random.key(1), (bs, 32, 32, 3))
            y = pred_priv.predict(x)
            float(y[0])
            t0 = time.time()
            steps = 30
            for _ in range(steps):
                y = pred_priv.predict(x)
            float(y[0])
            dt = time.time() - t0
            print(json.dumps({
                "metric": "inference images/sec/chip (ResNet-18 private branch)",
                "epilogue": mode,
                "batch_size": bs,
                "value": round(bs * steps / dt, 1),
            }))
    set_epilogue_mode("auto")


if __name__ == "__main__":
    main()
