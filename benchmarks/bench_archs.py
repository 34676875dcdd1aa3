#!/usr/bin/env python
"""V2 private-passport train-step throughput across the model zoo.

Same methodology as bench.py (data-resident batch, bf16, bs 256): isolates
the step itself from the host pipeline. Run on the real TPU.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARCHS = {
    "alexnet": "passport_configs/alexnet_passport.json",
    "resnet18": "passport_configs/resnet18_passport.json",
    "resnet50": "passport_configs/resnet50_passport.json",
}


def run(arch: str, config: str, batch_size=256, steps=30, warmup=5):
    from deepipr_tpu.models import build_model
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.train.steps import make_train_step
    from deepipr_tpu.utils.config import construct_passport_kwargs, load_passport_config

    kwargs, _ = construct_passport_kwargs(
        load_passport_config(config), "bn", "shuffle", 0.1)
    model = build_model(arch if arch != "resnet18" else "resnet", 10,
                        passport_kwargs=kwargs, private=True,
                        dtype=jnp.bfloat16)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    x = jax.random.normal(jax.random.key(2), (batch_size, 32, 32, 3), jnp.float32)
    y = jax.random.randint(jax.random.key(3), (batch_size,), 0, 10)
    state = TrainState.create(model.init(rngs, x, train=True), sgd_optimizer(0.01))
    step = make_train_step(model, private=True)
    batch = {"image": x, "label": y}

    for _ in range(warmup):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    return batch_size * steps / (time.time() - t0)


def main():
    out = {}
    for arch, config in ARCHS.items():
        ips = run(arch, config)
        out[arch] = round(ips, 1)
        print(f"{arch}: {ips:,.0f} img/s/chip", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
