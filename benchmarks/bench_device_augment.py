#!/usr/bin/env python
"""A/B: host augmentation (fused C++ + f32 transfer) vs on-device augmentation
(raw uint8 transfer + fused crop/flip/normalize inside the train step).

Measures end-to-end train-loop throughput (data pipeline + step) on the
flagship ResNet-18 V2 config, CIFAR shapes, bf16. Run on the real TPU.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(device_augment: bool, batch_size=256, n_images=16384, epochs=3):
    from deepipr_tpu.data.datasets import DataLoader
    from deepipr_tpu.data.device_augment import make_device_augment
    from deepipr_tpu.data.prefetch import prefetch
    from deepipr_tpu.models import ResNet18Private
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.train.steps import make_train_step
    from deepipr_tpu.utils.config import construct_passport_kwargs, load_passport_config

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (n_images, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, n_images).astype(np.int32)

    cfg = load_passport_config("passport_configs/resnet18_passport.json")
    kwargs, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = ResNet18Private(num_classes=10, passport_kwargs=kwargs,
                            dtype=jnp.bfloat16)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    variables = model.init(rngs, jnp.zeros((1, 32, 32, 3), jnp.float32), train=True)
    state = TrainState.create(variables, sgd_optimizer(0.01))

    aug = make_device_augment(pad=4, out_dtype=jnp.bfloat16) if device_augment else None
    step = make_train_step(model, private=True, device_augment=aug)
    loader = DataLoader(images, labels, batch_size, shuffle=True,
                        train_augment=not device_augment, drop_last=True,
                        raw=device_augment)

    # warmup epoch (compile + cache)
    for batch in prefetch(iter(loader), size=2):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    t0 = time.time()
    n = 0
    for _ in range(epochs):
        for batch in prefetch(iter(loader), size=2):
            state, metrics = step(state, batch)
            n += batch["label"].shape[0]
    float(metrics["loss"])
    dt = time.time() - t0
    return n / dt


def main():
    res = {}
    for mode in ("host", "device"):
        ips = run_mode(device_augment=(mode == "device"))
        res[mode] = round(ips, 1)
        print(f"{mode}-augment: {ips:,.0f} img/s", flush=True)
    res["speedup"] = round(res["device"] / res["host"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
