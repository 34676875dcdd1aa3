#!/usr/bin/env python
"""Throughput scaling of the vmapped ensemble step (train/ensemble.py).

How much does co-training N licensee models in one compiled step cost vs N
sequential runs? Reports per-member and aggregate img/s for N in 1,2,4,8.
Run on the real TPU: python benchmarks/bench_ensemble.py [alexnet|resnet]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(arch, n, batch_size):
    from deepipr_tpu.models import AlexNet, ResNet18
    from deepipr_tpu.train.ensemble import init_ensemble, make_ensemble_train_step
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.utils.config import construct_passport_kwargs, load_passport_config

    root = os.path.join(os.path.dirname(__file__), "..")
    if arch == "alexnet":
        cfg = load_passport_config(
            os.path.join(root, "passport_configs/alexnet_passport.json"))
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        model = AlexNet(num_classes=10, passport_kwargs=kw, private=True,
                        dtype=jnp.bfloat16)
    else:
        cfg = load_passport_config(
            os.path.join(root, "passport_configs/resnet18_passport.json"))
        kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        model = ResNet18(num_classes=10, passport_kwargs=kw, private=True,
                         dtype=jnp.bfloat16)

    ens = init_ensemble(model, sgd_optimizer(0.01), (2, 32, 32, 3), n=n, seed=0)
    x = jax.random.normal(jax.random.key(2), (batch_size, 32, 32, 3), jnp.float32)
    y = jax.random.randint(jax.random.key(3), (batch_size,), 0, 10)
    step = make_ensemble_train_step(model, private=True)
    return step, ens, {"image": x, "label": y}


def main(arch="resnet", batch_size=256, steps=20):
    print(f"arch={arch} bs={batch_size} ({jax.devices()[0].device_kind})")
    base = None
    for n in (1, 2, 4, 8):
        step, ens, batch = build(arch, n, batch_size)
        for _ in range(5):
            ens, m = step(ens, batch)
        float(m["loss"][0])
        t0 = time.time()
        for _ in range(steps):
            ens, m = step(ens, batch)
        float(m["loss"][0])
        dt = (time.time() - t0) / steps
        agg = n * batch_size / dt
        if base is None:
            base = agg
        print(f"  N={n}: {dt*1e3:7.2f} ms/step, aggregate {agg:9.0f} img/s "
              f"({agg/base:.2f}x of N=1), per-member {agg/n:9.0f} img/s")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "resnet")
