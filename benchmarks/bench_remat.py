#!/usr/bin/env python
"""A/B: rematerialized vs stored-activation V2 train step.

Hypothesis: the split dual-forward step is HBM-bandwidth-bound (~94% of the
v5e roofline, docs/DESIGN.md §11) while the MXU runs at ~49% — so recomputing
forward activations in the backward pass (jax.checkpoint, nothing_saveable)
trades idle-FLOP headroom for reduced activation traffic.

Alternating same-session A/B (the relayed chip's run-to-run variance demands
interleaving), plus compiler cost analysis (FLOPs / bytes accessed) per
variant. Run on the real TPU: python benchmarks/bench_remat.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(remat, batch_size, imagenet=False):
    from deepipr_tpu.models import ResNet18Private
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.train.steps import make_train_step
    from deepipr_tpu.utils.config import construct_passport_kwargs, load_passport_config

    cfg = load_passport_config(
        os.path.join(os.path.dirname(__file__), "..",
                     "passport_configs/resnet18_passport.json"))
    kwargs, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = ResNet18Private(num_classes=10, passport_kwargs=kwargs,
                            imagenet=imagenet, dtype=jnp.bfloat16)
    size = 224 if imagenet else 32
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    x = jax.random.normal(jax.random.key(2), (batch_size, size, size, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(3), (batch_size,), 0, 10)
    variables = model.init(rngs, x, train=True)
    state = TrainState.create(variables, sgd_optimizer(0.01))
    step = make_train_step(model, private=True, remat=remat)
    return step, state, {"image": x, "label": y}


def cost(step, state, batch):
    compiled = jax.jit(
        step.__wrapped__ if hasattr(step, "__wrapped__") else step
    ).lower(state, batch).compile()
    c = compiled.cost_analysis()
    if isinstance(c, list):
        c = c[0]
    temp = None
    try:
        temp = compiled.memory_analysis().temp_size_in_bytes / 1e9
    except Exception:
        pass
    return c.get("flops", 0) / 1e12, c.get("bytes accessed", 0) / 1e9, temp


def time_one(step, state, batch, steps):
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # host sync (block_until_ready unreliable on relay)
    return (time.time() - t0) / steps, state


def main(batch_size=256, steps=20, rounds=3, imagenet=False):
    variants = {}
    for name in ("none", "full"):
        step, state, batch = build(name, batch_size, imagenet=imagenet)
        try:
            tf, gb, temp = cost(step, state, batch)
            print(f"remat={name}: {tf:.3f} TFLOP/step, {gb:.2f} GB accessed, "
                  f"temp alloc {temp:.2f} GB" if temp is not None else
                  f"remat={name}: {tf:.3f} TFLOP/step, {gb:.2f} GB accessed")
        except Exception as e:  # cost analysis is best-effort on some backends
            print(f"remat={name}: cost_analysis unavailable ({e})")
        # warmup/compile
        _, state = time_one(step, state, batch, 5)
        variants[name] = (step, state, batch, [])

    for r in range(rounds):  # alternating A/B
        for name, (step, state, batch, times) in variants.items():
            dt, state = time_one(step, state, batch, steps)
            variants[name] = (step, state, batch, times + [dt])

    shape = "imagenet-stem 224" if imagenet else "cifar 32"
    print(f"\n{shape}, batch={batch_size}, {steps} steps x {rounds} "
          "alternating rounds:")
    for name, (_, _, _, times) in variants.items():
        best = min(times)
        ips = batch_size / best
        print(f"  remat={name:5s}: best {best*1e3:7.2f} ms/step = "
              f"{ips:9.1f} img/s  (all: {[f'{t*1e3:.2f}' for t in times]})")


if __name__ == "__main__":
    # usage: bench_remat.py [batch_size] [--imagenet]
    argv = [a for a in sys.argv[1:] if a != "--imagenet"]
    main(batch_size=int(argv[0]) if argv else 256,
         imagenet="--imagenet" in sys.argv)
