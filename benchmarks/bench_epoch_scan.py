#!/usr/bin/env python
"""End-to-end A/B: per-step dispatch vs device-resident scanned epochs.

Three ways to run one training epoch over a CIFAR-sized in-memory dataset
(50k x 32x32x3), ResNet-18 V2 bf16 bs256:

  host-f32    per-step dispatch, host augments, ships f32 batches
  device-u8   per-step dispatch, ships raw uint8, augments on device
  epoch-scan  whole dataset resident in HBM, ONE dispatch per epoch
              (train/epoch.py) — no per-step H2D or dispatch at all

On the relay-attached dev chip the loop is transfer/dispatch-bound
(BASELINE.md), so this measures exactly that overhead. Alternating rounds
to beat the relay's run-to-run variance.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main(n=50_000, batch_size=256, rounds=2):
    from deepipr_tpu.data.datasets import DataLoader
    from deepipr_tpu.data.device_augment import make_device_augment
    from deepipr_tpu.data.prefetch import prefetch
    from deepipr_tpu.models import ResNet18Private
    from deepipr_tpu.train.epoch import device_resident, make_epoch_train_fn
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.train.steps import make_train_step
    from deepipr_tpu.utils.config import construct_passport_kwargs, load_passport_config

    cfg = load_passport_config(
        os.path.join(os.path.dirname(__file__), "..",
                     "passport_configs/resnet18_passport.json"))
    kwargs, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = ResNet18Private(num_classes=10, passport_kwargs=kwargs,
                            dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x_u8 = rng.integers(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    y = rng.integers(0, 10, n).astype(np.int32)
    steps = n // batch_size

    def fresh_state():
        rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
        v = model.init(rngs, jnp.zeros((2, 32, 32, 3)), train=True)
        return TrainState.create(v, sgd_optimizer(0.01))

    variants = {}

    # host-f32: host augment, f32 per-step shipping
    step_f32 = make_train_step(model, private=True)

    def run_host_f32(state):
        loader = DataLoader(x_u8, y, batch_size, shuffle=True,
                            train_augment=True, drop_last=True)
        for b in prefetch(iter(loader), size=2):
            state, m = step_f32(state, b)
        return state, m

    variants["host-f32  "] = (run_host_f32, fresh_state())

    # device-u8: raw uint8 per-step shipping, on-device augment
    aug = make_device_augment(4)
    step_u8 = make_train_step(model, private=True, device_augment=aug)

    def run_device_u8(state):
        loader = DataLoader(x_u8, y, batch_size, shuffle=True,
                            drop_last=True, raw=True)
        for b in prefetch(iter(loader), size=2):
            state, m = step_u8(state, b)
        return state, m

    variants["device-u8 "] = (run_device_u8, fresh_state())

    # epoch-scan: resident data, one dispatch per epoch
    epoch_fn = make_epoch_train_fn(model, True, batch_size, pad=4)
    xs, ys = device_resident(x_u8, y)
    ep = [0]

    def run_scan(state):
        ep[0] += 1
        return epoch_fn(state, xs, ys,
                        jax.random.fold_in(jax.random.key(7), ep[0]))

    variants["epoch-scan"] = (run_scan, fresh_state())

    # epoch-scan + Pallas fused gather/augment input stage
    epoch_fn_pal = make_epoch_train_fn(model, True, batch_size, pad=4,
                                       input_stage="pallas")
    ep_pal = [0]

    def run_scan_pal(state):
        ep_pal[0] += 1
        return epoch_fn_pal(state, xs, ys,
                            jax.random.fold_in(jax.random.key(7), ep_pal[0]))

    variants["scan-pallas"] = (run_scan_pal, fresh_state())

    # compile/warm each variant once
    for name, (run, state) in variants.items():
        state, m = run(state)
        float(m["loss"])
        variants[name] = (run, state, [])

    for _ in range(rounds):
        for name, (run, state, times) in variants.items():
            t0 = time.time()
            state, m = run(state)
            float(m["loss"])
            times.append(time.time() - t0)
            variants[name] = (run, state, times)

    print(f"{n} imgs/epoch, bs{batch_size} ({steps} steps), "
          f"{jax.devices()[0].device_kind}:")
    for name, (_, _, times) in variants.items():
        best = min(times)
        print(f"  {name}: best {best:6.2f} s/epoch = "
              f"{steps*batch_size/best:9.0f} img/s "
              f"(all: {[f'{t:.2f}' for t in times]})")


if __name__ == "__main__":
    # usage: bench_epoch_scan.py [n_images] [rounds]
    main(n=int(sys.argv[1]) if len(sys.argv) > 1 else 50_000,
         rounds=int(sys.argv[2]) if len(sys.argv) > 2 else 2)
