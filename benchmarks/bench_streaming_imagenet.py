#!/usr/bin/env python
"""Exercise the streaming ImageNet path for real (VERDICT r2 item 3).

The reference ran actual ImageNet through DataLoader workers
(reference dataset.py:196-243, lr_configs/imagenet.json); this environment is
zero-egress, so the stand-in is a synthetic 224px JPEG ImageFolder
(tools/make_imagefolder.py — same on-disk layout, real JPEG decode work).

Three measurements:

1. host decode rate, cold: StreamingImageFolder JPEG decode + RandomResizedCrop
   + flip + normalize, img/s sustained over an epoch;
2. host decode rate, warm: second epoch against the resized-uint8 .npy cache;
3. end-to-end train: ResNet18 V2 private, ImageNet stem, bs 64, streamed
   batches prefetched to the chip — img/s vs the data-resident step bound
   (bench_archs.py methodology run at 224px in-session for the roofline).

Run on the real TPU:  python benchmarks/bench_streaming_imagenet.py \
    --root /tmp/synth_imagenet [--cache /tmp/synth_imagenet_cache]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def decode_rate(root, batch_size, train, cache_dir, workers, epochs=1,
                max_batches=None):
    from deepipr_tpu.data.datasets import StreamingImageFolder

    loader = StreamingImageFolder(
        os.path.join(root, "train"), batch_size, train=train, shuffle=True,
        drop_last=True, seed=0, workers=workers, cache_dir=cache_dir,
    )
    n = 0
    t0 = time.time()
    for _ in range(epochs):
        for i, batch in enumerate(loader):
            n += batch["image"].shape[0]
            if max_batches and i + 1 >= max_batches:
                break
    return n / (time.time() - t0)


def train_rate(root, batch_size, cache_dir, workers, steps_cap=60,
               raw=False):
    """Streamed end-to-end training epoch on the chip.

    raw=True ships uint8 batches and normalizes on device (the production
    `--device-augment` wiring for imagenet1000) — 4x less H2D per batch."""
    from deepipr_tpu.data.datasets import StreamingImageFolder
    from deepipr_tpu.data.device_augment import normalize_device
    from deepipr_tpu.data.prefetch import prefetch
    from deepipr_tpu.models import build_model
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.train.steps import make_train_step
    from deepipr_tpu.utils.config import (
        construct_passport_kwargs,
        load_passport_config,
    )

    kwargs, _ = construct_passport_kwargs(
        load_passport_config("passport_configs/resnet18_passport.json"),
        "bn", "shuffle", 0.1)
    model = build_model("resnet", 10, passport_kwargs=kwargs, private=True,
                        imagenet=True, dtype=jnp.bfloat16)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    x = jnp.zeros((batch_size, 224, 224, 3), jnp.float32)
    state = TrainState.create(
        model.init(rngs, x, train=True), sgd_optimizer(0.01))
    step = make_train_step(
        model, private=True,
        device_augment=(lambda key, b: normalize_device(b)) if raw else None)

    # compile once with a zero batch so the timed loop is all steady-state
    y = jnp.zeros((batch_size,), jnp.int32)
    x0 = jnp.zeros((batch_size, 224, 224, 3), jnp.uint8) if raw else x
    state, metrics = step(state, {"image": x0, "label": y})
    float(metrics["loss"])

    loader = StreamingImageFolder(
        os.path.join(root, "train"), batch_size, train=True, shuffle=True,
        drop_last=True, seed=0, workers=workers, cache_dir=cache_dir,
        raw=raw,
    )
    n = 0
    t0 = time.time()
    for i, batch in enumerate(prefetch(iter(loader), size=3)):
        state, metrics = step(state, batch)
        n += batch["label"].shape[0]
        if i + 1 >= steps_cap:
            break
    float(metrics["loss"])  # relay: force materialization before timing ends
    dt = time.time() - t0
    return n / dt, float(metrics["loss"])


def resident_bound(batch_size, steps=20, warmup=3):
    """Data-resident 224px step rate: the ceiling the pipeline must feed."""
    from deepipr_tpu.models import build_model
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.train.steps import make_train_step
    from deepipr_tpu.utils.config import (
        construct_passport_kwargs,
        load_passport_config,
    )

    kwargs, _ = construct_passport_kwargs(
        load_passport_config("passport_configs/resnet18_passport.json"),
        "bn", "shuffle", 0.1)
    model = build_model("resnet", 10, passport_kwargs=kwargs, private=True,
                        imagenet=True, dtype=jnp.bfloat16)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    x = jax.random.normal(jax.random.key(2), (batch_size, 224, 224, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(3), (batch_size,), 0, 10)
    state = TrainState.create(
        model.init(rngs, x, train=True), sgd_optimizer(0.01))
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_imagenet")
    ap.add_argument("--cache", default="/tmp/synth_imagenet_cache")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--skip-tpu", action="store_true",
                    help="host decode rates only")
    args = ap.parse_args()

    out = {}
    out["decode_cold_img_s"] = round(decode_rate(
        args.root, args.batch_size, True, args.cache, args.workers), 1)
    print(json.dumps({"metric": "streaming decode cold (JPEG)",
                      "value": out["decode_cold_img_s"], "unit": "img/s"}),
          flush=True)
    out["decode_warm_img_s"] = round(decode_rate(
        args.root, args.batch_size, True, args.cache, args.workers), 1)
    print(json.dumps({"metric": "streaming decode warm (npy cache)",
                      "value": out["decode_warm_img_s"], "unit": "img/s"}),
          flush=True)

    if not args.skip_tpu:
        bound = resident_bound(args.batch_size)
        out["resident_bound_img_s"] = round(bound, 1)
        print(json.dumps({"metric": "data-resident 224px step bound",
                          "value": out["resident_bound_img_s"],
                          "unit": "img/s"}), flush=True)
        rate, loss = train_rate(args.root, args.batch_size, args.cache,
                                args.workers)
        out["streamed_train_img_s"] = round(rate, 1)
        out["fed_fraction"] = round(rate / bound, 3)
        print(json.dumps({"metric": "streamed end-to-end train (224px, f32)",
                          "value": out["streamed_train_img_s"],
                          "unit": "img/s",
                          "fed_fraction": out["fed_fraction"],
                          "loss": round(loss, 4)}), flush=True)
        rate_u8, loss_u8 = train_rate(args.root, args.batch_size, args.cache,
                                      args.workers, raw=True)
        out["streamed_train_u8_img_s"] = round(rate_u8, 1)
        out["fed_fraction_u8"] = round(rate_u8 / bound, 3)
        print(json.dumps({"metric": "streamed end-to-end train (224px, "
                                    "raw-u8 + device normalize)",
                          "value": out["streamed_train_u8_img_s"],
                          "unit": "img/s",
                          "fed_fraction": out["fed_fraction_u8"],
                          "loss": round(loss_u8, 4)}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
