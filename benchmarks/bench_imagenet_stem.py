#!/usr/bin/env python
"""Profile + optimize the 224px ImageNet-stem train path (VERDICT r3 item 1).

The CIFAR path got three rounds of optimization (split dual-forward, epoch
scan, device augment) and sits at measured 49% MFU; the ImageNet-stem path's
only published number was a data-resident bound (3.9-4.6k img/s at bs64).
This bench establishes its roofline position and A/Bs the levers:

- batch size sweep (MXU tiling improves with batch),
- K-step scan per dispatch (amortizes relay/host dispatch overhead the way
  the CIFAR epoch-scan does — streaming chunks become resident windows),
- raw-uint8 batches + on-device normalize (the --device-augment wiring).

Measurement protocol for the relay (CLAUDE.md): steps are CHAINED through
the donated TrainState so one float() at the end forces the whole sequence;
per-step host sync would measure the H2D link, not the chip.

Run on the real TPU:  python benchmarks/bench_imagenet_stem.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12  # TFLOP/s, same constant as the BASELINE.md MFU row


def build(batch_size: int, size: int = 224, num_classes: int = 1000,
          jit: bool = True, with_batch: bool = True, private: bool = True,
          dtype_name: str = "bf16", augment: str = "device"):
    """with_batch=False skips building/shipping the single batch (scan mode
    builds its own K-batch window; a 19-38 MB unused uint8 transfer is real
    money on the relay's slow H2D link).

    private/dtype_name/augment exist for the --audit byte accounting:
    augment='device' ships raw uint8 + fused normalize (the production
    wiring), 'none' ships a pre-normalized compute-dtype batch.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepipr_tpu.data.device_augment import normalize_device
    from deepipr_tpu.models import ResNet18, ResNet18Private
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.train.steps import make_train_step
    from deepipr_tpu.utils.config import (
        construct_passport_kwargs,
        load_passport_config,
    )

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    if private:
        cfg = load_passport_config("passport_configs/resnet18_passport.json")
        kwargs, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
        model = ResNet18Private(num_classes=num_classes,
                                passport_kwargs=kwargs,
                                imagenet=True, dtype=dtype)
        rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    else:
        model = ResNet18(num_classes=num_classes, imagenet=True, dtype=dtype)
        rngs = {"params": jax.random.key(0)}
    variables = model.init(rngs, jnp.zeros((1, size, size, 3), jnp.float32),
                           train=True)
    state = TrainState.create(variables, sgd_optimizer(0.01))

    batch = None
    if with_batch:
        rng = np.random.default_rng(0)
        if augment == "device":
            image = jax.device_put(rng.integers(
                0, 256, (batch_size, size, size, 3), dtype=np.uint8))
        else:
            image = jax.device_put(
                rng.standard_normal(
                    (batch_size, size, size, 3)).astype(np.float32)
                .astype(dtype))
        batch = {
            # raw uint8, normalize fused into the step: the streaming
            # --device-augment wiring (4x less H2D; H2D is out of the timed
            # region anyway — the batch is device-resident)
            "image": image,
            "label": jax.device_put(rng.integers(
                0, num_classes, batch_size).astype(np.int32)),
        }
    step = make_train_step(
        model, private=private,
        device_augment=(lambda key, x: normalize_device(x, dtype))
        if augment == "device" else None,
        jit=jit,
    )
    return model, state, step, batch


def timed_chain(step, state, batch, steps: int):
    """Chained steps (state dependency), one sync at the end."""
    import jax

    state, metrics = step(state, batch)  # compile + warmup
    float(metrics["loss"])  # materialize: relay compiles need a RESULT
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    del state
    return dt, loss


def _roofline(cost):
    """flops + bytes accessed -> arithmetic intensity, where reported."""
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    nbytes = float(cost.get("bytes accessed", 0.0)) if cost else 0.0
    out = {"flops": flops}
    if nbytes:
        out["gbytes_per_step"] = round(nbytes / 1e9, 3)
        out["flop_per_byte"] = round(flops / nbytes, 1)
    return out


def bench_per_step(batch_size: int, steps: int = 30):
    model, state, step, batch = build(batch_size)
    compiled = step.lower(state, batch).compile()
    roof = _roofline(compiled.cost_analysis())
    flops = roof.pop("flops")
    dt, loss = timed_chain(step, state, batch, steps)
    return {
        "mode": "per-step",
        "batch_size": batch_size,
        "step_ms": round(dt * 1e3, 2),
        "img_per_sec": round(batch_size / dt, 1),
        "tflop_per_step": round(flops / 1e12, 4),
        "tflops": round(flops / dt / 1e12, 1),
        "mfu_pct": round(100 * flops / dt / V5E_BF16_PEAK, 1),
        **roof,
        "loss": round(loss, 4),
    }


def bench_scan(batch_size: int, k: int = 8, reps: int = 4, size: int = 224,
               num_classes: int = 1000):
    """K steps per dispatch over a resident window of K distinct batches."""
    import jax
    import numpy as np

    _, state, raw_step, _ = build(batch_size, size=size,
                                  num_classes=num_classes, jit=False,
                                  with_batch=False)
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(
        0, 256, (k, batch_size, size, size, 3), dtype=np.uint8))
    labels = jax.device_put(rng.integers(
        0, num_classes, (k, batch_size)).astype(np.int32))

    @jax.jit
    def window_fn(state, images, labels):
        def body(st, xs):
            img, lab = xs
            st, metrics = raw_step(st, {"image": img, "label": lab})
            return st, metrics["loss"]
        state, losses = jax.lax.scan(body, state, (images, labels))
        return state, losses

    # cost_analysis over the scanned program misreports loop flops on this
    # backend (measured: exactly single-step/k), so take the authoritative
    # per-step figure from a single-step compile of the same train step
    single = jax.jit(raw_step).lower(
        state, {"image": images[0], "label": labels[0]}).compile()
    roof = _roofline(single.cost_analysis())
    flops = roof.pop("flops")

    state, losses = window_fn(state, images, labels)
    float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = window_fn(state, images, labels)
    loss = float(losses[-1])
    dt = (time.perf_counter() - t0) / (reps * k)
    return {
        "mode": f"scan-k{k}",
        "batch_size": batch_size,
        "step_ms": round(dt * 1e3, 2),
        "img_per_sec": round(batch_size / dt, 1),
        "tflop_per_step": round(flops / 1e12, 4),
        "tflops": round(flops / dt / 1e12, 1),
        "mfu_pct": round(100 * flops / dt / V5E_BF16_PEAK, 1),
        **roof,
        "loss": round(loss, 4),
    }


def audit(batch_size: int = 256):
    """Byte accounting (VERDICT r4 item 6): compile step VARIANTS and diff
    their cost_analysis totals to locate where the 22.1 GB/step goes before
    spending timing runs on a lever. Compile-only — each relay compile is
    ~1-2 min but no training time."""
    variants = [
        ("base: private bf16 device-augment 224",
         dict(private=True, dtype_name="bf16", augment="device", size=224)),
        ("public-only (no dual forward)",
         dict(private=False, dtype_name="bf16", augment="device", size=224)),
        ("f32 compute dtype",
         dict(private=True, dtype_name="f32", augment="device", size=224)),
        ("pre-normalized input (no fused augment)",
         dict(private=True, dtype_name="bf16", augment="none", size=224)),
        ("112px (spatial scaling)",
         dict(private=True, dtype_name="bf16", augment="device", size=112)),
    ]
    rows = []
    for name, kw in variants:
        size = kw.pop("size")
        _, state, step, batch = build(batch_size, size=size, **kw)
        compiled = step.lower(state, batch).compile()
        roof = _roofline(compiled.cost_analysis())
        row = {"variant": name, "batch_size": batch_size,
               "tflop_per_step": round(roof.pop("flops") / 1e12, 4), **roof}
        try:
            mem = compiled.memory_analysis()
            row["temp_alloc_gb"] = round(mem.temp_size_in_bytes / 1e9, 3)
            row["argument_gb"] = round(mem.argument_size_in_bytes / 1e9, 3)
        except Exception:
            pass
        rows.append(row)
        print(json.dumps(row), flush=True)
        del state, batch, compiled
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="bs128 per-step + scan only")
    ap.add_argument("--audit", action="store_true",
                    help="compile-only byte accounting across step variants")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--bs", default=None,
                    help="comma-separated per-step batch sizes "
                         "(default 64,128,256)")
    ap.add_argument("--scan-bs", default=None,
                    help="comma-separated scan-mode batch sizes "
                         "(default 128,256)")
    args = ap.parse_args()

    if args.audit:
        audit()
        return

    rows = []
    if args.quick:
        per_step, scan = [128], [128]
    else:
        per_step = [int(b) for b in (args.bs or "64,128,256").split(",") if b]
        scan = [int(b) for b in (args.scan_bs or "128,256").split(",") if b]
    for bs in per_step:
        rows.append(bench_per_step(bs, steps=args.steps))
        print(json.dumps(rows[-1]), flush=True)
    for bs in scan:
        rows.append(bench_scan(bs, k=8))
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
