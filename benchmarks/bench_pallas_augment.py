#!/usr/bin/env python
"""A/B: Pallas fused gather+augment vs the XLA input stage (real TPU).

Round-3 "one targeted Pallas attempt" (VERDICT r2 item 5). Measures, at the
scanned-epoch operating point (resident uint8 CIFAR set, bs 256):

  A. XLA path: dataset[idx] gather -> make_device_augment 'onehot' (the
     production default inside --epoch-scan);
  B. XLA path with 'slice' crop (vmapped dynamic_slice);
  C. Pallas fused kernel (per-image DMA gather + crop slice + flip matmul +
     normalize in one pass).

Each timed standalone (jit of just the stage) and reported as µs/batch and
img/s. Same-session numbers only — the relay varies run to run.

Run: python benchmarks/bench_pallas_augment.py [--batch 256] [--n 12800]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)  # relay: force materialization
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n", type=int, default=12800)
    ap.add_argument("--pad", type=int, default=4)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from deepipr_tpu.data.device_augment import make_device_augment
    from deepipr_tpu.ops.pallas_augment import make_pallas_augment

    rng = np.random.default_rng(0)
    ds = jax.device_put(
        rng.integers(0, 256, (args.n, 32, 32, 3)).astype(np.uint8))
    idx = jax.device_put(
        rng.permutation(args.n)[: args.batch].astype(np.int32))
    key = jax.random.key(7)

    results = {}

    for impl in ("onehot", "slice"):
        aug = make_device_augment(args.pad, crop_impl=impl)

        @jax.jit
        def xla_stage(key, ds, idx, aug=aug):
            return aug(key, ds[idx])

        dt = timeit(xla_stage, key, ds, idx, iters=args.iters)
        results[f"xla_{impl}"] = dt
        print(json.dumps({
            "metric": f"input stage XLA gather+{impl} (bs {args.batch})",
            "value": round(dt * 1e6, 1), "unit": "us/batch",
            "img_s": round(args.batch / dt, 1)}), flush=True)

    pal = make_pallas_augment(args.pad, block=args.block)
    ds_rows = jax.block_until_ready(pal.prepare_rows(ds))  # one-time relayout
    dt = timeit(pal, key, ds_rows, idx, iters=args.iters)
    results["pallas"] = dt
    print(json.dumps({
        "metric": f"input stage Pallas fused (bs {args.batch}, "
                  f"block {args.block})",
        "value": round(dt * 1e6, 1), "unit": "us/batch",
        "img_s": round(args.batch / dt, 1)}), flush=True)

    # correctness on hardware, not just interpret mode
    got = np.asarray(pal(key, ds_rows, idx))
    ref = np.asarray(jax.jit(
        lambda k, d, i: make_device_augment(args.pad)(k, d[i]))(key, ds, idx))
    maxdiff = float(np.abs(got - ref).max())
    print(json.dumps({
        "metric": "pallas vs xla max abs diff (hardware)",
        "value": maxdiff, "unit": "f32"}), flush=True)

    print(json.dumps({
        "speedup_vs_onehot": round(results["xla_onehot"] / results["pallas"], 3),
        "speedup_vs_slice": round(results["xla_slice"] / results["pallas"], 3),
        "max_abs_diff": maxdiff,
    }))


if __name__ == "__main__":
    main()
