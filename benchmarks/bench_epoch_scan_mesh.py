"""A/B: scanned epochs vs the per-step loop on a multi-device mesh.

Round 2 left --epoch-scan single-chip with an unmeasured claim that per-step
host sharding was the pod answer. Round 3 made the scan compose with the
mesh (train/epoch.py: resident data replicated, gathers constrained to
P('batch')); this benchmark backs the path choice with numbers on the only
multi-device surface available here — the virtual 8-device CPU mesh.

Caveats (stated up front): virtual CPU devices share host cores, so absolute
numbers mean nothing. Measured result (docs/DESIGN.md section 20): XLA:CPU
lowers the scanned epoch pathologically (0.056x per-step at 8 devices,
0.012x at 1 device) — the 1-device control shows the SPMD partitioner is
NOT the cause, so the CPU mesh cannot arbitrate the TPU decision on
throughput; the TPU evidence is the single-chip 2x win with the identical
dispatch structure (BASELINE.md: per-step 14.5k vs scan 29.7k img/s).

Run: python benchmarks/bench_epoch_scan_mesh.py [--arch alexnet] [--epochs 3]
(forces the CPU platform + 8 virtual devices; run from repo root). Defaults
are sized for the one-core box: the 8-step scan body already exhibits the
dispatch structure, and XLA's CPU compile of a bs-256/16-step scan took
>90 min there.
"""

import argparse
import json
import os
import sys
import time

_n_dev = "8"
for _i, _a in enumerate(sys.argv):
    if _a == "--devices":
        _n_dev = sys.argv[_i + 1]
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_n_dev}").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepipr_tpu.data import synthetic_dataset  # noqa: E402
from deepipr_tpu.data.device_augment import make_device_augment  # noqa: E402
from deepipr_tpu.models import build_model  # noqa: E402
from deepipr_tpu.parallel import make_mesh, replicate, shard_batch  # noqa: E402
from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer  # noqa: E402
from deepipr_tpu.train.epoch import device_resident, make_epoch_train_fn  # noqa: E402
from deepipr_tpu.utils.config import (  # noqa: E402
    construct_passport_kwargs,
    load_passport_config,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="alexnet",
                    choices=["alexnet", "resnet18"])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--n-images", type=int, default=512)
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU device count (1 isolates scan-vs-"
                         "per-step from the SPMD partitioner)")
    args = ap.parse_args()

    mesh = make_mesh()
    n_dev = mesh.size
    cfg = load_passport_config(
        f"passport_configs/{'resnet18' if args.arch == 'resnet18' else args.arch}_passport.json")
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = build_model(args.arch, 10, passport_kwargs=kw, private=True)

    x_u8, y, _, _ = synthetic_dataset(num_train=args.n_images, num_test=8)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    variables = model.init(rngs, jnp.zeros((2, 32, 32, 3)), train=True)
    state0 = jax.tree.map(np.asarray,
                          TrainState.create(variables, sgd_optimizer(0.01)))
    steps = args.n_images // args.batch_size

    def run(name, fn, warmup_fn=None):
        (warmup_fn or fn)()  # compile
        t0 = time.time()
        for _ in range(args.epochs):
            fn()
        dt = (time.time() - t0) / args.epochs
        ips = steps * args.batch_size / dt
        print(json.dumps({
            "metric": f"epoch time ({name}, {args.arch} V2, bs "
                      f"{args.batch_size}, {n_dev}-dev virtual CPU mesh)",
            "value": round(dt, 3), "unit": "s/epoch",
            "images_per_sec": round(ips, 1),
        }))
        return dt

    # --- scanned epochs on the mesh
    state = replicate(jax.tree.map(jnp.asarray, state0), mesh)
    epoch_fn = make_epoch_train_fn(model, True, args.batch_size, pad=4,
                                   mesh=mesh)
    xs, ys = device_resident(x_u8, y, mesh=mesh)
    box = {"s": state, "ep": 0}

    def scan_epoch():
        box["ep"] += 1
        box["s"], m = epoch_fn(box["s"], xs, ys,
                               jax.random.fold_in(jax.random.key(5), box["ep"]))
        jax.block_until_ready(m["loss"])

    t_scan = run("epoch-scan", scan_epoch)

    # --- per-step loop, host-sharded batches (the round-2 multi-chip path)
    state = replicate(jax.tree.map(jnp.asarray, state0), mesh)
    aug = make_device_augment(4)
    step = make_train_step(model, True, device_augment=aug)
    box2 = {"s": state, "ep": 0}

    def per_step_epoch():
        box2["ep"] += 1
        perm = np.random.default_rng(box2["ep"]).permutation(args.n_images)
        m = None
        for t in range(steps):
            idx = perm[t * args.batch_size:(t + 1) * args.batch_size]
            batch = shard_batch(
                {"image": x_u8[idx], "label": y[idx]}, mesh)
            box2["s"], m = step(box2["s"], batch)
        jax.block_until_ready(m["loss"])

    t_step = run("per-step", per_step_epoch)
    print(json.dumps({
        "metric": "scan speedup over per-step on the mesh",
        "value": round(t_step / t_scan, 3), "unit": "x",
    }))


if __name__ == "__main__":
    main()
