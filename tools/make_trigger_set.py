#!/usr/bin/env python
"""Generate a synthetic trigger set in the WatermarkNN layout.

The reference's V3 scheme expects data/trigger_set/pics + labels-cifar.txt
(dataset.py:168-174) downloaded from the WatermarkNN repository. This
zero-egress stand-in writes deterministic abstract-pattern PNGs so the V3
backdoor pipeline runs offline; swap in the real trigger set for paper parity.
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/trigger_set")
    p.add_argument("--num", type=int, default=100)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--classes", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from PIL import Image

    rng = np.random.default_rng(args.seed)
    pics = os.path.join(args.out, "pics")
    os.makedirs(pics, exist_ok=True)
    labels = rng.integers(0, args.classes, args.num)
    for i in range(args.num):
        # structured noise patterns (not natural images), like trigger sets
        base = rng.integers(0, 256, (args.size // 4, args.size // 4, 3))
        img = np.kron(base, np.ones((4, 4, 1))).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(pics, f"{i:03d}.png"))
    np.savetxt(os.path.join(args.out, "labels-cifar.txt"), labels, fmt="%d")
    print(f"wrote {args.num} trigger images to {pics}")


if __name__ == "__main__":
    main()
