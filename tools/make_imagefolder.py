"""Generate a synthetic 224px JPEG ImageFolder for exercising the streaming
ImageNet path (VERDICT r2 item 3).

The zero-egress environment has no real ImageNet; this produces a
class-learnable stand-in with the same on-disk layout the reference's
ImageFolder pipeline consumes (reference dataset.py:196-243):

    root/train/<class_xxx>/<img>.jpg
    root/val/<class_xxx>/<img>.jpg

Images are 256px JPEGs (so the loader's short-side-256 resize + 224 crop has
real work to do, like decoding ImageNet), with class identity carried by a
low-frequency pattern that survives JPEG + crop + resize.

Run: python tools/make_imagefolder.py --root /tmp/synth_imagenet \
        --classes 10 --per-class 512 --val-per-class 64
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def class_image(rng: np.random.Generator, cls: int, n_classes: int,
                size: int = 256) -> np.ndarray:
    """One synthetic image: class-specific 2-D sinusoid mixture + random
    colored gradient + noise, uint8 HWC."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    phase = 2 * np.pi * cls / n_classes
    freq = 2 + (cls % 5)
    pattern = (
        np.sin(2 * np.pi * freq * xx + phase)
        + np.cos(2 * np.pi * freq * yy - phase)
        + 0.5 * np.sin(2 * np.pi * (freq + 1) * (xx + yy) + 2 * phase)
    )
    pattern = (pattern - pattern.min()) / (np.ptp(pattern) + 1e-8)

    g = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
    gradient = xx[..., None] * g[0] + yy[..., None] * g[1]
    gradient = (gradient - gradient.min()) / (np.ptp(gradient) + 1e-8)

    mix = 0.55 * pattern[..., None] + 0.30 * gradient
    mix = mix + 0.15 * rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    return (255 * np.clip(mix, 0, 1)).astype(np.uint8)


def write_split(root: str, split: str, n_classes: int, per_class: int,
                seed: int, size: int, quality: int) -> int:
    from PIL import Image

    count = 0
    for cls in range(n_classes):
        d = os.path.join(root, split, f"class_{cls:03d}")
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(
            (seed, 0 if split == "train" else 1, cls))
        for i in range(per_class):
            img = Image.fromarray(class_image(rng, cls, n_classes, size))
            img.save(os.path.join(d, f"{i:05d}.jpg"), quality=quality)
            count += 1
    return count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--per-class", type=int, default=512)
    ap.add_argument("--val-per-class", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    n = write_split(args.root, "train", args.classes, args.per_class,
                    args.seed, args.size, args.quality)
    m = write_split(args.root, "val", args.classes, args.val_per_class,
                    args.seed, args.size, args.quality)
    print(f"wrote {n} train + {m} val JPEGs under {args.root}")


if __name__ == "__main__":
    main()
