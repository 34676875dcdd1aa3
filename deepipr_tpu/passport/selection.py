"""Passport selection: build one passport from N candidate activation maps.

Reference semantics (models/layers/passportconv2d.py:90-123): given candidates
of shape (B, H, W, C),

- if C == 3 (raw input images): return one randomly chosen image;
- else: assemble a single (1, H, W, C) passport whose channel j is a randomly
  chosen, not-yet-used channel of candidate image (j mod B) — i.e. picks cycle
  through the images round-robin, sampling channels without replacement within
  each image.

This is a one-time host-side initialization pass (like the reference's
``random.sample`` usage), so it runs eagerly on NumPy with an explicit seed for
reproducibility instead of the reference's global RNG.
"""

from __future__ import annotations

import numpy as np


def passport_selection(candidates: np.ndarray, seed: int) -> np.ndarray:
    """Channel-shuffle selection of a single passport from candidates (NHWC)."""
    candidates = np.asarray(candidates)
    b, h, w, c = candidates.shape
    rng = np.random.default_rng(seed)

    if c == 3:  # raw input images: pick one whole image
        idx = int(rng.integers(0, b))
        return candidates[idx : idx + 1]

    # Per-image channel picks, round-robin over images.
    picks_per_image = [len(range(i, c, b)) for i in range(b)]
    chosen = [
        rng.choice(c, size=k, replace=False) for k in picks_per_image
    ]
    out = np.empty((1, h, w, c), dtype=candidates.dtype)
    for j in range(c):
        img = j % b
        ch = chosen[img][j // b]
        out[0, :, :, j] = candidates[img, :, :, ch]
    return out


def random_passport(shape, seed: int, dtype=np.float32) -> np.ndarray:
    """U(-1, 1) random passport, batch forced to 1.

    Mirrors the reference's generate_key (passportconv2d.py:198-207), which is
    invoked lazily at first forward for key_type='random'.
    """
    newshape = (1,) + tuple(shape[1:])
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, newshape).astype(dtype)
