"""Running-average meter (reference experiments/trainer.py:9-25 AverageMeter —
defined there but unused by the trainers; provided for API parity and for
host-side metric smoothing in custom loops)."""

from __future__ import annotations


class AverageMeter:
    """Tracks a running sum/count and exposes the current average."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
