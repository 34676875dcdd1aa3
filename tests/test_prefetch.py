"""Prefetcher: ordering, completeness, exception propagation."""

import time

import numpy as np
import pytest

from deepipr_tpu.data.prefetch import prefetch


def test_preserves_order_and_count():
    items = [{"i": np.full(4, k)} for k in range(10)]
    out = list(prefetch(iter(items), size=3))
    assert len(out) == 10
    for k, b in enumerate(out):
        assert b["i"][0] == k


def test_overlaps_producer_with_consumer():
    def slow_gen():
        for k in range(5):
            time.sleep(0.08)
            yield k

    t0 = time.time()
    for _ in prefetch(slow_gen(), size=2):
        time.sleep(0.08)  # consumer work overlaps producer work
    elapsed = time.time() - t0
    # serial would be ~0.8s, overlapped ~0.48s; generous bound for CI load
    assert elapsed < 0.68


def test_producer_exception_reraised():
    def bad_gen():
        yield 1
        raise ValueError("boom in producer")

    it = prefetch(bad_gen(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom in producer"):
        list(it)
