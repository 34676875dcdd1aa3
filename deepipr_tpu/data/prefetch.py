"""Host->device pipelining: overlap augmentation/transfer with TPU compute.

The jitted step dispatches asynchronously, but the NumPy augmentation of the
NEXT batch would otherwise run serially after each dispatch. A small
background thread keeps a bounded queue of ready batches so the host works
while the chip does. Producer exceptions are re-raised in the consumer.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax


class _Sentinel:
    pass


_END = _Sentinel()


def prefetch(iterable: Iterable, size: int = 2, sharding=None) -> Iterator:
    """Iterate `iterable` on a background thread, `size` batches ahead.

    Batches are device_put from the producer thread — with `sharding` when
    given, else onto the default device — so the host->device transfer also
    overlaps with compute instead of serializing at step dispatch (this
    matters most when the chip sits behind a slow link; see BASELINE.md).
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    put = ((lambda x: jax.device_put(x, sharding)) if sharding is not None
           else jax.device_put)

    def producer():
        try:
            for item in iterable:
                q.put(jax.tree.map(put, item))
            q.put(_END)
        except BaseException as e:  # re-raised on the consumer side
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
