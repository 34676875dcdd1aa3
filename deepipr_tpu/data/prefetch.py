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

    If `sharding` is given, batches are device_put with it (so the transfer
    also overlaps with compute).
    """
    q: queue.Queue = queue.Queue(maxsize=size)

    def producer():
        try:
            for item in iterable:
                if sharding is not None:
                    item = jax.tree.map(
                        lambda x: jax.device_put(x, sharding), item
                    )
                q.put(item)
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
