"""Bounded background prefetch for host iterators.

The reference gets host-side overlap from a fork pool over files
(main.py:232-235).  Here a reader thread keeps parsing/encoding ahead
while the main thread drives the device, bounded by a queue so memory
stays flat."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], depth: int = 4) -> Iterator[T]:
    """Iterate `iterable` on a background thread, `depth` items ahead.
    Exceptions propagate to the consumer at the point of iteration."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            q.put((_SENTINEL, e))
            return
        q.put((_SENTINEL, None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _SENTINEL:
            if item[1] is not None:
                raise item[1]
            return
        yield item
