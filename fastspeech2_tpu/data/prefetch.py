"""Background prefetching for the input pipeline.

The reference overlaps disk IO with compute via 4 DataLoader worker processes
(``/root/reference/dataset/dataloader.py:21``). Here a bounded-queue background
thread does the same job: .npy loads and batch padding are numpy/IO work that
releases the GIL, so one thread keeps the accelerator from stalling between
steps while preserving the batcher's deterministic order.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate ``iterable`` on a background thread, ``depth`` items ahead.

    Exceptions from the producer re-raise at the consumer's next pull;
    abandoning the iterator (break / GC) stops the producer promptly because
    puts block on the bounded queue and check the stop flag.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    err: list[BaseException] = []

    def producer():
        try:
            for item in iterable:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
