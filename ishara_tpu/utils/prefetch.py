"""Host-side batch prefetching.

The reference overlaps input with compute via tf.data AUTOTUNE / torch
DataLoader workers; here a single background thread assembles the next host
batch while the device executes the current step (the device-side work —
augment/preprocess/train — is already one fused program, so one thread of
numpy collation is all the host path needs).
"""

from __future__ import annotations

import queue
import threading


def prefetch(iterable, depth: int = 2):
    """Iterate ``iterable`` on a background thread, ``depth`` items ahead."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    error: list[BaseException] = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            error.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
