"""Host-side batch prefetching.

The reference overlaps input with compute via tf.data AUTOTUNE / torch
DataLoader workers; here a single background thread assembles the next host
batch while the device executes the current step (the device-side work —
augment/preprocess/train — is already one fused program, so one thread of
numpy collation is all the host path needs).

Cancellation-safe: if the consumer abandons the generator (exception in the
training loop, preemption), closing it sets a stop flag, the worker's
bounded put() times out, and the thread exits instead of pinning the source
iterable forever.
"""

from __future__ import annotations

import queue
import threading


def prefetch(iterable, depth: int = 2):
    """Iterate ``iterable`` on a background thread, ``depth`` items ahead."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    error: list[BaseException] = []

    def worker():
        try:
            for item in iterable:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate into the consumer
            error.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        stop.set()
