"""Background input-pipeline prefetch.

The reference's train loop batchifies on the host, ships the batch, then
blocks on the device step before touching the next batch (SURVEY.md §3.2) —
host work and device work alternate. On TPU the device queue should never
drain: `prefetch_iter` runs the host-side transform (batchify -> numpy ->
`jax.device_put` / sharded put) for upcoming batches in a daemon thread,
keeping up to `depth` device-ready batches ahead of the training loop, so
the H2D transfer and the per-batch Python work overlap the previous steps'
device execution. Paired with the Trainer's bounded in-flight dispatch
window (trainer.py), the TPU sees back-to-back steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")
_DONE = object()


def prefetch_iter(
    iterable: Iterable,
    fn: Optional[Callable] = None,
    depth: int = 2,
) -> Iterator:
    """Yield `fn(item)` for each item, computed `depth` items ahead in a
    background thread.

    depth <= 0 degrades to a plain synchronous map (useful for debugging
    and as the comparison baseline in tests). Exceptions raised by the
    source iterable or by `fn` propagate to the consumer at the point of
    the failed item. If the consumer abandons the iterator early, the
    worker thread is signalled to stop and exits promptly.
    """
    if depth <= 0:
        for item in iterable:
            yield fn(item) if fn is not None else item
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    err: list = []

    def worker():
        try:
            for item in iterable:
                out = fn(item) if fn is not None else item
                while not stop.is_set():
                    try:
                        q.put(out, timeout=0.05)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 - propagated to consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_DONE, timeout=0.05)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True,
                         name="gtos-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
