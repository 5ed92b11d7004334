"""Async host→device input pipeline (SURVEY §2.10 host-side parallelism).

The reference keeps its GPU fed with 12 DataLoader worker processes
(``toucantts_train_loop.py:68-76``).  The TPU-native equivalent: a bounded
background thread that samples, pads, and ``device_put``s batch N+1 while
the chip executes step N, so the jitted step dequeues an already-resident
batch and the host work never sits on the step path.  (Python threads are
the right tool here — padding is numpy C code and ``device_put`` releases
the GIL during the DMA, so a single prefetch thread overlaps fully with
the main thread's dispatch loop; the CPU-heavy *cache building* uses
processes, ``data/corpus.py``.)
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


class DevicePrefetcher:
    """Iterate device-resident batches, prepared ``depth`` steps ahead.

    ``source``: an iterable of host batches (dicts of numpy arrays).
    ``to_device``: host batch -> device batch (e.g. ``jnp.asarray`` per
    leaf, or ``dist.make_global_batch`` on a mesh).  Exceptions raised by
    the source or the upload re-raise at the consuming ``next()`` call.
    """

    _DONE = object()

    def __init__(self, source: Iterable, to_device: Callable, depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err = None
        self._stop = threading.Event()

        def work():
            try:
                for batch in source:
                    if self._stop.is_set():
                        return
                    self._queue.put(to_device(batch))
            except BaseException as exc:  # surfaced on the consumer side
                self._err = exc
            finally:
                self._queue.put(self._DONE)

        self._thread = threading.Thread(target=work, daemon=True,
                                        name="toucan-prefetch")
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._DONE:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop early (e.g. loop break): unblock and join the worker."""
        import time

        self._stop.set()
        deadline = time.time() + 5
        while self._thread.is_alive() and time.time() < deadline:
            try:  # drain so a blocked put() can complete and see the stop
                self._queue.get(timeout=0.1)
            except queue.Empty:
                pass
        self._thread.join(timeout=1)


def prefetch_to_device(source, mesh=None, depth: int = 2) -> DevicePrefetcher:
    """Convenience wrapper picking the right upload fn for the mesh."""
    import jax.numpy as jnp

    if mesh is not None:
        from toucan_tpu.dist import make_global_batch
        to_device = lambda b: make_global_batch(b, mesh)
    else:
        to_device = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
    return DevicePrefetcher(source, to_device, depth=depth)
