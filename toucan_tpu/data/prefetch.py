"""Async host→device input pipeline (SURVEY §2.10 host-side parallelism).

The reference keeps its GPU fed with 12 DataLoader worker processes
(``toucantts_train_loop.py:68-76``).  The TPU-native equivalent: a bounded
pool of background threads that sample, pad, and ``device_put`` upcoming
batches while the chip executes the current step, so the jitted step
dequeues an already-resident batch and the host work never sits on the
step path.  Python threads are the right tool here — padding is numpy C
code and ``device_put`` releases the GIL during the DMA, so the workers
overlap both with each other and with the main thread's dispatch loop
(the CPU-heavy *cache building* uses processes, ``data/corpus.py``).

``workers > 1`` matters when a single prepare+upload takes longer than a
train step (measured on the TPU relay: ~0.23 s input vs 0.13 s step made
1-worker streaming input-bound at 0.57x the resident rate); N workers
pipeline N uploads concurrently while strictly preserving batch order.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


class DevicePrefetcher:
    """Iterate device-resident batches, prepared up to ``depth`` steps
    ahead by ``workers`` parallel threads, in source order.

    ``source``: an iterable of host batches (dicts of numpy arrays).
    ``to_device``: host batch -> device batch (e.g. ``jnp.asarray`` per
    leaf, or ``dist.make_global_batch`` on a mesh).  Exceptions raised by
    the source or the upload re-raise at the consuming ``next()`` call.
    """

    _SENTINEL = object()

    def __init__(self, source: Iterable, to_device: Callable, depth: int = 2,
                 workers: int = 1):
        self._depth = max(1, depth)
        self._workers = max(1, workers)
        self._cond = threading.Condition()
        self._results = {}
        self._next_out = 0
        self._total = None    # set by the reader once the source exhausts
        self._err = None      # worker (upload) error: raise immediately
        self._src_err = None  # source error: raise after delivering the
        self._stop = threading.Event()  # batches produced before it
        self._in_q: queue.Queue = queue.Queue(
            maxsize=self._workers + self._depth)

        def read():
            seq = 0
            try:
                for batch in source:
                    if self._stop.is_set():
                        break
                    self._in_q.put((seq, batch))
                    seq += 1
            except BaseException as exc:  # surfaced on the consumer side
                with self._cond:
                    self._src_err = exc
                    self._cond.notify_all()
            finally:
                with self._cond:
                    self._total = seq
                    self._cond.notify_all()
                for _ in range(self._workers):
                    self._in_q.put(self._SENTINEL)

        def work():
            while True:
                if self._stop.is_set():
                    return
                try:  # timeout get: close() can stop a worker without a
                    item = self._in_q.get(timeout=0.2)  # sentinel race
                except queue.Empty:
                    continue
                if item is self._SENTINEL:
                    with self._cond:
                        self._cond.notify_all()
                    return
                seq, batch = item
                try:
                    out = to_device(batch)
                except BaseException as exc:
                    with self._cond:
                        self._err = exc
                        self._cond.notify_all()
                    return
                with self._cond:
                    # backpressure: never run more than depth+workers
                    # batches ahead of the consumer
                    while (not self._stop.is_set() and self._err is None
                           and seq - self._next_out
                           >= self._depth + self._workers):
                        self._cond.wait(0.2)
                    self._results[seq] = out
                    self._cond.notify_all()

        self._threads = [threading.Thread(target=read, daemon=True,
                                          name="toucan-prefetch-read")]
        self._threads += [
            threading.Thread(target=work, daemon=True,
                             name=f"toucan-prefetch-{i}")
            for i in range(self._workers)]
        for t in self._threads:
            t.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        with self._cond:
            while True:
                if self._next_out in self._results:
                    out = self._results.pop(self._next_out)
                    self._next_out += 1
                    self._cond.notify_all()
                    return out
                if self._err is not None:  # an upload failed: no more order
                    raise self._err
                if self._total is not None and self._next_out >= self._total:
                    # every sourced batch has been consumed
                    if self._src_err is not None:
                        raise self._src_err
                    raise StopIteration
                self._cond.wait(0.2)

    def close(self):
        """Stop early (e.g. loop break): unblock and join the workers."""
        import time

        self._stop.set()
        with self._cond:
            self._cond.notify_all()
        deadline = time.time() + 5
        while any(t.is_alive() for t in self._threads) and \
                time.time() < deadline:
            try:  # drain so a blocked put() can complete and see the stop
                self._in_q.get(timeout=0.1)
            except queue.Empty:
                pass
            with self._cond:
                self._cond.notify_all()
        for t in self._threads:
            t.join(timeout=1)


def prefetch_to_device(source, mesh=None, depth: int = 2,
                       workers: int = 2) -> DevicePrefetcher:
    """Convenience wrapper picking the right upload fn for the mesh."""
    import jax.numpy as jnp

    if mesh is not None:
        from toucan_tpu.dist import make_global_batch
        to_device = lambda b: make_global_batch(b, mesh)
    else:
        to_device = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
    return DevicePrefetcher(source, to_device, depth=depth, workers=workers)
