"""Async input pipeline (data/prefetch.py): ordering, errors, early close,
and the train loop running through it."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from toucan_tpu.data.prefetch import DevicePrefetcher, prefetch_to_device


def test_prefetch_preserves_order_and_values():
    batches = [{"x": np.full((2, 3), i, np.float32)} for i in range(7)]
    got = list(prefetch_to_device(iter(batches), depth=2))
    assert len(got) == 7
    for i, b in enumerate(got):
        assert isinstance(b["x"], jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_prefetch_overlaps_host_work():
    """Producer sleeps 30 ms/batch; consumer sleeps 30 ms/batch.  Serial
    would be ~60 ms/batch — overlapped must be well under that."""

    def slow_source():
        for i in range(8):
            time.sleep(0.03)
            yield {"x": np.full((1,), i, np.float32)}

    pf = prefetch_to_device(slow_source(), depth=2)
    t0 = time.perf_counter()
    n = 0
    for _ in pf:
        time.sleep(0.03)
        n += 1
    elapsed = time.perf_counter() - t0
    assert n == 8
    assert elapsed < 8 * 0.055, f"no overlap: {elapsed:.3f}s for 8 batches"


def test_prefetch_propagates_source_error():
    def bad_source():
        yield {"x": np.zeros(1, np.float32)}
        raise RuntimeError("boom in loader")

    pf = prefetch_to_device(bad_source(), depth=2)
    next(pf)
    with pytest.raises(RuntimeError, match="boom in loader"):
        for _ in pf:
            pass


def test_prefetch_early_close_does_not_hang():
    def endless():
        i = 0
        while True:
            yield {"x": np.full((1,), i, np.float32)}
            i += 1

    pf = prefetch_to_device(endless(), depth=2)
    next(pf)
    t0 = time.perf_counter()
    pf.close()
    assert time.perf_counter() - t0 < 10
    assert not any(t.is_alive() for t in pf._threads)


def test_prefetch_custom_to_device():
    calls = []

    def to_dev(b):
        calls.append(b["x"][0])
        return {k: jnp.asarray(v) * 2 for k, v in b.items()}

    src = [{"x": np.full((1,), i, np.float32)} for i in range(3)]
    got = list(DevicePrefetcher(iter(src), to_dev, depth=1))
    assert [float(b["x"][0]) for b in got] == [0.0, 2.0, 4.0]
    assert calls == [0.0, 1.0, 2.0]


def test_prefetch_parallel_workers_preserve_order():
    """N workers pipeline uploads concurrently but delivery stays in
    source order, including when per-batch cost varies."""
    import random

    def to_dev(b):
        time.sleep(random.uniform(0, 0.02))
        return {k: jnp.asarray(v) for k, v in b.items()}

    src = [{"x": np.full((2,), i, np.float32)} for i in range(20)]
    got = list(DevicePrefetcher(iter(src), to_dev, depth=2, workers=4))
    assert [int(b["x"][0]) for b in got] == list(range(20))


def test_prefetch_parallel_workers_overlap_upload():
    """With upload cost > step cost, 4 workers must beat 1 worker."""

    def slow_up(b):
        time.sleep(0.04)
        return b

    src = [{"x": np.zeros(1)} for _ in range(12)]
    t0 = time.perf_counter()
    list(DevicePrefetcher(iter(src), slow_up, depth=2, workers=1))
    serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    list(DevicePrefetcher(iter(src), slow_up, depth=2, workers=4))
    parallel = time.perf_counter() - t0
    assert parallel < serial * 0.6, (serial, parallel)


def test_prefetch_worker_error_propagates():
    def bad_up(b):
        if int(b["x"][0]) == 2:
            raise RuntimeError("boom in upload")
        return b

    src = [{"x": np.full((1,), i, np.float32)} for i in range(5)]
    pf = DevicePrefetcher(iter(src), bad_up, depth=2, workers=3)
    with pytest.raises(RuntimeError, match="boom in upload"):
        for _ in pf:
            pass
