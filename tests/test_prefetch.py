"""DevicePrefetcher: termination, early close, error surfacing."""

import time

import numpy as np
import pytest

from clip_dplm_tpu.data.prefetch import DevicePrefetcher


def test_sentinel_survives_full_queue():
    """Regression: the DONE sentinel must reach the consumer even when the
    queue is at capacity when the source iterator exhausts (a put_nowait
    there dropped it and __next__ blocked forever)."""
    batches = [{"x": np.full(2, i, np.float32)} for i in range(4)]
    pf = DevicePrefetcher(iter(batches), depth=1)
    time.sleep(0.3)  # let the worker fill the depth-1 queue and exhaust
    out = list(pf)
    assert len(out) == 4
    np.testing.assert_array_equal(np.asarray(out[3]["x"]), batches[3]["x"])


def test_close_unblocks_worker_thread():
    """close() must stop a worker blocked on a full queue (consumer
    abandons the iterator mid-epoch, e.g. on preemption)."""
    pf = DevicePrefetcher(
        ({"x": np.zeros(1, np.float32)} for _ in range(1000)), depth=1)
    next(pf)
    pf.close()
    pf._thread.join(timeout=2.0)
    assert not pf._thread.is_alive()


def test_abandoned_iterator_reaps_worker():
    """A consumer that drops the prefetcher without close() (breaks out of a
    prefetch_to_device loop) must not leave the worker polling forever: the
    weakref finalizer stops it at GC time. The worker thread deliberately
    holds no reference to the DevicePrefetcher itself."""
    import gc

    pf = DevicePrefetcher(
        ({"x": np.zeros(1, np.float32)} for _ in range(1000)), depth=1)
    next(pf)
    thread = pf._thread
    del pf  # abandon without close()
    gc.collect()
    thread.join(timeout=2.0)
    assert not thread.is_alive()


def test_worker_error_raised_in_consumer():
    def gen():
        yield {"x": np.zeros(1, np.float32)}
        raise RuntimeError("boom")

    pf = DevicePrefetcher(gen(), depth=2)
    next(pf)
    with pytest.raises(RuntimeError, match="boom"):
        for _ in pf:
            pass
