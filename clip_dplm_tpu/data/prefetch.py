"""Double-buffered host->device prefetch.

The reference's DataLoader workers (num_workers=4, pin_memory — SURVEY.md
section 3.1 process boundary #1) become a single background thread that runs
host collation (optionally the native C++ tokenizer) and `jax.device_put`s
the NEXT batch while the device executes the current step — hiding host time
behind device time without torch's process pool.
"""

from __future__ import annotations

import queue
import threading
import weakref
from typing import Callable, Iterable, Iterator, Optional


class _WorkerState:
    """Everything the worker thread touches, deliberately separated from the
    public wrapper: the thread must NOT hold a reference to the
    DevicePrefetcher itself, or the weakref.finalize that reaps abandoned
    iterators (consumer broke out of the loop without close()) could never
    fire and the worker would poll queue.Full at 10 Hz forever."""

    __slots__ = ("queue", "stop", "error", "sharding", "transform", "put")

    def __init__(self, depth, sharding, transform, put):
        self.queue: queue.Queue = queue.Queue(maxsize=depth)
        self.stop = threading.Event()
        self.error: Optional[BaseException] = None
        self.sharding = sharding
        self.transform = transform
        self.put = put


_DONE = object()


def _put_device(state: _WorkerState, batch):
    import jax

    if state.transform is not None:
        batch = state.transform(batch)
    if state.put is not None:  # whole-batch placement (parallel.shard_batch)
        return state.put(batch)
    if callable(state.sharding):  # per-leaf sharding rule
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, state.sharding(x)), batch
        )
    if state.sharding is not None:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, state.sharding), batch
        )
    return jax.tree_util.tree_map(jax.device_put, batch)


def _worker(state: _WorkerState, it: Iterator):
    try:
        for batch in it:
            if state.stop.is_set():
                return
            out = _put_device(state, batch)
            while not state.stop.is_set():
                try:
                    state.queue.put(out, timeout=0.1)
                    break
                except queue.Full:
                    continue
    except BaseException as e:  # surface worker errors to the consumer
        state.error = e
    finally:
        # blocking put (bounded by the stop flag): the sentinel MUST
        # reach the consumer on normal exhaustion even when the queue
        # is full, or __next__ blocks forever
        while True:
            try:
                state.queue.put(_DONE, timeout=0.1)
                break
            except queue.Full:
                if state.stop.is_set():
                    break


def _reap(state: _WorkerState) -> None:
    """close() body and weakref.finalize target: stop the worker and drop
    queued device buffers."""
    state.stop.set()
    try:
        while True:
            state.queue.get_nowait()
    except queue.Empty:
        pass


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident batches, always
    keeping `depth` batches in flight."""

    def __init__(
        self,
        batches: Iterable,
        sharding=None,
        depth: int = 2,
        transform: Optional[Callable] = None,
        put: Optional[Callable] = None,
    ):
        self._state = _WorkerState(depth, sharding, transform, put)
        self._thread = threading.Thread(
            target=_worker, args=(self._state, iter(batches)), daemon=True
        )
        self._thread.start()
        # If the consumer abandons the iterator without close() (e.g. breaks
        # out of a prefetch_to_device loop), reap the worker at GC time.
        self._finalizer = weakref.finalize(self, _reap, self._state)

    def close(self) -> None:
        """Stop the worker early (consumer abandons the iterator, e.g. on
        preemption) and unblock it if it's waiting on a full queue."""
        self._finalizer()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._state.queue.get()
        if item is _DONE:
            if self._state.error is not None:
                raise self._state.error
            raise StopIteration
        return item


def prefetch_to_device(batches: Iterable, sharding=None, depth: int = 2):
    """Convenience: `for batch in prefetch_to_device(loader, sharding): ...`"""
    return DevicePrefetcher(batches, sharding=sharding, depth=depth)
