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
from typing import Callable, Iterable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident batches, always
    keeping `depth` batches in flight."""

    _DONE = object()

    def __init__(
        self,
        batches: Iterable,
        sharding=None,
        depth: int = 2,
        transform: Optional[Callable] = None,
        put: Optional[Callable] = None,
    ):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._error: Optional[BaseException] = None
        self._sharding = sharding
        self._transform = transform
        self._put = put
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, args=(iter(batches),), daemon=True
        )
        self._thread.start()

    def _put_device(self, batch):
        if self._transform is not None:
            batch = self._transform(batch)
        if self._put is not None:  # whole-batch placement (parallel.shard_batch)
            return self._put(batch)
        if callable(self._sharding):  # per-leaf sharding rule
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._sharding(x)), batch
            )
        if self._sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    def _worker(self, it: Iterator):
        try:
            for batch in it:
                if self._stop.is_set():
                    return
                out = self._put_device(batch)
                while not self._stop.is_set():
                    try:
                        self._queue.put(out, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface worker errors to the consumer
            self._error = e
        finally:
            # blocking put (bounded by the stop flag): the sentinel MUST
            # reach the consumer on normal exhaustion even when the queue
            # is full, or __next__ blocks forever
            while True:
                try:
                    self._queue.put(self._DONE, timeout=0.1)
                    break
                except queue.Full:
                    if self._stop.is_set():
                        break

    def close(self) -> None:
        """Stop the worker early (consumer abandons the iterator, e.g. on
        preemption) and unblock it if it's waiting on a full queue."""
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._DONE:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch_to_device(batches: Iterable, sharding=None, depth: int = 2):
    """Convenience: `for batch in prefetch_to_device(loader, sharding): ...`"""
    return DevicePrefetcher(batches, sharding=sharding, depth=depth)
