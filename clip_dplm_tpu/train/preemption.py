"""Preemption-safe training: checkpoint the live TrainState on SIGTERM.

The reference has no failure handling beyond early stopping (SURVEY.md §5
"failure detection": none), and its checkpointing is epoch-granular
(`triple_flow/5_training.py:335-347`). On preemptible/spot TPU pools the
provisioner delivers SIGTERM to every host of a pod slice shortly before
the machines disappear — catching it and saving at STEP granularity is the
difference between resuming at `state.step` and losing the epoch.

Design: a signal handler only sets a flag (async-signal-safe, and Orbax
must not run inside a handler); the Trainer polls the flag between steps —
host-side, nanoseconds against a multi-ms device step — and performs one
durable save before exiting its train loop. Every process of a multi-host
job receives the signal locally and participates in the (collective) Orbax
save, so no cross-host flag agreement is needed for the preemption case.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable, Optional


class PreemptionGuard:
    """Latches termination signals into a thread-safe flag.

    Use as a context manager (or call install()/uninstall()) around a train
    loop; poll `requested` between steps. `request()` sets the flag
    programmatically (tests, custom watchdogs). Handlers chain to any
    previously-installed *callable* handler so outer frameworks still see
    the signal; the default/ignore dispositions are restored on uninstall.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._event = threading.Event()
        self._prev: dict = {}

    # -- flag ---------------------------------------------------------------
    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def request(self) -> None:
        self._event.set()

    # -- signal plumbing ----------------------------------------------------
    def _handler(self, signum, frame) -> None:
        self._event.set()
        prev = self._prev.get(signum)
        if callable(prev):
            prev(signum, frame)

    def install(self) -> "PreemptionGuard":
        """Register handlers. Only the main thread may install (CPython
        restriction); elsewhere this is a no-op and `request()` remains the
        delivery path."""
        if threading.current_thread() is not threading.main_thread():
            return self
        for s in self._signals:
            self._prev[s] = signal.getsignal(s)
            signal.signal(s, self._handler)
        return self

    def uninstall(self) -> None:
        for s, prev in self._prev.items():
            try:
                signal.signal(s, prev)
            except (ValueError, TypeError):  # non-main thread / exotic prev
                pass
        self._prev.clear()

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> Optional[bool]:
        self.uninstall()
        return None
