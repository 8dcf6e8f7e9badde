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
durable save before exiting its train loop.

Multi-host: the sharded-array Orbax save is a COLLECTIVE across processes
at one agreed step, but SIGTERM lands on each host's Python at its own
time — host A can latch the flag at step N while host B's dispatch is
already at N+1, and mismatched collectives deadlock until the
provisioner's SIGKILL (no checkpoint at all, the exact failure this
feature exists to prevent). `requested_globally()` closes that window:
every process calls it at the same host-loop boundary and it all-gathers
the local flags, so the OR — and therefore the save step — is identical
on every host. Single-process (and the CPU-mesh test environment) reduces
to the local flag with no collective.
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

    def requested_globally(self) -> bool:
        """Cross-process agreement on the flag (see module docstring).

        COLLECTIVE in multi-process jobs: every process must call this at
        the same host-loop boundary. The Trainer polls it only every
        `train.preemption_poll_batches` batches plus at epoch ends —
        boundaries every host reaches identically — because the all-gather
        also syncs host with device and would kill the host's dispatch
        run-ahead if issued per step. The all-gather doubles as a barrier,
        so all hosts see the same OR and enter the collective checkpoint
        save at the same step.
        """
        import jax

        if jax.process_count() == 1:
            return self.requested
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(self.requested, dtype=np.bool_))
        return bool(np.any(flags))

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
