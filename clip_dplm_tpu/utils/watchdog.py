"""Stall watchdog for TPU runs through a flaky device tunnel.

The axon tunnel sporadically stalls (~200 s) or hangs hard — anything
touching the default backend then blocks forever with NO output and NO
exit (CLAUDE.md "Environment gotchas"). For long unattended work (sweeps,
parity A/Bs, trace captures) the recovery is mechanical: kill the silent
process and rerun. This module automates exactly that: run a command,
kill it after `stall_timeout` seconds WITHOUT output (silence, not wall
clock, is the hang signature), retry up to `retries` times.

A non-zero exit WITH output is a real failure and propagates immediately
— only silence and stall-kills are retried.

CLI: ``python scripts/tpu_watchdog.py -t 300 -r 2 -- python bench.py``
"""

from __future__ import annotations

import os
import re
import signal
import subprocess
import sys
import threading
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence


@dataclass
class WatchdogResult:
    returncode: int        # exit code of the last attempt (124 = stalled)
    attempts: int
    stalled: int           # how many attempts were killed for silence
    payload: Optional[str] = None  # line matched by success_pattern, if any

    @property
    def ok(self) -> bool:
        return self.returncode == 0


STALL_EXIT_CODE = 124  # mirrors coreutils `timeout`


class _PayloadMatcher:
    """Line matcher over a chunked byte stream (see ``success_pattern``).

    The pump threads hand it raw chunks; it re-assembles lines across
    chunk boundaries and remembers the FIRST line matching the pattern.
    Thread-safety: each stream gets its own matcher instance, so feed()
    is only ever called from one thread; run_with_watchdog reads
    ``matched`` after joining the pumps."""

    def __init__(self, pattern: str):
        self._re = re.compile(pattern)
        self._tail = ""
        self.matched: Optional[str] = None
        self.matched_at: Optional[float] = None

    def feed(self, chunk: bytes) -> None:
        text = self._tail + chunk.decode("utf-8", errors="replace")
        lines = text.split("\n")
        self._tail = lines.pop()
        for line in lines:
            if self.matched is None and self._re.search(line):
                self.matched = line
                self.matched_at = time.monotonic()

    def close(self) -> None:
        # a payload line with no trailing newline still counts at EOF
        if self._tail:
            self.feed(b"\n")


def _pump(stream, sink, last_output: list, echo: bool,
          matcher: Optional[_PayloadMatcher] = None) -> None:
    """Forward one child stream, stamping the activity clock per CHUNK.

    Chunks, not lines: \\r-style progress redraws (tqdm, spinners) never
    complete a line, and a line-based reader would count an actively
    working child as silent and kill it."""
    binary_sink = getattr(sink, "buffer", None)
    while True:
        chunk = stream.read(65536)
        if not chunk:
            if matcher is not None:
                matcher.close()
            return
        last_output[0] = time.monotonic()
        if echo:
            if binary_sink is not None:
                binary_sink.write(chunk)
            else:  # text-only sink (e.g. pytest capture)
                sink.write(chunk.decode("utf-8", errors="replace"))
            sink.flush()
        if matcher is not None:
            matcher.feed(chunk)


def _kill_tree(proc: subprocess.Popen) -> None:
    """SIGKILL the child's whole process group (it was started with
    start_new_session=True, so its pgid == its pid); fall back to killing
    just the child if the group is already gone."""
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError, OSError):
        proc.kill()


def run_with_watchdog(
    cmd: Sequence[str],
    stall_timeout: "float | Sequence[float]" = 300.0,
    retries: int = 2,
    max_seconds: Optional[float] = None,
    echo: bool = True,
    retry_delay: float = 10.0,
    stderr_to_stdout: bool = True,
    success_pattern: Optional[str] = None,
    payload_grace: Optional[float] = None,
) -> WatchdogResult:
    """Run `cmd`, killing + retrying when it goes silent for `stall_timeout`
    seconds. Returns after the first clean exit (code 0), the first REAL
    failure (non-zero exit), or when attempts run out.

    `stall_timeout` may be a sequence of per-attempt windows (last value
    repeats): e.g. ``[420, 210]`` gives the first attempt a long window for
    a cold-cache compile while retries keep the tight hang detector.

    `stderr_to_stdout=False` keeps the child's streams separate (stdout ->
    stdout, stderr -> stderr); both still feed the activity clock. Use it
    when the caller's stdout is a machine-read contract (e.g. bench.py's
    one JSON line) and progress markers ride stderr.

    `success_pattern`: regex searched against the child's STDOUT lines.
    Once a line matches, the payload is considered delivered and the
    attempt counts as SUCCESS (returncode 0, `result.payload` set) even if
    the child subsequently stalls or exits non-zero — the axon tunnel can
    hang in jax teardown AFTER bench.py has already printed its JSON line,
    and that must not burn a retry or fail the run.

    `payload_grace`: with a matched payload, kill a child still alive this
    many seconds after the match instead of waiting out a full stall
    window — for callers whose payload line is the LAST meaningful output
    (bench.py), so a teardown hang costs seconds, not `stall_timeout`."""
    attempts = 0
    stalled = 0
    windows = (
        [float(stall_timeout)]
        if isinstance(stall_timeout, (int, float))
        else [float(w) for w in stall_timeout]
    )
    deadline = time.monotonic() + max_seconds if max_seconds else None
    while True:
        attempts += 1
        window = windows[min(attempts - 1, len(windows) - 1)]
        # binary, unbuffered pipes: the pump stamps the activity clock per
        # CHUNK, so \r-style progress redraws (never a complete line) still
        # count as liveness. start_new_session puts the child in its own
        # process GROUP so a stall-kill reaps the whole tree — a stalled
        # child's own subprocesses would otherwise survive proc.kill() and
        # keep holding the TPU, making the retry contend with the orphan.
        proc = subprocess.Popen(
            list(cmd), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT if stderr_to_stdout else subprocess.PIPE,
            bufsize=0,
            start_new_session=True,
        )
        matcher = _PayloadMatcher(success_pattern) if success_pattern else None
        last_output = [time.monotonic()]
        pumps = [threading.Thread(
            target=_pump,
            args=(proc.stdout, sys.stdout, last_output, echo, matcher),
            daemon=True)]
        if not stderr_to_stdout:
            pumps.append(threading.Thread(
                target=_pump,
                args=(proc.stderr, sys.stderr, last_output, echo),
                daemon=True))
        for p in pumps:
            p.start()

        killed = False
        grace_killed = False
        while True:
            try:
                proc.wait(timeout=1.0)
                break
            except subprocess.TimeoutExpired:
                pass
            silent_for = time.monotonic() - last_output[0]
            out_of_time = deadline is not None and time.monotonic() > deadline
            grace_up = (
                payload_grace is not None and matcher is not None
                and matcher.matched_at is not None
                and time.monotonic() - matcher.matched_at > payload_grace)
            if silent_for > window or out_of_time or grace_up:
                _kill_tree(proc)
                proc.wait()
                killed = True
                grace_killed = grace_up and silent_for <= window
                break
        for p in pumps:
            p.join(timeout=5.0)

        payload = matcher.matched if matcher is not None else None
        if payload is not None:
            # the contract line was delivered — success, whatever happened
            # to the process afterwards (teardown hang, non-zero exit).
            # A grace kill (payload done, child reaped early) is not a stall.
            if killed and not grace_killed:
                stalled += 1
            return WatchdogResult(0, attempts, stalled, payload=payload)
        if not killed and proc.returncode == 0:
            return WatchdogResult(0, attempts, stalled)
        if not killed:
            # real failure (it exited by itself): do not mask it with retries
            return WatchdogResult(proc.returncode, attempts, stalled)
        stalled += 1
        if echo:
            print(f"[watchdog] attempt {attempts} stalled "
                  f"(>{window:.0f}s silent); "
                  f"{'retrying' if attempts <= retries else 'giving up'}",
                  file=sys.stderr, flush=True)
        if attempts > retries or (
                deadline is not None and time.monotonic() > deadline):
            return WatchdogResult(STALL_EXIT_CODE, attempts, stalled)
        time.sleep(retry_delay)


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("-t", "--stall-timeout", type=float, default=300.0,
                        help="kill after this many seconds WITHOUT output")
    parser.add_argument("-r", "--retries", type=int, default=2)
    parser.add_argument("--max-seconds", type=float, default=None,
                        help="overall wall-clock budget across attempts")
    parser.add_argument("--retry-delay", type=float, default=10.0,
                        help="pause before relaunching (lets the tunnel reset)")
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="command to run (prefix with --)")
    args = parser.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        parser.error("no command given")
    res = run_with_watchdog(
        cmd, stall_timeout=args.stall_timeout, retries=args.retries,
        max_seconds=args.max_seconds, retry_delay=args.retry_delay)
    return res.returncode


if __name__ == "__main__":
    sys.exit(main())
