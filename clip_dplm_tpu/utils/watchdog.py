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

    @property
    def ok(self) -> bool:
        return self.returncode == 0


STALL_EXIT_CODE = 124  # mirrors coreutils `timeout`


def _pump(stream, sink, last_output: list, echo: bool) -> None:
    """Forward one child stream line-by-line, stamping the activity clock."""
    for line in stream:
        last_output[0] = time.monotonic()
        if echo:
            sink.write(line)
            sink.flush()


def run_with_watchdog(
    cmd: Sequence[str],
    stall_timeout: float = 300.0,
    retries: int = 2,
    max_seconds: Optional[float] = None,
    echo: bool = True,
    retry_delay: float = 10.0,
    stderr_to_stdout: bool = True,
) -> WatchdogResult:
    """Run `cmd`, killing + retrying when it goes silent for `stall_timeout`
    seconds. Returns after the first clean exit (code 0), the first REAL
    failure (non-zero exit), or when attempts run out.

    `stderr_to_stdout=False` keeps the child's streams separate (stdout ->
    stdout, stderr -> stderr); both still feed the activity clock. Use it
    when the caller's stdout is a machine-read contract (e.g. bench.py's
    one JSON line) and progress markers ride stderr."""
    attempts = 0
    stalled = 0
    deadline = time.monotonic() + max_seconds if max_seconds else None
    while True:
        attempts += 1
        proc = subprocess.Popen(
            list(cmd), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT if stderr_to_stdout else subprocess.PIPE,
            text=True, bufsize=1,
        )
        last_output = [time.monotonic()]
        pumps = [threading.Thread(
            target=_pump, args=(proc.stdout, sys.stdout, last_output, echo),
            daemon=True)]
        if not stderr_to_stdout:
            pumps.append(threading.Thread(
                target=_pump,
                args=(proc.stderr, sys.stderr, last_output, echo),
                daemon=True))
        for p in pumps:
            p.start()

        killed = False
        while True:
            try:
                proc.wait(timeout=1.0)
                break
            except subprocess.TimeoutExpired:
                pass
            silent_for = time.monotonic() - last_output[0]
            out_of_time = deadline is not None and time.monotonic() > deadline
            if silent_for > stall_timeout or out_of_time:
                proc.kill()
                proc.wait()
                killed = True
                break
        for p in pumps:
            p.join(timeout=5.0)

        if not killed and proc.returncode == 0:
            return WatchdogResult(0, attempts, stalled)
        if not killed:
            # real failure (it exited by itself): do not mask it with retries
            return WatchdogResult(proc.returncode, attempts, stalled)
        stalled += 1
        if echo:
            print(f"[watchdog] attempt {attempts} stalled "
                  f"(>{stall_timeout:.0f}s silent); "
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
