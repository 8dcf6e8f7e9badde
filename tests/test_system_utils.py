import numpy as np
import pytest

from clip_dplm_tpu.utils.system import (
    DataValidationError,
    get_memory_status,
    validate_data,
)


def test_memory_status_runs():
    out = get_memory_status()
    assert isinstance(out, dict)


def test_validate_data_clean(rng):
    stats = validate_data(rng.normal(size=(50, 10)).astype(np.float32))
    assert stats["missing_fraction"] == 0.0


def test_validate_data_nan():
    x = np.ones((10, 4), np.float32)
    x[0, 0] = np.nan
    with pytest.raises(DataValidationError, match="non-finite"):
        validate_data(x)
    stats = validate_data(x, max_missing_fraction=0.1)
    assert stats["missing_fraction"] > 0


def test_validate_data_range():
    x = np.full((5, 2), 10.0, np.float32)
    with pytest.raises(DataValidationError, match="max"):
        validate_data(x, max_value=5.0)


def test_watchdog_passes_through_success_and_failure():
    import sys

    from clip_dplm_tpu.utils.watchdog import run_with_watchdog

    ok = run_with_watchdog([sys.executable, "-S", "-c", "print('hi')"],
                           stall_timeout=30, echo=False)
    assert ok.ok and ok.attempts == 1 and ok.stalled == 0
    # a REAL failure (exits by itself, non-zero) must propagate, not retry
    bad = run_with_watchdog([sys.executable, "-S", "-c", "raise SystemExit(3)"],
                            stall_timeout=30, echo=False)
    assert bad.returncode == 3 and bad.attempts == 1


def test_watchdog_kills_silent_hang_and_retries(tmp_path):
    """First attempt hangs silently (the tunnel signature) -> killed after
    the stall timeout; second attempt finds the marker file and succeeds."""
    import sys

    from clip_dplm_tpu.utils.watchdog import run_with_watchdog

    marker = tmp_path / "second_try"
    prog = (
        "import pathlib, sys, time\n"
        f"m = pathlib.Path({str(marker)!r})\n"
        "if m.exists():\n"
        "    print('recovered'); sys.exit(0)\n"
        "m.touch()\n"
        "time.sleep(600)\n"  # silent hang
    )
    # -S skips sitecustomize (which preloads jax and would eat the
    # stall budget in interpreter startup)
    res = run_with_watchdog([sys.executable, "-S", "-c", prog],
                            stall_timeout=1.5, retries=2, retry_delay=0.1,
                            echo=False)
    assert res.ok and res.attempts == 2 and res.stalled == 1


def test_watchdog_stall_kill_reaps_grandchildren(tmp_path):
    """A stall-kill must take down the child's own subprocesses too (the
    generic CLI runs arbitrary commands; an orphaned grandchild would keep
    holding the TPU and contend with the retry). The child spawns a silent
    grandchild that writes a marker if it survives past the kill."""
    import os
    import sys
    import time

    from clip_dplm_tpu.utils.watchdog import run_with_watchdog

    marker = tmp_path / "grandchild_survived"
    pid_file = tmp_path / "grandchild_pid"
    grandchild = (
        "import pathlib, time; time.sleep(4); "
        f"pathlib.Path({str(marker)!r}).touch()"
    )
    prog = (
        "import pathlib, subprocess, sys, time\n"
        f"p = subprocess.Popen([sys.executable, '-S', '-c', {grandchild!r}])\n"
        f"pathlib.Path({str(pid_file)!r}).write_text(str(p.pid))\n"
        "time.sleep(600)\n"  # silent hang with the grandchild alive
    )
    res = run_with_watchdog([sys.executable, "-S", "-c", prog],
                            stall_timeout=1.5, retries=0, retry_delay=0.1,
                            echo=False)
    assert res.returncode != 0 and res.stalled == 1
    # give a surviving grandchild time to reach its marker write
    deadline = time.monotonic() + 5.0
    gc_pid = int(pid_file.read_text())
    while time.monotonic() < deadline:
        try:
            os.kill(gc_pid, 0)  # still alive?
        except ProcessLookupError:
            break
        time.sleep(0.1)
    assert not marker.exists(), "grandchild survived the stall-kill"


def test_watchdog_carriage_return_redraws_count_as_liveness():
    """\\r-style progress redraws never complete a line; the chunk-based
    pump must still stamp the activity clock (a line-based reader would
    kill an actively-working child as 'silent')."""
    import sys

    from clip_dplm_tpu.utils.watchdog import run_with_watchdog

    prog = (
        "import sys, time\n"
        "for i in range(8):\n"
        "    sys.stdout.write('\\rprogress %d' % i)\n"
        "    sys.stdout.flush()\n"
        "    time.sleep(0.4)\n"
        "sys.stdout.write('\\n')\n"
    )
    # total runtime ~3.2 s with no newline until the end; stall_timeout
    # 1.5 s would kill it if redraws didn't count as output
    res = run_with_watchdog([sys.executable, "-S", "-c", prog],
                            stall_timeout=1.5, retries=0, echo=False)
    assert res.ok and res.stalled == 0


def test_watchdog_payload_then_hang_is_success():
    """Once the success_pattern line is delivered the attempt is a success
    even if the child then hangs (the axon tunnel can hang in jax teardown
    AFTER bench.py printed its JSON line) — no retry is burned."""
    import sys

    from clip_dplm_tpu.utils.watchdog import run_with_watchdog

    prog = (
        "import time\n"
        "print('{\"metric\": \"x\", \"value\": 1}', flush=True)\n"
        "time.sleep(600)\n"  # teardown hang
    )
    res = run_with_watchdog([sys.executable, "-S", "-c", prog],
                            stall_timeout=1.5, retries=2, retry_delay=0.1,
                            echo=False, success_pattern=r'^\{"metric"')
    assert res.ok and res.attempts == 1
    assert res.payload is not None and '"value": 1' in res.payload


def test_watchdog_payload_grace_reaps_hung_child_quickly():
    """With payload_grace, a child that hangs after delivering the payload
    is killed ~grace seconds after the match — not after a full stall
    window — and the grace kill is not counted as a stall."""
    import sys
    import time as _time

    from clip_dplm_tpu.utils.watchdog import run_with_watchdog

    prog = (
        "import time\n"
        "print('{\"metric\": \"x\", \"value\": 1}', flush=True)\n"
        "time.sleep(600)\n"  # teardown hang
    )
    t0 = _time.monotonic()
    res = run_with_watchdog([sys.executable, "-S", "-c", prog],
                            stall_timeout=60, retries=0, echo=False,
                            success_pattern=r'^\{"metric"',
                            payload_grace=1.0)
    elapsed = _time.monotonic() - t0
    assert res.ok and res.payload is not None
    assert res.stalled == 0  # grace reap, not a stall
    assert elapsed < 15, f"grace reap took {elapsed:.1f}s"


def test_watchdog_payload_no_newline_then_exit_nonzero_is_success():
    """The payload counts at EOF even without a trailing newline, and a
    non-zero exit AFTER the payload does not mask the delivered contract."""
    import sys

    from clip_dplm_tpu.utils.watchdog import run_with_watchdog

    prog = (
        "import sys\n"
        "sys.stdout.write('{\"metric\": \"y\"}')\n"
        "sys.stdout.flush()\n"
        "sys.exit(7)\n"
    )
    res = run_with_watchdog([sys.executable, "-S", "-c", prog],
                            stall_timeout=30, echo=False,
                            success_pattern=r'^\{"metric"')
    assert res.ok and res.payload == '{"metric": "y"}'


def test_watchdog_split_streams_keep_stdout_clean(capsys):
    """stderr_to_stdout=False: the child's stdout payload (e.g. bench.py's
    JSON line) passes through alone; progress markers stay on stderr. Both
    streams feed the activity clock."""
    import sys

    from clip_dplm_tpu.utils.watchdog import run_with_watchdog

    prog = (
        "import sys\n"
        "print('marker', file=sys.stderr)\n"
        "print('{\"payload\": 1}')\n"
    )
    res = run_with_watchdog([sys.executable, "-S", "-c", prog],
                            stall_timeout=30, echo=True,
                            stderr_to_stdout=False)
    out, err = capsys.readouterr()
    assert res.ok
    assert out.strip() == '{"payload": 1}'
    assert "marker" in err
