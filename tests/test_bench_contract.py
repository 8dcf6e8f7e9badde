"""bench.py contract smoke tests.

The driver scores every round by running `python bench.py` and parsing ONE
stdout JSON line; a regression that breaks bench.py (import error, config
drift, non-JSON noise on stdout) silently zeroes the round's recorded
benchmark. These tests run the real script as a subprocess on CPU with tiny
shapes and assert the machine-read contract, for both tracked benchmarks.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _run_bench(extra_env):
    env = dict(os.environ)
    env.update(
        {
            # the env var alone is NOT enough: the sitecustomize preload
            # registers the axon backend before bench.py runs and the child
            # keeps the tpu backend regardless of JAX_PLATFORMS (measured,
            # r5) — these tests then silently depended on a healthy TPU
            # tunnel. BENCH_FORCE_PLATFORM makes bench.py apply the
            # in-process config override (the only mechanism that works).
            "JAX_PLATFORMS": "cpu",
            "BENCH_FORCE_PLATFORM": "cpu",
            "BENCH_NO_WATCHDOG": "1",
            "BENCH_ITERS": "2",
        }
    )
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # stdout is a machine-read contract: exactly one line, valid JSON
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {lines!r}"
    payload = json.loads(lines[0])
    # the driver reads the four original keys; the self-certifying extras
    # (r5) ride alongside so the number stands alone without BASELINE.md
    assert set(payload) >= {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 0
    assert payload["mfu"] > 0
    assert payload["model_tflops_per_s_per_chip"] > 0
    assert "BASELINE.md" in payload["certificate"]
    return payload


@pytest.mark.slow
def test_bench_two_tower_contract():
    payload = _run_bench({"BENCH_B": "64"})
    assert payload["metric"] == "contrastive_pairs_per_sec_per_chip"
    assert payload["unit"] == "pairs/s/chip"


@pytest.mark.slow
def test_bench_flagship_contract():
    payload = _run_bench({"BENCH_MODEL": "rna_rbp", "BENCH_B": "8"})
    assert payload["metric"] == "rna_rbp_pairs_per_sec_per_chip"
    assert payload["unit"] == "pairs/s/chip"
