"""The examples/ walkthroughs must stay runnable — each executes end-to-end
in a subprocess on CPU (slow-marked; the scripts self-assert their results)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    ("01_two_tower.py", ["--platform", "cpu"]),
    ("02_flagship_rna_rbp.py", ["--platform", "cpu"]),
    ("03_dplm_generate.py", ["--platform", "cpu"]),
    ("04_multichip.py", []),  # forces its own 8-device CPU mesh
    ("05_convert_esm.py", ["--platform", "cpu"]),
]


@pytest.mark.slow
@pytest.mark.parametrize("script,args", EXAMPLES, ids=[e[0] for e in EXAMPLES])
def test_example_runs(script, args):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # examples set their own device counts
    env["JAX_PLATFORMS"] = "cpu"    # never touch the real TPU from CI
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-3000:]}"
