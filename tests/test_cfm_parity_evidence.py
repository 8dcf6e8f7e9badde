"""OT-CFM convergence A/B evidence gates (VERDICT r4 item 4).

The A/B itself (scripts/torch_parity_ab_cfm.py: torch twin of
VectorFieldNet + exact-OT/SB matchers, matched init, 12 paired seeds) runs
offline; this test asserts the recorded evidence holds the stated gates so
a regression that invalidates the file is caught by CI."""

import json
import os

import pytest

_EVIDENCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "evidence", "parity_ab_cfm.json")


def test_cfm_parity_gates_hold():
    if not os.path.exists(_EVIDENCE):
        pytest.skip("evidence/parity_ab_cfm.json not yet produced")
    with open(_EVIDENCE) as f:
        ev = json.load(f)
    assert set(ev["arms"]) == {"exact_ot", "sb"}
    for arm, res in ev["arms"].items():
        for metric in ("paired_rel_delta_fm_loss",
                       "paired_rel_delta_sliced_w2"):
            st = res[metric]
            assert st["n"] >= 10, (arm, metric, st["n"])
            lo, hi = st["ci95"]
            assert st["gate_ci_inside_pm_5pct"], (arm, metric, st["ci95"])
            assert lo >= -0.05 and hi <= 0.05, (arm, metric, st["ci95"])
