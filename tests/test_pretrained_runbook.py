"""Real-pretrained-weights runbook (scripts/fetch_and_verify_pretrained.py):
the --offline-selftest path must keep every step of the runbook green
without egress — synthetic checkpoints written in the HF on-disk format
(save_pretrained) are loaded back with from_pretrained, converted with the
in-repo converters, gated on fp32 forward parity (<1e-4), and round-tripped
through the publish-back exporters bit-identically. After this, the only
step the real run adds is the download itself (tf nb cell 21,
old/encoders.py:15-31 use the published ESM-2/ProtT5 weights this image
cannot reach)."""

import importlib.util
import os
import sys

import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "fetch_and_verify_pretrained.py")


def _load_module():
    spec = importlib.util.spec_from_file_location("fetch_verify", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["fetch_verify"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_offline_selftest_all_gates_pass():
    mod = _load_module()
    out = mod.offline_selftest()
    for kind in ("esm", "prot_t5", "rnabert"):
        assert out[kind]["gate_fp32_lt_1e-4"] is True, out[kind]
        assert out[kind]["publish_back_bit_identical"] is True, out[kind]
        assert out[kind]["publish_back_keys"] > 0
    # the informational bf16-drift numeric the BASELINE gate cares about
    # must be recorded for the ESM tower
    assert "bf16_rel_drift" in out["esm"]
