"""Docs stay truthful: generated references must match the checked-in files,
and handwritten docs must not reference modules/knobs that no longer exist."""

from __future__ import annotations

import importlib.util
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name: str):
    path = os.path.join(REPO, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod  # @dataclass in the script needs this registered
    spec.loader.exec_module(mod)
    return mod


def test_config_reference_up_to_date():
    gen = _load_script("gen_config_docs")
    with open(os.path.join(REPO, "docs", "configuration.md")) as f:
        current = f.read()
    assert current == gen.render(gen.parse_config_classes()), (
        "docs/configuration.md is stale — run scripts/gen_config_docs.py"
    )


def test_config_reference_covers_all_dataclasses():
    gen = _load_script("gen_config_docs")
    import clip_dplm_tpu.config as cfg_mod

    documented = {c.name for c in gen.parse_config_classes()}
    registered = set(cfg_mod._DATACLASS_REGISTRY)
    assert registered <= documented, registered - documented


def test_docs_reference_real_modules():
    """Every `clip_dplm_tpu/<path>.py` mentioned in docs/ must exist."""
    docs_dir = os.path.join(REPO, "docs")
    pat = re.compile(r"clip_dplm_tpu/[\w/]+\.py")
    missing = []
    for name in os.listdir(docs_dir):
        if not name.endswith(".md"):
            continue
        with open(os.path.join(docs_dir, name)) as f:
            text = f.read()
        for ref in set(pat.findall(text)):
            if not os.path.exists(os.path.join(REPO, ref)):
                missing.append(f"{name}: {ref}")
    assert not missing, missing


def test_docs_env_knobs_exist_in_code():
    """Every CLIP_DPLM_* knob named in docs/ must appear in the package."""
    docs_dir = os.path.join(REPO, "docs")
    pat = re.compile(r"CLIP_DPLM_[A-Z0-9_]+")
    doc_knobs = set()
    for name in os.listdir(docs_dir):
        if name.endswith(".md"):
            with open(os.path.join(docs_dir, name)) as f:
                doc_knobs |= set(pat.findall(f.read()))
    out = subprocess.run(
        ["grep", "-rho", r"CLIP_DPLM_[A-Z0-9_]*", os.path.join(REPO, "clip_dplm_tpu"),
         os.path.join(REPO, "bench.py")],
        capture_output=True, text=True,
    )
    code_knobs = set(out.stdout.split())
    unknown = doc_knobs - code_knobs
    assert not unknown, f"docs name knobs the code does not read: {unknown}"
