"""Self-contained pretrained bundles: config + params in one directory.

Capability match for the reference's HF `PreTrainedModel` wrappers
(old/clip.py:112-134 `RNAProteinCLIP`/`DiffMapProteinCLIP` expose
`config_class=HybridCLIPConfig` so models round-trip with
save_pretrained/from_pretrained). Here a bundle is a directory with
`config.yaml` (the full Config tree + the experiment name) and
`params.npz` (flattened param leaves) — loadable with zero pickle and no
framework state, unlike the Orbax train-state checkpoints (which carry
optimizer/rng for exact resume).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

from clip_dplm_tpu.config import Config, load_config, save_config

_SEP = "::"


def _flatten(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_pretrained(directory: str, cfg: Config, params: Dict[str, Any]) -> None:
    os.makedirs(directory, exist_ok=True)
    save_config(cfg, os.path.join(directory, "config.yaml"))
    np.savez_compressed(os.path.join(directory, "params.npz"), **_flatten(params))


def load_pretrained(directory: str) -> Tuple[Config, Any, Dict[str, Any]]:
    """Returns (config, model, params) — the model is built from
    cfg.experiment via the registry, ready for `model.apply({"params": params}, ...)`."""
    from clip_dplm_tpu.experiments.registry import build_model

    cfg = load_config(os.path.join(directory, "config.yaml"))
    z = np.load(os.path.join(directory, "params.npz"))
    params = _unflatten({k: z[k] for k in z.files})
    model = build_model(cfg)
    return cfg, model, params
