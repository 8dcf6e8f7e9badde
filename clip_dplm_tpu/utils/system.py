"""Memory telemetry + input-data validation.

Covers MemoryConfig.get_memory_status (triple_flow/1_config.py:218-247 —
CUDA allocator stats become jax device memory stats + remat knobs handled by
PrecisionConfig) and QualityControlConfig.validate_data
(triple_flow/1_config.py:185-216).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def get_memory_status() -> Dict[str, float]:
    """Per-device memory stats in GiB (TPU HBM / platform allocator)."""
    out: Dict[str, float] = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        gib = 1024 ** 3
        out[f"device{i}_bytes_in_use_gib"] = stats.get("bytes_in_use", 0) / gib
        out[f"device{i}_peak_bytes_gib"] = stats.get(
            "peak_bytes_in_use", stats.get("bytes_in_use", 0)
        ) / gib
        limit = stats.get("bytes_limit")
        if limit:
            out[f"device{i}_limit_gib"] = limit / gib
            out[f"device{i}_utilization"] = stats.get("bytes_in_use", 0) / limit
    return out


class DataValidationError(ValueError):
    pass


def validate_data(
    x: np.ndarray,
    name: str = "data",
    max_missing_fraction: float = 0.0,
    min_value: Optional[float] = None,
    max_value: Optional[float] = None,
    min_variance: float = 0.0,
) -> Dict[str, float]:
    """Input QC (QualityControlConfig.validate_data semantics): NaN/Inf
    fraction, value range, degenerate (zero-variance) features. Raises
    DataValidationError on violation; returns the computed stats."""
    x = np.asarray(x)
    finite = np.isfinite(x)
    missing = 1.0 - finite.mean()
    stats = {
        "missing_fraction": float(missing),
        "min": float(x[finite].min()) if finite.any() else float("nan"),
        "max": float(x[finite].max()) if finite.any() else float("nan"),
        "mean_variance": float(np.nanvar(np.where(finite, x, np.nan), axis=0).mean())
        if x.ndim == 2 else float(np.nanvar(x)),
    }
    if missing > max_missing_fraction:
        raise DataValidationError(
            f"{name}: {missing:.2%} non-finite values "
            f"(allowed {max_missing_fraction:.2%})"
        )
    if min_value is not None and stats["min"] < min_value:
        raise DataValidationError(f"{name}: min {stats['min']} < {min_value}")
    if max_value is not None and stats["max"] > max_value:
        raise DataValidationError(f"{name}: max {stats['max']} > {max_value}")
    if x.ndim == 2 and min_variance > 0:
        dead = (np.var(x, axis=0) < min_variance).sum()
        stats["dead_features"] = float(dead)
        if dead == x.shape[1]:
            raise DataValidationError(f"{name}: all features below variance floor")
    return stats
