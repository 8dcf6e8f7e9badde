"""Segment ops for graph batching under XLA static shapes.

TPU-native replacement for `torch_scatter.scatter_mean`
(tong/models/layers/gnn.py:3,93; tong/models/encoders/cell_encoder.py:64) —
see SURVEY.md section 2.6 row 4. All ops take a validity mask so padded
nodes/edges (required for static shapes) contribute nothing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(
    data: jax.Array, segment_ids: jax.Array, num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    if mask is not None:
        data = jnp.where(mask[..., None] if data.ndim > mask.ndim else mask,
                         data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jax.Array, segment_ids: jax.Array, num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """scatter_mean semantics with masked padding."""
    total = segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones(data.shape[0], data.dtype) if mask is None else mask.astype(data.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return total / jnp.maximum(counts[:, None], 1.0)


def segment_softmax(
    scores: jax.Array, segment_ids: jax.Array, num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Numerically-stable softmax within segments (per-node edge attention)."""
    if mask is not None:
        scores = jnp.where(mask if scores.ndim == mask.ndim else mask[..., None],
                           scores, -1e30)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    scores = scores - seg_max[segment_ids]
    exp = jnp.exp(scores)
    if mask is not None:
        exp = jnp.where(mask if exp.ndim == mask.ndim else mask[..., None], exp, 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-30)
