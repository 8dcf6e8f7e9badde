"""InfoNCE / CLIP contrastive loss — the framework's hot path.

Semantics (reference old/clip_opt.py:83-151, tong/utils/losses.py:4-19,
rna nb cell 28):
  L2-normalize both towers -> (all-gather over the mesh for the global batch)
  -> scaled B x B similarity -> symmetric cross-entropy vs the diagonal, with
  optional hard-negative cache columns appended to the a->b direction and
  optional label smoothing (the reference *built* smoothed labels at
  old/clip_opt.py:141-148 but fed hard labels to F.cross_entropy; we implement
  the intent and default smoothing to 0 for parity).

Two implementations:
  * `clip_loss` / `global_clip_loss` — pure-JAX (XLA-fused), the correctness
    reference and the multi-chip path (all_gather rides ICI inside shard_map).
  * ops/fused_infonce.py — the Pallas fused kernel (normalize + similarity +
    symmetric CE in one VMEM-resident pass with a custom VJP).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """F.normalize semantics, computed in fp32."""
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def similarity_logits(a: jax.Array, b: jax.Array, scale: jax.Array) -> jax.Array:
    """scale * a @ b.T with fp32 accumulation (the B x B hot matmul)."""
    return scale * jnp.einsum("id,jd->ij", a, b, preferred_element_type=jnp.float32)


def effective_scale(
    logit_scale: jax.Array, max_scale: float = 100.0
) -> jax.Array:
    """exp(logit_scale).clamp(max=100) — old/clip_opt.py:76; fp32 island."""
    return jnp.minimum(jnp.exp(logit_scale.astype(jnp.float32)), max_scale)


NEG_INF = -1e30


def _cross_entropy(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Per-row CE with optional label smoothing; fp32 logsumexp.

    Smoothing mass is spread over the VALID columns only: columns masked to
    -1e30 (the unfilled hard-negative cache tail) are excluded from both the
    class count and the logit sum, so cache + smoothing compose correctly.
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        valid = logits > 0.5 * NEG_INF
        n = jnp.sum(valid, axis=-1).astype(jnp.float32)
        smooth = label_smoothing / jnp.maximum(n - 1.0, 1.0)
        row_sum = jnp.sum(jnp.where(valid, logits, 0.0), axis=-1)
        # sum_j target_j * logit_j = (1-s)*logit_y + s/(n-1)*(sum_valid logit_j - logit_y)
        mean_term = smooth * (row_sum - label_logit)
        weighted = (1.0 - label_smoothing) * label_logit + mean_term
        return logz - weighted
    return logz - label_logit


def clip_loss(
    emb_a: jax.Array,
    emb_b: jax.Array,
    logit_scale: jax.Array,
    cache: Optional[jax.Array] = None,
    cache_len: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
    max_scale: float = 100.0,
    normalize: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Single-device symmetric InfoNCE.

    cache: (C, d) hard-negative embeddings appended as extra columns to the
    a->b direction only (old/clip_opt.py:85-100,130-151). `cache_len` masks
    the not-yet-filled tail of the ring buffer.
    Returns (scalar loss, metrics dict).
    """
    if normalize:
        emb_a = l2_normalize(emb_a)
        emb_b = l2_normalize(emb_b)
    scale = effective_scale(logit_scale, max_scale)
    sim = similarity_logits(emb_a, emb_b, scale)  # (B, B)
    B = sim.shape[0]
    labels = jnp.arange(B, dtype=jnp.int32)

    logits_a = sim
    if cache is not None:
        sim_cache = similarity_logits(emb_a, cache.astype(jnp.float32), scale)
        if cache_len is not None:
            col = jnp.arange(cache.shape[0])[None, :]
            sim_cache = jnp.where(col < cache_len, sim_cache, -1e30)
        logits_a = jnp.concatenate([sim, sim_cache], axis=1)

    loss_a = _cross_entropy(logits_a, labels, label_smoothing).mean()
    loss_b = _cross_entropy(sim.T, labels, label_smoothing).mean()
    loss = 0.5 * (loss_a + loss_b)

    acc_a = (jnp.argmax(logits_a, axis=-1) == labels).mean()
    acc_b = (jnp.argmax(sim.T, axis=-1) == labels).mean()
    metrics = {
        "loss_a": loss_a,
        "loss_b": loss_b,
        "accuracy_a": acc_a,
        "accuracy_b": acc_b,
        "accuracy": 0.5 * (acc_a + acc_b),
        "logit_scale": scale,
    }
    return loss, metrics


def global_clip_loss(
    emb_a: jax.Array,
    emb_b: jax.Array,
    logit_scale: jax.Array,
    axis_name: str,
    cache: Optional[jax.Array] = None,
    cache_len: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
    max_scale: float = 100.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Global-batch symmetric InfoNCE for use inside shard_map/pjit.

    Each device holds a local shard (b_l, d) of each tower. Both towers are
    all-gathered over `axis_name` (ICI) — old/clip_opt.py:102-112 semantics —
    then each device computes the CE for its *local rows* of both directions
    against the *global columns*; row sums are psum-reduced. This is exactly
    the global B_g x B_g symmetric CE without materializing the full matrix on
    one chip.
    """
    emb_a = l2_normalize(emb_a)
    emb_b = l2_normalize(emb_b)
    scale = effective_scale(logit_scale, max_scale)

    idx = jax.lax.axis_index(axis_name)
    b_local = emb_a.shape[0]
    offset = idx * b_local
    labels = offset + jnp.arange(b_local, dtype=jnp.int32)

    all_b = jax.lax.all_gather(emb_b, axis_name, tiled=True)  # (B_g, d)
    all_a = jax.lax.all_gather(emb_a, axis_name, tiled=True)
    B_g = all_b.shape[0]

    logits_a = similarity_logits(emb_a, all_b, scale)  # (b_l, B_g)
    if cache is not None:
        sim_cache = similarity_logits(emb_a, cache.astype(jnp.float32), scale)
        if cache_len is not None:
            col = jnp.arange(cache.shape[0])[None, :]
            sim_cache = jnp.where(col < cache_len, sim_cache, -1e30)
        logits_a = jnp.concatenate([logits_a, sim_cache], axis=1)
    logits_b = similarity_logits(emb_b, all_a, scale)  # (b_l, B_g)

    sum_a = _cross_entropy(logits_a, labels, label_smoothing).sum()
    sum_b = _cross_entropy(logits_b, labels, label_smoothing).sum()
    loss = (jax.lax.psum(sum_a, axis_name) + jax.lax.psum(sum_b, axis_name)) / (
        2.0 * B_g
    )

    hits_a = jnp.sum(jnp.argmax(logits_a, axis=-1) == labels)
    hits_b = jnp.sum(jnp.argmax(logits_b, axis=-1) == labels)
    acc_a = jax.lax.psum(hits_a, axis_name) / B_g
    acc_b = jax.lax.psum(hits_b, axis_name) / B_g
    metrics = {
        "loss_a": jax.lax.psum(sum_a, axis_name) / B_g,
        "loss_b": jax.lax.psum(sum_b, axis_name) / B_g,
        "accuracy_a": acc_a,
        "accuracy_b": acc_b,
        "accuracy": 0.5 * (acc_a + acc_b),
        "logit_scale": scale,
    }
    return loss, metrics


def multiway_clip_loss(
    embeddings: Dict[str, jax.Array],
    logit_scale: jax.Array,
    pairs: Optional[Tuple[Tuple[str, str], ...]] = None,
    max_scale: float = 100.0,
    label_smoothing: float = 0.0,
    weights: Optional[Dict[Tuple[str, str], float]] = None,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sum of pairwise symmetric InfoNCE over modality pairs.

    Semantics of the 3-way TF loss (tf nb cell 41: cell<->pert + cell<->protein
    + pert<->protein, each symmetric CE, total = sum) and of
    tong/utils/losses.py:34-54 (all present modality pairs). Pairs default to
    all unordered pairs of the given embeddings, skipping missing modalities
    exactly as the reference does.

    `axis_name` (inside shard_map/pjit) switches every pair to the
    global-batch formulation: embeddings are all-gathered over the mesh axis
    before each B_g x B_g similarity — the reference gathers for *every* CLIP
    variant (old/clip_opt.py:102-112), so the 3-way loss must too.
    """
    names = list(embeddings.keys())
    if pairs is None:
        pairs = tuple(
            (names[i], names[j])
            for i in range(len(names))
            for j in range(i + 1, len(names))
        )
    total = jnp.zeros(())
    metrics: Dict[str, jax.Array] = {}
    for a_name, b_name in pairs:
        if a_name not in embeddings or b_name not in embeddings:
            continue
        if axis_name is not None:
            loss, m = global_clip_loss(
                embeddings[a_name], embeddings[b_name], logit_scale,
                axis_name=axis_name,
                label_smoothing=label_smoothing, max_scale=max_scale,
            )
        else:
            loss, m = clip_loss(
                embeddings[a_name], embeddings[b_name], logit_scale,
                label_smoothing=label_smoothing, max_scale=max_scale,
            )
        w = 1.0 if weights is None else weights.get((a_name, b_name), 1.0)
        total = total + w * loss
        metrics[f"loss_{a_name}_{b_name}"] = loss
        metrics[f"accuracy_{a_name}_{b_name}"] = m["accuracy"]
    return total, metrics


def update_cache(
    cache: jax.Array, ptr: jax.Array, new: jax.Array, filled: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Functional circular hard-negative cache (old/clip_opt.py:76-81).

    Reference semantics: if ptr + B would overflow, reset ptr to 0 first; then
    write B rows and advance ptr modulo cache size. Returns
    (new_cache, new_ptr, new_filled). Unlike the reference (which sliced
    `cache[:ptr]` and thus *emptied* its negatives every wraparound), `filled`
    is a true high-water mark so the cache keeps its negatives once warm.
    """
    C = cache.shape[0]
    B = new.shape[0]
    if filled is None:
        filled = ptr
    ptr = jnp.where(ptr + B > C, 0, ptr)
    cache = jax.lax.dynamic_update_slice(
        cache, jax.lax.stop_gradient(new.astype(cache.dtype)), (ptr, jnp.int32(0))
    )
    end = ptr + B
    new_ptr = end % C
    new_filled = jnp.maximum(filled, end)
    return cache, new_ptr, new_filled
