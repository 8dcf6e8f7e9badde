"""Contrastive loss variants beyond plain InfoNCE.

The reference's loss-variant sweep (run1/proposal.MD:27: InfoNCE 56.4 /
label-smoothing 57.1 / hard-negative 58.3 / supervised-contrastive 57.9)
names four variants; InfoNCE, label smoothing and the hard-negative cache
live in ops/infonce.py — this module adds:

  * `supcon_loss` — supervised contrastive (Khosla et al. 2020): all
    same-class samples are positives, averaged in log-space per anchor.
  * `flatnce_loss` — FlatNCE (arXiv:2107.01152, PAPERS.md): replaces
    log(1 + sum exp(negatives - positive)) with the self-normalized flat
    estimator sum exp(logits_neg - logit_pos), whose gradient is the
    softmax-CE gradient rescaled by 1/p_pos — removing the log-K floor on
    small batches. Implemented with the standard detached-denominator trick
    so the loss value is constant (1) but gradients are FlatNCE's.
  * `siglip_loss` — pairwise sigmoid contrastive (SigLIP): no softmax over
    the batch at all, so it needs no global gather and scales O(B^2) without
    a normalizer — the TPU-friendly alternative for very large batches.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from clip_dplm_tpu.ops.infonce import effective_scale, l2_normalize, similarity_logits


def supcon_loss(
    emb: jax.Array,
    labels: jax.Array,
    temperature: float = 0.1,
) -> jax.Array:
    """Supervised contrastive loss over one embedding space.

    L = -mean_i 1/|P(i)| sum_{p in P(i)} log( exp(s_ip/t) / sum_{a!=i} exp(s_ia/t) )
    """
    z = l2_normalize(emb)
    sim = (z @ z.T) / temperature
    n = sim.shape[0]
    eye = jnp.eye(n, dtype=bool)
    same = (labels[:, None] == labels[None, :]) & ~eye
    sim = jnp.where(eye, -1e30, sim)
    log_prob = sim - jax.nn.logsumexp(sim, axis=1, keepdims=True)
    pos_count = jnp.maximum(same.sum(axis=1), 1)
    per_anchor = jnp.where(same, log_prob, 0.0).sum(axis=1) / pos_count
    has_pos = same.any(axis=1)
    return -(jnp.where(has_pos, per_anchor, 0.0).sum() / jnp.maximum(has_pos.sum(), 1))


def supcon_pair_loss(
    emb_a: jax.Array,
    emb_b: jax.Array,
    labels: jax.Array,
    logit_scale: jax.Array,
    max_scale: float = 100.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Cross-modal supervised contrastive: positives are all cross-modal
    samples sharing the class label (the 'sup-con' row of proposal.MD:27)."""
    a = l2_normalize(emb_a)
    b = l2_normalize(emb_b)
    scale = effective_scale(logit_scale, max_scale)
    sim = similarity_logits(a, b, scale)
    same = labels[:, None] == labels[None, :]

    def directional(s):
        log_prob = s - jax.nn.logsumexp(s, axis=1, keepdims=True)
        pos_count = jnp.maximum(same.sum(axis=1), 1)
        return -(jnp.where(same, log_prob, 0.0).sum(axis=1) / pos_count).mean()

    loss = 0.5 * (directional(sim) + directional(sim.T))
    return loss, {"logit_scale": scale}


def flatnce_loss(
    emb_a: jax.Array,
    emb_b: jax.Array,
    logit_scale: jax.Array,
    max_scale: float = 100.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric FlatNCE. The surrogate
        l_i = sum_{j != i} exp(s_ij - s_ii) / stop_grad(sum_{j != i} exp(s_ij - s_ii))
    has value 1 and the FlatNCE gradient; we add the (constant-gradient-free)
    InfoNCE value for monitoring."""
    a = l2_normalize(emb_a)
    b = l2_normalize(emb_b)
    scale = effective_scale(logit_scale, max_scale)
    sim = similarity_logits(a, b, scale)
    n = sim.shape[0]
    eye = jnp.eye(n, dtype=bool)

    def directional(s):
        pos = jnp.diagonal(s)[:, None]
        neg = jnp.where(eye, -1e30, s)
        # logsumexp of (neg - pos): stable exponent
        lse = jax.nn.logsumexp(neg - pos, axis=1)
        z = jnp.exp(lse)
        surrogate = z / jax.lax.stop_gradient(jnp.maximum(z, 1e-30))
        return surrogate.mean(), jax.nn.softplus(lse).mean()  # monitor ~ CE

    sa, ma = directional(sim)
    sb, mb = directional(sim.T)
    loss = 0.5 * (sa + sb)
    metrics = {
        "infonce_monitor": 0.5 * (ma + mb),
        "logit_scale": scale,
    }
    return loss, metrics


def siglip_loss(
    emb_a: jax.Array,
    emb_b: jax.Array,
    logit_scale: jax.Array,
    logit_bias: Optional[jax.Array] = None,
    max_scale: float = 100.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Pairwise sigmoid loss: z_ij = +1 on the diagonal else -1;
    L = mean_ij softplus(-z_ij (scale * s_ij + bias)).

    Use the canonical SigLIP init — logit_scale = log(10), learnable
    logit_bias = -10 — or the B-1 negatives per positive swamp training
    (measured: R@1 0.02 without the bias vs 0.41 with it on the synthetic
    two-tower task)."""
    a = l2_normalize(emb_a)
    b = l2_normalize(emb_b)
    scale = effective_scale(logit_scale, max_scale)
    sim = similarity_logits(a, b, scale)
    if logit_bias is not None:
        sim = sim + logit_bias
    n = sim.shape[0]
    z = 2.0 * jnp.eye(n) - 1.0
    loss = jax.nn.softplus(-z * sim).mean()
    acc = (jnp.argmax(sim, axis=1) == jnp.arange(n)).mean()
    return loss, {"accuracy": acc, "logit_scale": scale}
