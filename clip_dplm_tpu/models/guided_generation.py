"""CLIP-guided protein generation — the full north-star pipeline.

Ties the pieces together (BASELINE.json config 5): a trained contrastive
model provides the score s(x) = <f_protein(x), c> between a generated protein
and a conditioning embedding c (an RNA motif / cell state / perturbation
embedding from the other tower), and the DPLM sampler is steered by it:

  * hard guidance: best-of-K reranking (dplm.clip_guided_sample)
  * soft guidance: per-step logit bias = the exact gradient of the RELAXED
    CLIP score w.r.t. the sampler's logits (make_soft_logit_bias_fn). Masked
    positions are represented by their softmax distribution; the protein
    tower consumes probs @ embedding_table (ESMTower token_probs path), so
    the relaxation is differentiable end-to-end and one ascent step per
    denoising iteration steers the chain (plug-and-play guidance).

`make_clip_scorer` builds the score function from an ESM tower + projection
head (the protein side of ESMProteinCLIP) so generated token ids are scored
without leaving the device or breaking the scan's static shapes.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from clip_dplm_tpu.models.dplm import DPLM, MASK_IDX, clip_guided_sample
from clip_dplm_tpu.ops.infonce import l2_normalize


def make_clip_scorer(
    protein_encode_fn: Callable[[jax.Array, jax.Array], jax.Array],
    condition_embedding: jax.Array,
) -> Callable[[jax.Array], jax.Array]:
    """Build score_fn(tokens) = cosine(f_protein(tokens), condition).

    protein_encode_fn: (tokens, mask) -> (B, d) projected protein embeddings
    (e.g. ESMProteinCLIP's esm tower + protein projection, applied with bound
    params). condition_embedding: (B, d) or (d,) target embedding(s).
    """
    cond = l2_normalize(jnp.atleast_2d(condition_embedding))

    def score_fn(tokens: jax.Array) -> jax.Array:
        mask = tokens != 1  # PAD
        emb = l2_normalize(protein_encode_fn(tokens, mask))
        if cond.shape[0] == 1:
            return emb @ cond[0]
        return jnp.sum(emb * cond, axis=-1)

    return score_fn


def make_soft_logit_bias_fn(
    soft_score_fn: Callable[[jax.Array, jax.Array], jax.Array],
    guidance_scale: float = 1.0,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Per-step soft CLIP guidance (the north star's "gradient" clause).

    soft_score_fn(probs (B, S, V), tokens (B, S)) -> (B,) relaxed score of
    the soft sequence (e.g. cosine(f_protein(probs), condition) through the
    ESMTower token_probs path).

    Returns logit_bias_fn(tokens, logits) = guidance_scale * d score / d
    logits, where still-masked positions carry softmax(logits) and decided
    positions their one-hot — i.e. one exact gradient-ascent step on the
    relaxed objective per denoising iteration, biasing the proposal
    distribution toward high-CLIP-score sequences.
    """

    def logit_bias_fn(tokens: jax.Array, logits: jax.Array) -> jax.Array:
        V = logits.shape[-1]
        onehot = jax.nn.one_hot(tokens, V, dtype=jnp.float32)
        undecided = (tokens == MASK_IDX)[..., None]

        def total(lg):
            probs = jax.nn.softmax(lg, axis=-1)
            x = jnp.where(undecided, probs, onehot)
            return jnp.sum(soft_score_fn(x, tokens))

        g = jax.grad(total)(logits.astype(jnp.float32))
        return guidance_scale * g

    return logit_bias_fn


def make_soft_clip_scorer(
    soft_encode_fn: Callable[[jax.Array, jax.Array], jax.Array],
    condition_embedding: jax.Array,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Relaxed CLIP score for make_soft_logit_bias_fn.

    soft_encode_fn(probs, tokens) -> (B, d) projected protein embeddings from
    soft token distributions (ESMTower token_probs + projection, params
    bound by the caller)."""
    cond = l2_normalize(jnp.atleast_2d(condition_embedding))

    def soft_score_fn(probs: jax.Array, tokens: jax.Array) -> jax.Array:
        emb = l2_normalize(soft_encode_fn(probs, tokens))
        if cond.shape[0] == 1:
            return emb @ cond[0]
        return jnp.sum(emb * cond, axis=-1)

    return soft_score_fn


def generate_proteins_for_condition(
    dplm: DPLM,
    dplm_params,
    protein_encode_fn: Callable[[jax.Array, jax.Array], jax.Array],
    condition_embedding: jax.Array,
    key: jax.Array,
    length: int,
    batch_size: int = 1,
    num_candidates: Optional[int] = None,
    num_steps: Optional[int] = None,
    temperature: float = 1.0,
    soft_encode_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    guidance_scale: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """End-to-end: sample K candidate chains from the DPLM, embed each with
    the CLIP protein tower, return the candidates best aligned with the
    conditioning embedding. When `soft_encode_fn` is given, every chain is
    additionally steered per-step by the relaxed score gradient (soft
    guidance composes with reranking). Returns (tokens (B, length+2),
    clip scores (B,))."""
    score_fn = make_clip_scorer(protein_encode_fn, condition_embedding)
    logit_bias_fn = None
    if soft_encode_fn is not None:
        logit_bias_fn = make_soft_logit_bias_fn(
            make_soft_clip_scorer(soft_encode_fn, condition_embedding),
            guidance_scale=guidance_scale,
        )
    return clip_guided_sample(
        dplm, dplm_params, key, score_fn,
        batch_size=batch_size, length=length,
        num_candidates=num_candidates, num_steps=num_steps,
        temperature=temperature, logit_bias_fn=logit_bias_fn,
    )
