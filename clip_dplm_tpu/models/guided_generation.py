"""CLIP-guided protein generation — the full north-star pipeline.

Ties the pieces together (BASELINE.json config 5): a trained contrastive
model provides the score s(x) = <f_protein(x), c> between a generated protein
and a conditioning embedding c (an RNA motif / cell state / perturbation
embedding from the other tower), and the DPLM sampler is steered by it:

  * hard guidance: best-of-K reranking (dplm.clip_guided_sample)
  * soft guidance: per-step logit bias from the score of single-token
    substitutions is intractable; instead we expose temperature + rerank and
    a caller logit_bias_fn hook.

`make_clip_scorer` builds the score function from an ESM tower + projection
head (the protein side of ESMProteinCLIP) so generated token ids are scored
without leaving the device or breaking the scan's static shapes.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from clip_dplm_tpu.models.dplm import DPLM, clip_guided_sample
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
) -> Tuple[jax.Array, jax.Array]:
    """End-to-end: sample K candidate chains from the DPLM, embed each with
    the CLIP protein tower, return the candidates best aligned with the
    conditioning embedding. Returns (tokens (B, length+2), clip scores (B,))."""
    score_fn = make_clip_scorer(protein_encode_fn, condition_embedding)
    return clip_guided_sample(
        dplm, dplm_params, key, score_fn,
        batch_size=batch_size, length=length,
        num_candidates=num_candidates, num_steps=num_steps,
        temperature=temperature,
    )
