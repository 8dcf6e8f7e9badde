"""DPLM — discrete-diffusion protein language model with CLIP-score guidance.

This is the north-star consumer of the CLIP embedding spaces (BASELINE.json
config 5). "DPLM" appears in the reference only as the repo name and a Colab
path (tf nb cell 24: .../tf-dplm/...) — no sampler exists there (SURVEY.md
one-paragraph summary); this is a from-scratch build:

  * trunk: ESM-2-style bidirectional blocks (models/esm.py EsmBlock — rotary,
    pre-LN, flash attention) + an LM head over the 33-token ESM alphabet.
  * training: absorbing-state (mask) discrete diffusion — sample a mask ratio
    t ~ U(0,1) per sequence, replace that fraction of residues with <mask>,
    predict the originals; CE on masked positions with the 1/t reweighting of
    RDM-style maskers.
  * sampling: a `lax.scan` denoising loop (the lax.scan sampler named by the
    north star): start fully masked, at each step predict logits, Gumbel
    sample, keep the highest-confidence fraction per a cosine unmasking
    schedule, re-mask the rest (MaskGIT/DPLM-style iterative unmasking) —
    static shapes, no data-dependent control flow.
  * guidance: `clip_guided_sample` runs K candidate chains — flattened into
    one K*B-row chain by default (all chain randomness is per-row, so this is
    distributionally exact and keeps every trunk dot in the well-emitted
    (rows, d) form instead of a vmap-added leading batch dim) — and reranks
    by a caller-provided CLIP score (similarity of the decoded protein's
    embedding to a conditioning embedding); per-step soft guidance can bias
    logits via `logit_bias_fn`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_dplm_tpu.config import DPLMConfig
from clip_dplm_tpu.models.esm import EsmBlock

MASK_IDX = 32
PAD_IDX = 1
CLS_IDX = 0
EOS_IDX = 2
# first/last real residue ids in the ESM alphabet (data/protein.py): L..C
RESIDUE_LO, RESIDUE_HI = 4, 23


from clip_dplm_tpu.models.esm import _CarryBlock, stack_esm_layers

# shared with ESMTower.scan_layers — same (layers/block, axis-0) layout
stack_dplm_layers = stack_esm_layers


class DPLM(nn.Module):
    """Bidirectional denoising trunk + LM head over token ids."""

    cfg: DPLMConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self, tokens: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """tokens (B, S) -> logits (B, S, vocab), fp32."""
        c = self.cfg
        B, S = tokens.shape
        if mask is None:
            mask = tokens != PAD_IDX
        h = nn.Embed(c.vocab_size, c.d_model, param_dtype=self.param_dtype,
                     name="embed_tokens")(tokens)
        h = jnp.where(mask[..., None], h, 0.0).astype(self.dtype)
        positions = jnp.arange(S)
        block = EsmBlock
        if self.remat:
            block = nn.remat(EsmBlock, static_argnums=())
        from clip_dplm_tpu.models.lora import spec_from
        lora = spec_from(c)
        blk_kw = dict(
            d_model=c.d_model, num_heads=c.num_heads,
            ln_eps=c.layer_norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
            lora=lora,
        )
        if c.scan_layers:
            # one compiled block, lax.scan over stacked layer params —
            # at 33+ layers the unrolled trunk costs minutes of XLA time
            scanned = nn.scan(
                _CarryBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=c.num_layers,
            )(block=block, kw=tuple(sorted(blk_kw.items())), name="layers")
            h, _ = scanned(h, mask, positions)
        else:
            for i in range(c.num_layers):
                h = block(**blk_kw, name=f"layer_{i}")(h, mask, positions)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="final_ln")(h)
        logits = nn.Dense(c.vocab_size, dtype=jnp.float32,
                          param_dtype=self.param_dtype, name="lm_head")(h)
        return logits


# ---------------------------------------------------------------------------
# training: absorbing-state diffusion loss
# ---------------------------------------------------------------------------


def corrupt(
    key: jax.Array, tokens: jax.Array, valid: jax.Array,
    t: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Mask a t-fraction of valid residue positions with <mask>.

    Returns (corrupted tokens, corruption mask, t). Special tokens
    (cls/eos/pad) are never corrupted.
    """
    k_t, k_mask = jax.random.split(key)
    B, S = tokens.shape
    if t is None:
        # avoid t == 0 (nothing to learn) and keep 1/t bounded
        t = jax.random.uniform(k_t, (B,), minval=0.05, maxval=1.0)
    corruptible = valid & (tokens != CLS_IDX) & (tokens != EOS_IDX)
    u = jax.random.uniform(k_mask, (B, S))
    corrupted_pos = corruptible & (u < t[:, None])
    x_t = jnp.where(corrupted_pos, MASK_IDX, tokens)
    return x_t, corrupted_pos, t


def diffusion_loss(
    model: DPLM, params, key: jax.Array, tokens: jax.Array,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """RDM-weighted masked-token CE: E_t [ (1/t) * CE(masked positions) ]."""
    return diffusion_loss_from_apply(model.apply, params, key, tokens, valid)


def diffusion_loss_from_apply(
    apply_fn, params, key: jax.Array, tokens: jax.Array,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """diffusion_loss over a flax apply_fn (the Trainer holds apply_fn, not
    the module)."""
    if valid is None:
        valid = tokens != PAD_IDX
    x_t, corrupted, t = corrupt(key, tokens, valid)
    logits = apply_fn({"params": params}, x_t, valid)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    per_seq = jnp.sum(jnp.where(corrupted, -tok_logp, 0.0), axis=-1)
    n_corrupted = jnp.maximum(corrupted.sum(axis=-1), 1)
    # 1/t reweighting, normalized per corrupted token
    loss = jnp.mean(per_seq / n_corrupted / t)
    acc = jnp.sum(
        jnp.where(corrupted, jnp.argmax(logits, -1) == tokens, False)
    ) / jnp.maximum(corrupted.sum(), 1)
    return loss, {"denoise_accuracy": acc, "mean_t": t.mean()}


# ---------------------------------------------------------------------------
# sampling: lax.scan iterative unmasking
# ---------------------------------------------------------------------------


def _cosine_keep_schedule(step: jax.Array, num_steps: int) -> jax.Array:
    """Fraction of positions still masked after `step` (cosine, MaskGIT)."""
    ratio = (step + 1.0) / num_steps
    return jnp.cos(0.5 * jnp.pi * ratio)


def sample(
    model: DPLM,
    params,
    key: jax.Array,
    batch_size: int,
    length: int,
    num_steps: Optional[int] = None,
    temperature: float = 1.0,
    logit_bias_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    lengths: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Generate (B, length+2) token sequences ([cls] residues [eos]).

    Each scan step: predict logits at masked positions, Gumbel-sample
    residues, then re-mask everything except the top-confidence fraction
    given by the cosine schedule. `logit_bias_fn(tokens, logits) -> bias`
    lets a guidance model steer each step (soft CLIP guidance).

    `lengths` (optional, (B,) int): per-sequence residue counts for
    mixed-length batches — `length` then acts as the padded maximum and
    row i generates lengths[i] residues at positions 1..lengths[i], with
    <eos> at lengths[i]+1 and <pad> beyond (one compiled program serves
    every length mix at this padded shape — the serving path's batcher
    relies on this). Returns (tokens, per-position logprob of the final
    choice).
    """
    cfg = model.cfg
    num_steps = num_steps or cfg.num_diffusion_steps
    S = length + 2
    pos = jnp.arange(S)[None, :]
    if lengths is None:
        lengths = jnp.full((batch_size,), length, jnp.int32)
    else:
        lengths = jnp.asarray(lengths, jnp.int32)
        if lengths.shape != (batch_size,):
            raise ValueError(f"lengths must be shape ({batch_size},), "
                             f"got {lengths.shape}")
        # clamp to the padded maximum: lengths[i] > length would place the
        # <eos> beyond the last position and the row would come back with
        # residues where the eos/pad region should be
        lengths = jnp.clip(lengths, 1, length)
    eos_pos = (lengths + 1)[:, None]
    gen_region = (pos >= 1) & (pos < eos_pos)
    valid = pos <= eos_pos

    init_tokens = jnp.where(
        pos == 0, CLS_IDX,
        jnp.where(pos == eos_pos, EOS_IDX,
                  jnp.where(gen_region, MASK_IDX, PAD_IDX)),
    ).astype(jnp.int32)

    # only real residues are sampleable
    vocab_bias = jnp.full((cfg.vocab_size,), -1e30, jnp.float32)
    vocab_bias = vocab_bias.at[RESIDUE_LO : RESIDUE_HI + 1].set(0.0)

    def step_fn(carry, step):
        tokens, confidence, k = carry
        k, k_gumbel, k_noise = jax.random.split(k, 3)
        logits = model.apply({"params": params}, tokens, valid)
        logits = logits + vocab_bias[None, None, :]
        if logit_bias_fn is not None:
            logits = logits + logit_bias_fn(tokens, logits)
        logp = jax.nn.log_softmax(logits / jnp.maximum(temperature, 1e-6), -1)
        gumbel = jax.random.gumbel(k_gumbel, logp.shape)
        # exact Gumbel-max draw from softmax(logits / t): the gumbel noise is
        # NOT rescaled by t (that would sample at effective temperature t^2)
        proposal = jnp.argmax(logp + gumbel, axis=-1)
        prop_logp = jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), proposal[..., None], -1
        )[..., 0]

        still_masked = tokens == MASK_IDX
        new_tokens = jnp.where(still_masked & gen_region, proposal, tokens)
        new_conf = jnp.where(still_masked & gen_region, prop_logp, confidence)

        # re-mask the lowest-confidence fraction per the schedule
        keep_ratio = _cosine_keep_schedule(step.astype(jnp.float32), num_steps)
        n_gen = gen_region.sum(axis=-1)
        n_remask = jnp.floor(keep_ratio * n_gen.astype(jnp.float32)).astype(jnp.int32)
        # annealed Gumbel tie-breaking on confidences (MaskGIT choice_temperature)
        noisy_conf = new_conf + 0.1 * keep_ratio * jax.random.gumbel(
            k_noise, new_conf.shape
        )
        noisy_conf = jnp.where(gen_region, noisy_conf, jnp.inf)
        order = jnp.argsort(noisy_conf, axis=-1)  # ascending: worst first
        ranks = jnp.argsort(order, axis=-1)
        remask = (ranks < n_remask[:, None]) & gen_region
        is_last = step == num_steps - 1
        remask = jnp.where(is_last, False, remask)
        out_tokens = jnp.where(remask, MASK_IDX, new_tokens)
        out_conf = jnp.where(remask, -jnp.inf, new_conf)
        return (out_tokens, out_conf, k), None

    init = (init_tokens, jnp.full((batch_size, S), -jnp.inf), key)
    (tokens, confidence, _), _ = jax.lax.scan(
        step_fn, init, jnp.arange(num_steps)
    )
    return tokens, confidence


def init_dplm_from_esm(esm_params, dplm_params, tie_lm_head: bool = True):
    """Warm-start the DPLM trunk from (converted) ESM-2 weights.

    DPLM in the literature is an ESM-2 trunk fine-tuned as a diffusion
    denoiser; our trunk reuses EsmBlock, so ESMTower params (e.g. from
    models.esm.convert_esm_torch_params) drop straight in: embed_tokens,
    layer_i, final_ln. The LM head is tied to the token embedding
    (weight-tying) unless tie_lm_head=False, in which case it keeps its
    fresh init.
    """
    import numpy as np

    out = dict(dplm_params)
    for key in esm_params:
        if key in out and key != "final_ln":
            out[key] = esm_params[key]
    if "final_ln" in esm_params and "final_ln" in out:
        out["final_ln"] = esm_params["final_ln"]
    if tie_lm_head and "lm_head" in out:
        emb = np.asarray(esm_params["embed_tokens"]["embedding"])
        out["lm_head"] = {
            "kernel": jnp.asarray(emb.T),
            "bias": jnp.zeros((emb.shape[0],), jnp.float32),
        }
    return out


def clip_guided_sample(
    model: DPLM,
    params,
    key: jax.Array,
    score_fn: Callable[[jax.Array], jax.Array],
    batch_size: int,
    length: int,
    num_candidates: Optional[int] = None,
    num_steps: Optional[int] = None,
    temperature: float = 1.0,
    logit_bias_fn: Optional[Callable] = None,
    lengths: Optional[jax.Array] = None,
    flatten_chains: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Best-of-K CLIP-guided sampling.

    Runs K independent denoising chains and keeps, per output slot, the
    candidate maximizing `score_fn(tokens)` — the contrastive-head CLIP
    score against a conditioning embedding. Returns
    (tokens (B, length+2), scores (B,)).

    `flatten_chains=True` (default) runs the K chains as ONE chain of
    K*batch_size rows instead of vmapping K B-row chains. Every source of
    randomness in `sample` is drawn i.i.d. per row (Gumbel proposal noise,
    confidence tie-break noise) and the re-mask schedule is per-row, so the
    two forms are identical in distribution (not bitwise: the flattened
    chain folds the K keys into one). The flattened form keeps each TRUNK
    dot in the (rows, S, d) @ (d, n) shape XLA emits well on TPU; the
    vmapped form adds a leading batch dim, which the ffn_out probe measured
    at 33.6% MXU vs 50.1% for the unbatched form at the sampler geometry
    (RESULTS.md round-4 ffn_out decomposition). `score_fn` and
    `logit_bias_fn` keep their (B, ...) contracts in both modes: under
    flattening they are vmapped over the K chain views, so per-row
    conditioning (cond shape (B, d)) works unchanged.
    """
    K = num_candidates or model.cfg.num_candidates

    if flatten_chains:
        lengths_f = None if lengths is None else jnp.tile(lengths, K)
        bias_f = None
        if logit_bias_fn is not None:
            def bias_f(tokens, logits):
                S_, V_ = logits.shape[-2], logits.shape[-1]
                bias = jax.vmap(logit_bias_fn)(
                    tokens.reshape(K, batch_size, S_),
                    logits.reshape(K, batch_size, S_, V_))
                # the contract allows broadcastable returns (e.g. (B, 1, V))
                bias = jnp.broadcast_to(bias, (K, batch_size, S_, V_))
                return bias.reshape(K * batch_size, S_, V_)
        toks, _ = sample(
            model, params, key, K * batch_size, length,
            num_steps=num_steps, temperature=temperature,
            logit_bias_fn=bias_f, lengths=lengths_f,
        )
        candidates = toks.reshape(K, batch_size, -1)  # (K, B, S)
        scores = jax.vmap(score_fn)(candidates)  # (K, B)
    else:
        keys = jax.random.split(key, K)

        def one_chain(k):
            toks, _ = sample(
                model, params, k, batch_size, length,
                num_steps=num_steps, temperature=temperature,
                logit_bias_fn=logit_bias_fn, lengths=lengths,
            )
            return toks

        candidates = jax.vmap(one_chain)(keys)  # (K, B, S)
        scores = jax.vmap(score_fn)(candidates)  # (K, B)
    best = jnp.argmax(scores, axis=0)  # (B,)
    B = batch_size
    picked = candidates[best, jnp.arange(B)]  # (B, S)
    return picked, scores[best, jnp.arange(B)]
