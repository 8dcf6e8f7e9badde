"""Three-way TF CLIP — cell state <-> perturbation <-> protein.

Capability match for `ContrastiveModel` (tf_clip_codes nb cell 41): three
encoders projected into one space, three pairwise scaled similarity matrices,
total loss = sum of three symmetric CEs against the diagonal.

Intent fixes vs the notebook (its pooling indexes `enc[:, 0]` on 2-D tensors,
which cannot run as written — one of several reference spec-vs-code gaps,
SURVEY.md section 2.5):
  * CellStateEncoder: the batch of cells is one sequence; cells with zero
    connectivity degree are masked out of attention (notebook's
    `connectivity.sum(-1) == 0` mask); cell i's embedding is its OWN output
    token, not token 0.
  * PerturbationEncoder: per-gene ESM projection + value embedding summed,
    transformer over the top-k DEG tokens, mean-pooled (the notebook's
    token-0 pooling would privilege an arbitrary gene).
  * ProteinEncoder: the 1280-d ESM vector is a single token through a
    transformer block stack.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from clip_dplm_tpu.config import Config
from clip_dplm_tpu.models.layers import OptimizedProjectionHead, TransformerBlock


class _Encoder(nn.Module):
    """Stack of transformer blocks + final LN (notebook TransformerEncoder)."""

    d_model: int
    num_layers: int = 3
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        for i in range(self.num_layers):
            x = TransformerBlock(
                d_model=self.d_model, num_heads=self.num_heads, ffn_mult=4,
                dropout=self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"block_{i}",
            )(x, mask, deterministic=deterministic)
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                            name="final_ln")(x)


class TFContrastiveModel(nn.Module):
    """cell <-> perturbation <-> protein three-tower CLIP."""

    cfg: Config
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        d = c.projection.dim
        enc = self.cfg.encoders
        self.cell_in = nn.Sequential([
            nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype),
            nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype),
            nn.gelu,
            nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype),
        ])
        self.cell_encoder = _Encoder(d_model=d, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.esm_projection = nn.Dense(d, dtype=self.dtype,
                                       param_dtype=self.param_dtype)
        self.value_encoder = nn.Dense(d, dtype=self.dtype,
                                      param_dtype=self.param_dtype)
        self.pert_encoder = _Encoder(d_model=d, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.protein_in = nn.Dense(d, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        self.protein_encoder = _Encoder(d_model=d, dtype=self.dtype,
                                        param_dtype=self.param_dtype)
        self.cell_projection = OptimizedProjectionHead(
            cfg=c.projection, dtype=self.dtype, param_dtype=self.param_dtype)
        self.pert_projection = OptimizedProjectionHead(
            cfg=c.projection, dtype=self.dtype, param_dtype=self.param_dtype)
        self.protein_projection = OptimizedProjectionHead(
            cfg=c.projection, dtype=self.dtype, param_dtype=self.param_dtype)
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(c.contrastive.logit_scale_init),
            (), jnp.float32,
        )

    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """batch keys:
        cell_state (B, gene_dim+1): expression + pseudotime column
        connectivity (B, B): dense neighbor graph over the batch
        gene_esm (B, T, esm_dim): per-top-DEG ESM embeddings
        gene_values (B, T): signed scaled DEG values
        protein_emb (B, protein_dim): TF protein ESM embedding
        """
        c = self.cfg

        # cell tower: batch-as-sequence with degree mask
        cell_tokens = self.cell_in(batch["cell_state"].astype(self.dtype))
        degree_mask = batch["connectivity"].sum(axis=-1) > 0  # (B,)
        cell_seq = self.cell_encoder(
            cell_tokens[None], degree_mask[None], deterministic=deterministic
        )[0]  # (B, d): token i = cell i

        # perturbation tower: top-k DEG tokens
        gene_tok = self.esm_projection(batch["gene_esm"].astype(self.dtype))
        val_tok = self.value_encoder(
            batch["gene_values"][..., None].astype(self.dtype))
        pert_seq = self.pert_encoder(
            gene_tok + val_tok, deterministic=deterministic)
        pert_pooled = pert_seq.mean(axis=1)

        # protein tower: one token per sample
        prot_tok = self.protein_in(batch["protein_emb"].astype(self.dtype))
        prot_seq = self.protein_encoder(
            prot_tok[:, None, :], deterministic=deterministic)[:, 0]

        out = {
            "cell_embed": self.cell_projection(
                cell_seq, deterministic=deterministic).astype(jnp.float32),
            "pert_embed": self.pert_projection(
                pert_pooled, deterministic=deterministic).astype(jnp.float32),
            "protein_embed": self.protein_projection(
                prot_seq, deterministic=deterministic).astype(jnp.float32),
            "logit_scale": self.logit_scale,
        }
        return out
