"""Protein / gene projection heads over frozen ESM embeddings.

Capability match for triple_flow/3_esm_integration.py:137-213:
  * ProteinProjection (:137-159): 1280 -> 512 via Linear -> LN -> ReLU ->
    Dropout -> ResidualBlock -> Linear -> LN.
  * GeneProjection (:161-182): same shape but with an 8-head self-attention
    AttentionBlock instead of the residual MLP block.
  * ResidualBlock (:184-197), AttentionBlock (:199-213).
The `BiologicalDataType` routing of get_embeddings (:90-135) maps to choosing
the head; batched embedding (get_embeddings_batch :230-245) is
data/gene_embeddings.build_gene_embedding_dict.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ResidualBlock(nn.Module):
    dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(x)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln")(h).astype(self.dtype)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(h)
        return x + h


class AttentionBlock(nn.Module):
    dim: int
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # single-token self-attention over (B, dim) vectors, residual + LN
        h = x[:, None, :]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn",
        )(h, h, h)[:, 0]
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                            name="ln")(x + attn).astype(self.dtype)


class ProteinProjection(nn.Module):
    """1280 -> 512 protein-space head (3_esm_integration.py:137-159)."""

    out_dim: int = 512
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc_in")(
            x.astype(self.dtype))
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln_in")(h).astype(self.dtype)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = ResidualBlock(dim=self.out_dim, dropout=self.dropout,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="residual")(h, deterministic=deterministic)
        h = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc_out")(h)
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                            name="ln_out")(h)


class GeneProjection(nn.Module):
    """1280 -> 512 gene-space head with self-attention
    (3_esm_integration.py:161-182)."""

    out_dim: int = 512
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc_in")(
            x.astype(self.dtype))
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln_in")(h).astype(self.dtype)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = AttentionBlock(dim=self.out_dim, num_heads=self.num_heads,
                           dropout=self.dropout, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="attention")(h, deterministic=deterministic)
        h = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc_out")(h)
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                            name="ln_out")(h)
