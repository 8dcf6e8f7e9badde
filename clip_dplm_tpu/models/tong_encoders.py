"""The tong three-encoder stack (tong/models/encoders/*).

CellStateEncoder  — gene-expression MLP (g -> 2d -> d) + optional pseudotime
  encoder (1 -> time_dim -> d, added), PiGNN over the kNN graph, global
  mean-pool context concat + skip projection (cell_encoder.py:5-70; the
  reference's `scatter_mean` there was used without import — a known defect,
  implemented here as the intent).
PerturbationEncoder — ESM-embedding MLP + perturbation-value MLP + optional
  single-token cross-attention (ESM queries values) + concat projection with
  residual to the ESM path (perturbation_encoder.py:4-73).
ProteinEncoder — configurable MLP stack [protein_dim]+hidden+[latent], GELU,
  LN, residual when dims match (protein_encoder.py:4-35; default geometry
  1280 -> 1024 -> 768 -> 512 per tong/configs/default.yaml:23-25).
create_projection_stack — the 3-block Linear/LN/GELU/Dropout factory
  (tong/models/layers/projections.py:3-16).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_dplm_tpu.config import EncoderConfig
from clip_dplm_tpu.models.gnn import MultiLayerPiGNN
from clip_dplm_tpu.ops.segment import segment_mean

Dtype = Any


class MLPStack(nn.Module):
    """Linear -> LN -> GELU -> Dropout chain; last layer optionally bare."""

    dims: Sequence[int]
    dropout: float = 0.1
    final_ln: bool = True
    final_act: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        n = len(self.dims)
        for i, dim in enumerate(self.dims):
            x = nn.Dense(dim, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"fc{i}")(x)
            last = i == n - 1
            if not last or self.final_ln:
                x = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                                 name=f"ln{i}")(x).astype(self.dtype)
            if not last or self.final_act:
                x = nn.gelu(x)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def create_projection_stack(d_out: int, dropout: float = 0.1,
                            dtype=jnp.float32, param_dtype=jnp.float32,
                            name: Optional[str] = None) -> nn.Module:
    """3-block projection factory (tong projections.py semantics)."""
    return MLPStack(dims=(d_out, d_out, d_out), dropout=dropout, final_ln=True,
                    dtype=dtype, param_dtype=param_dtype, name=name)


class CellStateEncoder(nn.Module):
    cfg: EncoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        gene_expr: jax.Array,  # (N, gene_dim)
        dpt: Optional[jax.Array],  # (N,) pseudotime or None
        edge_index: jax.Array,  # (2, E)
        batch_idx: jax.Array,  # (N,)
        edge_mask: Optional[jax.Array] = None,
        node_mask: Optional[jax.Array] = None,
        num_graphs: int = 1,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        d = c.latent_dim
        h = MLPStack(dims=(2 * d, d), dropout=c.dropout, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="gene_encoder")(
            gene_expr.astype(self.dtype), deterministic=deterministic)
        if c.use_time_encoding and dpt is not None:
            t = MLPStack(dims=(c.time_embed_dim, d), dropout=c.dropout,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="time_encoder")(
                dpt[:, None].astype(self.dtype), deterministic=deterministic)
            h = h + t
        h = MultiLayerPiGNN(
            cfg=c.gnn, latent_dim=d, dtype=self.dtype,
            param_dtype=self.param_dtype, name="gnn",
        )(h, edge_index, batch_idx, edge_mask, node_mask, num_graphs,
          deterministic=deterministic)
        # global context concat + skip (cell_encoder.py:62-68 intent)
        h_global = segment_mean(h, batch_idx, num_graphs, mask=node_mask)
        h_cat = jnp.concatenate([h, h_global[batch_idx]], axis=-1)
        out = MLPStack(dims=(d, d), dropout=c.dropout, final_ln=False,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="output_proj")(h_cat, deterministic=deterministic)
        return out + h


class PerturbationEncoder(nn.Module):
    cfg: EncoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        esm_embeddings: jax.Array,  # (B, esm_dim) pooled perturbed-gene ESM
        perturbation_values: jax.Array,  # (B, n_genes) signed DEG values
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        d = c.latent_dim
        h_esm = MLPStack(dims=(2 * d, d), dropout=c.dropout, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="esm_encoder")(
            esm_embeddings.astype(self.dtype), deterministic=deterministic)
        h_val = MLPStack(dims=(d, d), dropout=c.dropout, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="value_encoder")(
            perturbation_values.astype(self.dtype), deterministic=deterministic)
        if c.use_cross_attention:
            # single-token cross attention: ESM queries values
            # (perturbation_encoder.py:31-37 uses seq len 1 on both sides)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=c.gnn.num_heads, dtype=self.dtype,
                param_dtype=self.param_dtype, name="cross_attention",
            )(h_esm[:, None, :], h_val[:, None, :], h_val[:, None, :])[:, 0]
            h_att = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                                 name="attention_norm")(attn).astype(self.dtype)
        else:
            h_att = h_val
        h = jnp.concatenate([h_esm, h_att], axis=-1)
        out = MLPStack(dims=(d, d), dropout=c.dropout, final_ln=False,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="output_proj")(h, deterministic=deterministic)
        return out + h_esm


class ProteinEncoder(nn.Module):
    cfg: EncoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, protein_embedding: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        c = self.cfg
        dims = tuple(c.protein_hidden_dims) + (c.latent_dim,)
        h = MLPStack(dims=dims, dropout=c.dropout, final_ln=False,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="encoder")(
            protein_embedding.astype(self.dtype), deterministic=deterministic)
        if protein_embedding.shape[-1] == c.latent_dim:
            h = h + protein_embedding.astype(h.dtype)
        return h
