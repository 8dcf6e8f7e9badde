"""PiGNN — protein-informed graph network over the cell kNN graph.

Semantics of `PiGNNLayer` / `MultiLayerPiGNN` (tong/models/layers/gnn.py:6-128):
per-edge multi-head attention (q.k softmax over heads), edge-feature MLP
update, node MLP update with residual + LN, global mean-pool sigmoid gating,
and a multi-layer variant concatenating all intermediate node states through
a skip projection.

TPU-native design: edges are padded to a static count with a validity mask
(ragged kNN graphs under XLA static shapes); multi-node aggregation uses
XLA segment ops (ops/segment.py) instead of torch_scatter; attention softmax
is over the head axis per edge, exactly as the reference (an unusual design —
heads compete per edge — kept for parity).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_dplm_tpu.config import GNNConfig
from clip_dplm_tpu.ops.segment import segment_mean, segment_sum


class PiGNNLayer(nn.Module):
    d_emb: int
    n_heads: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,  # (N, d) node features
        e: jax.Array,  # (E, d) edge features
        edge_index: jax.Array,  # (2, E) src/dst, padded edges point anywhere
        batch_idx: jax.Array,  # (N,) graph id per node
        edge_mask: Optional[jax.Array] = None,  # (E,) True = real edge
        node_mask: Optional[jax.Array] = None,  # (N,) True = real node
        num_graphs: int = 1,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        d, H = self.d_emb, self.n_heads
        dh = d // H
        src, dst = edge_index[0], edge_index[1]

        def dense(n, name):
            return nn.Dense(n, dtype=self.dtype, param_dtype=self.param_dtype,
                            name=name)

        def mlp(dims, name, x, deterministic):
            for i, dim in enumerate(dims):
                x = dense(dim, f"{name}_fc{i}")(x)
                if i < len(dims) - 1:
                    x = nn.LayerNorm(dtype=jnp.float32,
                                     param_dtype=self.param_dtype,
                                     name=f"{name}_ln{i}")(x).astype(self.dtype)
                    x = nn.gelu(x)
                    x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            return x

        # per-edge multi-head attention: softmax over HEADS (reference
        # gnn.py:78-81 applies softmax along dim=1 == the head axis)
        q = dense(d, "q_proj")(h)[dst].reshape(-1, H, dh)
        k = dense(d, "k_proj")(h)[src].reshape(-1, H, dh)
        v = dense(d, "v_proj")(h)[src].reshape(-1, H, dh)
        scores = jnp.einsum("nhd,nhd->nh", q, k) / jnp.sqrt(float(dh))
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        msg = (attn[..., None] * v).reshape(-1, d)
        msg = dense(d, "o_proj")(msg)

        # edge update: e' = LN(e + MLP([h_src, e, h_dst]))
        e_in = jnp.concatenate([h[src], e, h[dst]], axis=-1)
        e_upd = mlp([d, d], "edge_mlp", e_in, deterministic)
        e = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln_edge")(e + e_upd).astype(self.dtype)

        # node update: aggregate messages at dst, then h' = LN(h + MLP([agg, h]))
        agg = segment_sum(msg, dst, h.shape[0], mask=edge_mask)
        h_in = jnp.concatenate([agg, h], axis=-1)
        h_upd = mlp([2 * d, d], "node_mlp", h_in, deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln_node")(h + h_upd).astype(self.dtype)

        # global gating: sigmoid(MLP(mean-pool per graph)) x nodes
        h_global = segment_mean(h, batch_idx, num_graphs, mask=node_mask)
        g = dense(d, "gate_fc0")(h_global)
        g = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="gate_ln")(g).astype(self.dtype)
        g = nn.gelu(g)
        g = jax.nn.sigmoid(dense(d, "gate_fc1")(g))
        h = h * g[batch_idx]
        return h, e


class MultiLayerPiGNN(nn.Module):
    """n_layers of PiGNN; all intermediate node states concat through a skip
    projection + LN (tong/models/layers/gnn.py:109-126)."""

    cfg: GNNConfig
    latent_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, h, edge_index, batch_idx, edge_mask=None, node_mask=None,
        num_graphs: int = 1, *, deterministic: bool = True,
    ) -> jax.Array:
        e = jnp.zeros((edge_index.shape[1], self.latent_dim), self.dtype)
        intermediates = []
        for i in range(self.cfg.num_layers):
            h, e = PiGNNLayer(
                d_emb=self.latent_dim, n_heads=self.cfg.num_heads,
                dropout=self.cfg.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layer_{i}",
            )(h, e, edge_index, batch_idx, edge_mask, node_mask, num_graphs,
              deterministic=deterministic)
            intermediates.append(h)
        h_cat = jnp.concatenate(intermediates, axis=-1)
        h_skip = nn.Dense(self.latent_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="skip_proj")(h_cat)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln_out")(h + h_skip)
        return h.astype(self.dtype)
