"""Token-level transformer towers + the RNA<->RBP CLIP model.

Capability match for the `current/rna_clip_codes.ipynb` cell 28 model
(RNARBPCLIPEncoder / RNARBPCLIPProjectionHead / RNARBPCLIPModel): full
transformer towers (3 encoder layers, 8 heads, 4x FFN) over variable-length
per-token embeddings (RNA motifs 120-d from RNABERT, RBP residues 1280-d from
ESM), CLS pooling, skip+layer-scale projection into a 512-d shared space,
learned logit scale log(1/0.07), symmetric InfoNCE.

TPU-native differences from the reference:
  * NaN-padding + `create_padding_mask` (cell 24: `~isnan(x).any(-1)`) is
    replaced by explicit boolean masks produced at collation time
    (data/collate.py) — NaNs never reach the device.
  * attention routes through the Pallas flash kernel (ops/flash_attention.py).
  * pooling uses a learned CLS query prepended to the sequence ('cls') or
    masked mean ('mean'); the reference pooled hidden position 0.
  * for cls/first pooling the LAST block computes its FFN half — and the
    final LayerNorm runs — on token 0 only (TransformerBlock.out_rows):
    row-local ops make this exact dead-code elimination of the reference's
    full-block-then-pool computation, identical deterministic values and
    gradients (tests/test_token_towers.py::test_block_out_rows_is_exact_dce);
    with dropout active the masks are drawn at the sliced shape, so noise
    differs per step (same distribution, not bitwise replay-identical).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from clip_dplm_tpu.config import Config, TransformerTowerConfig
from clip_dplm_tpu.models.layers import OptimizedProjectionHead, TransformerBlock


class TokenTransformerTower(nn.Module):
    """Transformer encoder over (B, S, input_dim) token embeddings with a
    (B, S) validity mask; returns a pooled (B, d_model) representation."""

    cfg: TransformerTowerConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, tokens, mask=None, *, deterministic: bool = True):
        c = self.cfg
        B, S, _ = tokens.shape
        if mask is None:
            mask = jnp.ones((B, S), dtype=bool)

        h = nn.Dense(c.d_model, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="input_proj")(tokens.astype(self.dtype))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, c.max_len, c.d_model),
            self.param_dtype,
        )
        h = h + pos[:, :S].astype(self.dtype)

        if c.pooling == "cls":
            cls = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, c.d_model),
                self.param_dtype,
            )
            h = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, c.d_model)), h],
                axis=1,
            )
            mask = jnp.concatenate([jnp.ones((B, 1), bool), mask], axis=1)

        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(3,))
        # cls/first pooling reads token 0 only, so the LAST block computes
        # its FFN half (and the final LN below runs) on that row alone —
        # row-local ops make this exact DCE, not an approximation (see
        # TransformerBlock.out_rows); the reference computes the full block
        # and then pools position 0 (rna nb cell 28), same function.
        pool_first = c.pooling in ("cls", "first")
        for i in range(c.num_layers):
            last = i == c.num_layers - 1
            h = block_cls(
                d_model=c.d_model,
                num_heads=c.num_heads,
                ffn_mult=c.ffn_mult,
                dropout=c.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                ln_dtype=(jnp.bfloat16 if c.ln_dtype == "bfloat16"
                          else jnp.float32),
                out_rows=1 if (pool_first and last) else None,
                name=f"block_{i}",
            )(h, mask, deterministic=deterministic)

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="final_ln")(h)
        if pool_first:
            return h[:, 0]
        # masked mean
        w = mask[..., None].astype(h.dtype)
        return (h * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)


class RNARBPCLIP(nn.Module):
    """Two token towers + optimized projection heads + learned logit scale
    (71.6M-param reference config: rna nb cell 28/29)."""

    cfg: Config
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        remat = c.precision.remat
        self.rna_tower = TokenTransformerTower(
            c.rna_tower, self.dtype, self.param_dtype, remat, name="rna_tower"
        )
        self.rbp_tower = TokenTransformerTower(
            c.rbp_tower, self.dtype, self.param_dtype, remat, name="rbp_tower"
        )
        proj_cfg = c.projection
        self.rna_proj = OptimizedProjectionHead(
            cfg=proj_cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            name="rna_proj",
        )
        self.rbp_proj = OptimizedProjectionHead(
            cfg=proj_cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            name="rbp_proj",
        )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(c.contrastive.logit_scale_init),
            (),
            jnp.float32,
        )

    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        za = self.rna_proj(
            self.rna_tower(
                batch["rna_tokens"], batch.get("rna_mask"),
                deterministic=deterministic,
            ),
            deterministic=deterministic,
        )
        zb = self.rbp_proj(
            self.rbp_tower(
                batch["rbp_tokens"], batch.get("rbp_mask"),
                deterministic=deterministic,
            ),
            deterministic=deterministic,
        )
        return {
            "emb_a": za.astype(jnp.float32),
            "emb_b": zb.astype(jnp.float32),
            "logit_scale": self.logit_scale,
        }
