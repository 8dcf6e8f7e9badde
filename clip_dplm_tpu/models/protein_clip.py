"""RNA <-> protein CLIP with an ESM-2 tower trained end-to-end.

BASELINE.json config 2: "RNA<->protein CLIP with small ESM-2 (8M/35M) protein
tower end-to-end (current/rna_clip_codes)". Unlike RNARBPCLIP (which consumes
precomputed ESM embeddings per residue), this model runs the protein side
from raw token ids through a full ESMTower — trainable (8M/35M) or frozen
(650M, `esm.frozen=True` -> stop_gradient, matching the reference's frozen
embedding pipelines in tf nb cell 21 / triple_flow/3_esm_integration.py).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_dplm_tpu.config import Config
from clip_dplm_tpu.models.esm import ESMTower
from clip_dplm_tpu.models.layers import OptimizedProjectionHead
from clip_dplm_tpu.models.token_towers import TokenTransformerTower


class ESMProteinCLIP(nn.Module):
    """RNA token tower  <->  ESM-2 protein tower, projected to a shared space."""

    cfg: Config
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.rna_tower = TokenTransformerTower(
            c.rna_tower, self.dtype, self.param_dtype, c.precision.remat,
            name="rna_tower",
        )
        self.esm_tower = ESMTower(
            cfg=c.esm, dtype=self.dtype, param_dtype=self.param_dtype,
            remat=c.precision.remat, name="esm_tower",
        )
        self.rna_proj = OptimizedProjectionHead(
            cfg=c.projection, dtype=self.dtype, param_dtype=self.param_dtype,
            name="rna_proj",
        )
        self.protein_proj = OptimizedProjectionHead(
            cfg=c.projection, dtype=self.dtype, param_dtype=self.param_dtype,
            name="protein_proj",
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
        rna = self.rna_tower(
            batch["rna_tokens"], batch.get("rna_mask"), deterministic=deterministic
        )
        prot = self.esm_tower(
            batch["protein_tokens"], batch.get("protein_mask"),
            pooling="mean_residues",
        )
        if self.cfg.esm.frozen and not self.cfg.esm.lora_rank:
            # with LoRA active the adapters inside the tower must receive
            # gradients; the base weights are frozen per-weight instead
            # (stop_gradient at use in EsmBlock + the masked optimizer)
            prot = jax.lax.stop_gradient(prot)
        za = self.rna_proj(rna, deterministic=deterministic)
        zb = self.protein_proj(prot, deterministic=deterministic)
        return {
            "emb_a": za.astype(jnp.float32),
            "emb_b": zb.astype(jnp.float32),
            "logit_scale": self.logit_scale,
        }
