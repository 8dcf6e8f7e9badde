"""Two-tower CLIP over precomputed embeddings — the minimum end-to-end model.

Capability match for `RNAProteinCLIPModule` / `DiffMapProteinCLIPModule`
(old/clip.py:38-110) and `OptimizedCLIPModule` (old/clip_opt.py:46-128):
tower -> projection -> L2-normalize, with a learned logit scale. The loss
(symmetric InfoNCE with optional hard-negative cache + global-batch gather) is
computed by ops/infonce.py so the same model works single-chip, pjit-sharded,
and with the fused Pallas kernel.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from clip_dplm_tpu.config import Config
from clip_dplm_tpu.models.layers import make_projection, make_tower
from clip_dplm_tpu.ops.infonce import l2_normalize


class TwoTowerCLIP(nn.Module):
    """Two encoder towers + projection heads into a shared space.

    Returns unnormalized projections plus the learned logit scale; callers
    normalize inside the loss kernel (keeps normalize+similarity fused).
    """

    cfg: Config
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.tower_a = make_tower(c.tower_a, self.dtype, self.param_dtype)
        self.tower_b = make_tower(c.tower_b, self.dtype, self.param_dtype)
        self.proj_a = make_projection(c.projection, self.dtype, self.param_dtype)
        self.proj_b = make_projection(c.projection, self.dtype, self.param_dtype)
        # log(1/0.07) init, fp32 island (old/clip_opt.py:73)
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(c.contrastive.logit_scale_init),
            (),
            jnp.float32,
        )

    def __call__(
        self, batch: Dict[str, jnp.ndarray], *, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        za = self.proj_a(
            self.tower_a(batch["a"], deterministic=deterministic),
            deterministic=deterministic,
        )
        zb = self.proj_b(
            self.tower_b(batch["b"], deterministic=deterministic),
            deterministic=deterministic,
        )
        return {
            "emb_a": za.astype(jnp.float32),
            "emb_b": zb.astype(jnp.float32),
            "logit_scale": self.logit_scale,
        }

    def encode_a(self, x, *, deterministic: bool = True):
        return l2_normalize(
            self.proj_a(
                self.tower_a(x, deterministic=deterministic),
                deterministic=deterministic,
            )
        )

    def encode_b(self, x, *, deterministic: bool = True):
        return l2_normalize(
            self.proj_b(
                self.tower_b(x, deterministic=deterministic),
                deterministic=deterministic,
            )
        )
