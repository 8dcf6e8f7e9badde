"""Shared layer library: encoder towers + projection heads.

Semantics match the reference (cited per class) but are implemented as
flax.linen modules with a bf16 compute / fp32 param policy, static shapes and
XLA-friendly control flow.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from clip_dplm_tpu.config import ProjectionConfig, TowerConfig

Dtype = Any

_ACTS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "silu": nn.silu,
    "tanh": jnp.tanh,
}


class MLPTower(nn.Module):
    """Stack of `num_hidden_layers` square Linear+activation, final LayerNorm.

    Semantics of `CLIPEncoder` (reference old/clip.py:8-17, dup
    run1/full.py:11-18): the tower over a precomputed embedding vector.
    """

    cfg: TowerConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        act = _ACTS[self.cfg.activation]
        h = x.astype(self.dtype)
        for i in range(self.cfg.num_hidden_layers):
            h = nn.Dense(
                self.cfg.hidden_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"dense_{i}",
            )(h)
            h = act(h)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype)(h)
        return h


class ResNetTower(nn.Module):
    """Residual MLP tower — the `resnet` architecture option of
    run1/configuration_hybrid_clip.py:68-79 (58.1%/57.6% rows in proposal.MD)."""

    cfg: TowerConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        act = _ACTS[self.cfg.activation]
        h = nn.Dense(
            self.cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="in_proj",
        )(x.astype(self.dtype))
        for i in range(self.cfg.num_hidden_layers):
            r = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                             name=f"ln_{i}")(h).astype(self.dtype)
            r = nn.Dense(self.cfg.hidden_size, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"fc1_{i}")(r)
            r = act(r)
            r = nn.Dense(self.cfg.hidden_size, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"fc2_{i}")(r)
            h = h + r
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype)(h)
        return h


class VectorTransformerTower(nn.Module):
    """`transformer` architecture option over a single embedding vector: the
    vector is chunked into tokens and run through self-attention blocks
    (run1 ModelArchitectureConfig 'transformer'; proposal.MD rows
    transformer-3 58.1% / transformer-6 57.2%)."""

    cfg: TowerConfig
    num_tokens: int = 8
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B = x.shape[0]
        d = self.cfg.hidden_size
        # project vector into num_tokens tokens of width d
        h = nn.Dense(self.num_tokens * d, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="tokenize")(x.astype(self.dtype))
        h = h.reshape(B, self.num_tokens, d)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, self.num_tokens, d),
            self.param_dtype,
        )
        h = h + pos.astype(self.dtype)
        for i in range(self.cfg.num_hidden_layers):
            h = TransformerBlock(
                d_model=d,
                num_heads=self.cfg.num_attention_heads,
                ffn_mult=4,
                dropout=self.cfg.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(h, mask=None, deterministic=deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype)(h.mean(axis=1))
        return h


class TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block used by every token-level tower.

    Capability match for `nn.TransformerEncoderLayer` stacks (rna nb cell 28,
    tf nb cell 41, tong/models/encoders/perturbation_encoder.py:31-37); the
    attention core routes through the Pallas flash-attention kernel on TPU.
    """

    d_model: int
    num_heads: int
    ffn_mult: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        from clip_dplm_tpu.ops.attention import multihead_attention

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln_attn")(x).astype(self.dtype)
        qkv = nn.Dense(3 * self.d_model, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = multihead_attention(q, k, v, self.num_heads, mask=mask)
        attn = nn.Dense(self.d_model, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="out_proj")(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = x + attn

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln_ffn")(x).astype(self.dtype)
        h = nn.Dense(self.ffn_mult * self.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="ffn_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="ffn_out")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


def make_tower(cfg: TowerConfig, dtype=jnp.bfloat16, param_dtype=jnp.float32,
               name: Optional[str] = None) -> nn.Module:
    cls = {
        "mlp": MLPTower,
        "resnet": ResNetTower,
        "transformer": VectorTransformerTower,
    }[cfg.architecture]
    return cls(cfg=cfg, dtype=dtype, param_dtype=param_dtype, name=name)


# ---------------------------------------------------------------------------
# projection heads
# ---------------------------------------------------------------------------


class LinearProjection(nn.Module):
    """Plain linear projection (the 54.3% baseline head of proposal.MD:25)."""

    cfg: ProjectionConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        return nn.Dense(self.cfg.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype)(x.astype(self.dtype))


class ProjectionHead(nn.Module):
    """Linear->LN->GELU->Dropout->Linear->LN (reference old/clip.py:20-36)."""

    cfg: ProjectionConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.cfg.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x.astype(self.dtype))
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln1")(h).astype(self.dtype)
        h = nn.gelu(h)
        h = nn.Dropout(self.cfg.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.cfg.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(h)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype, name="ln2")(h)
        return h


class OptimizedProjectionHead(nn.Module):
    """Skip path + learnable layer-scale (init 1e-4) over a deep projection;
    hidden defaults to 4x output (reference old/clip_opt.py:9-44, the 58.2%
    head of proposal.MD:25). Xavier-uniform init to match the reference."""

    cfg: ProjectionConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        hidden = self.cfg.hidden_dim or 4 * self.cfg.dim
        init = nn.initializers.xavier_uniform()
        x = x.astype(self.dtype)
        skip = nn.Dense(self.cfg.dim, kernel_init=init, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="skip")(x)
        h = x
        for i in range(2):
            h = nn.Dense(hidden, kernel_init=init, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"fc{i}")(h)
            h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                             name=f"ln{i}")(h).astype(self.dtype)
            h = nn.gelu(h)
            h = nn.Dropout(self.cfg.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.cfg.dim, kernel_init=init, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc_out")(h)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln_out")(h)
        layer_scale = self.param(
            "layer_scale",
            nn.initializers.constant(self.cfg.layer_scale_init),
            (1,),
            self.param_dtype,
        )
        return skip.astype(jnp.float32) + layer_scale * h


def make_projection(cfg: ProjectionConfig, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32, name: Optional[str] = None) -> nn.Module:
    cls = {
        "linear": LinearProjection,
        "base": ProjectionHead,
        "optimized": OptimizedProjectionHead,
    }[cfg.kind]
    return cls(cfg=cfg, dtype=dtype, param_dtype=param_dtype, name=name)
