"""ProtT5 encoder (T5 v1.0 encoder stack) in flax — the protein language
model behind the reference's ProtT5EncodingModule (old/encoders.py:15-31,
Rostlab/prot_t5_xl_half_uniref50-enc) rebuilt natively:

- T5LayerNorm == RMSNorm (no mean subtraction, no bias), fp32 island.
- Relative position bias: bucketed (bidirectional) bias embedding owned by
  block 0 and shared by every layer; attention scores are NOT scaled by
  1/sqrt(d_kv) (T5 folds the scale into init).
- Non-gated ReLU FFN (t5-3b generation), biasless Dense throughout.
- `convert_t5_torch_params` maps a HF `T5EncoderModel` state_dict 1:1
  (parity-tested against transformers on random weights, tests/test_t5.py).

The relative-bias additive term keeps attention on the XLA path (the Pallas
flash kernel takes key-padding masks only); ProtT5 inference at S<=1024 is
MXU-bound through the 16384-wide FFN, so this costs little.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clip_dplm_tpu.config import ProtT5Config

_NEG_INF = -1e9


class T5LayerNorm(nn.Module):
    """RMS norm with scale only (HF T5LayerNorm): x / rms(x) * w, fp32."""

    eps: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + self.eps)) * w


def relative_position_bucket(
    relative_position: jax.Array, num_buckets: int = 32, max_distance: int = 128
) -> jax.Array:
    """Bidirectional T5 bucket function: half the buckets for each sign, the
    near half exact, the far half log-spaced up to max_distance."""
    num_buckets = num_buckets // 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    cfg: ProtT5Config
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        B, S, _ = x.shape
        dense = lambda name: nn.Dense(
            inner, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        q = dense("q")(x)
        k = dense("k")(x)
        v = dense("v")(x)

        def heads(t):
            return t.reshape(B, S, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        # T5: unscaled scores + shared relative bias, fp32 softmax
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        logits = logits + position_bias
        if mask is not None:
            logits = logits + jnp.where(
                mask[:, None, None, :], 0.0, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, inner)
        return nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="o")(attn)


class T5Block(nn.Module):
    cfg: ProtT5Config
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias):
        c = self.cfg
        h = T5LayerNorm(eps=c.layer_norm_eps, param_dtype=self.param_dtype,
                        name="ln_attn")(x).astype(self.dtype)
        x = x + T5SelfAttention(
            cfg=c, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn")(h, mask, position_bias)
        h = T5LayerNorm(eps=c.layer_norm_eps, param_dtype=self.param_dtype,
                        name="ln_ffn")(x).astype(self.dtype)
        h = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="wi")(h)
        h = nn.relu(h)
        h = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="wo")(h)
        return x + h


class ProtT5Tower(nn.Module):
    """T5 encoder over ProtT5 token ids (B, S) with (B, S) validity mask.

    Token ids follow the published ProtTrans vocabulary
    (data/protein.py::tokenize_prot_t5): 0=<pad>, 1=</s>, 2=<unk>, 3..=AA.
    """

    cfg: ProtT5Config
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    PAD_IDX: int = 0
    EOS_IDX: int = 1

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        mask: Optional[jax.Array] = None,
        pooling: str = "tokens",
    ) -> jax.Array:
        c = self.cfg
        B, S = tokens.shape
        if mask is None:
            mask = tokens != self.PAD_IDX

        emb = nn.Embed(c.vocab_size, c.d_model, param_dtype=self.param_dtype,
                       name="embed_tokens")(tokens).astype(jnp.float32)
        emb = jnp.where(mask[..., None], emb, 0.0)
        h = emb.astype(self.dtype)

        # shared relative position bias, owned by block 0 (HF layout)
        rel = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0 / np.sqrt(c.d_model)),
            (c.relative_attention_num_buckets, c.num_heads),
            self.param_dtype,
        )
        pos = jnp.arange(S)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            num_buckets=c.relative_attention_num_buckets,
            max_distance=c.relative_attention_max_distance,
        )  # (S, S)
        position_bias = jnp.take(rel, buckets, axis=0)  # (S, S, H)
        position_bias = position_bias.transpose(2, 0, 1)[None].astype(jnp.float32)

        block = T5Block
        if self.remat:
            block = nn.remat(T5Block, static_argnums=())
        for i in range(c.num_layers):
            h = block(cfg=c, dtype=self.dtype, param_dtype=self.param_dtype,
                      name=f"layer_{i}")(h, mask, position_bias)

        h = T5LayerNorm(eps=c.layer_norm_eps, param_dtype=self.param_dtype,
                        name="final_ln")(h)

        if pooling == "tokens":
            return h
        if pooling == "mean_residues":
            # per-protein embedding: mean over residues excluding </s>
            # (ProtTrans protocol; old/encoders.py consumers mean over 0..L)
            residue = mask & (tokens != self.EOS_IDX)
            w = residue[..., None].astype(h.dtype)
            return (h * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)
        raise ValueError(f"unknown pooling {pooling!r}")


def prot_t5_config_from_name(name: str, **overrides) -> ProtT5Config:
    """Published ProtTrans encoder geometries."""
    presets = {
        # Rostlab/prot_t5_xl_* (t5-3b geometry, encoder half)
        "prot_t5_xl": dict(d_model=1024, d_ff=16384, num_layers=24,
                           num_heads=32, d_kv=128),
        # Rostlab/prot_t5_base_mt_uniref50
        "prot_t5_base": dict(d_model=768, d_ff=3072, num_layers=12,
                             num_heads=12, d_kv=64),
    }
    if name not in presets:
        raise ValueError(f"unknown ProtT5 preset {name!r}")
    kw = dict(presets[name])
    kw.update(overrides)
    return ProtT5Config(**kw)


def convert_t5_torch_params(state_dict: Dict[str, Any], cfg: ProtT5Config):
    """HF `T5EncoderModel.state_dict()` -> ProtT5Tower params pytree."""

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().cpu().numpy()
        return jnp.asarray(np.asarray(w, dtype=np.float32))

    def dense(name):
        return {"kernel": t(name).T}

    params = {
        "embed_tokens": {"embedding": t("shared.weight")},
        "relative_attention_bias": t(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"
        ),
        "final_ln": {"weight": t("encoder.final_layer_norm.weight")},
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        params[f"layer_{i}"] = {
            "ln_attn": {"weight": t(f"{pre}.layer.0.layer_norm.weight")},
            "attn": {
                "q": dense(f"{pre}.layer.0.SelfAttention.q.weight"),
                "k": dense(f"{pre}.layer.0.SelfAttention.k.weight"),
                "v": dense(f"{pre}.layer.0.SelfAttention.v.weight"),
                "o": dense(f"{pre}.layer.0.SelfAttention.o.weight"),
            },
            "ln_ffn": {"weight": t(f"{pre}.layer.1.layer_norm.weight")},
            "wi": dense(f"{pre}.layer.1.DenseReluDense.wi.weight"),
            "wo": dense(f"{pre}.layer.1.DenseReluDense.wo.weight"),
        }
    return params


def export_t5_torch_params(params, cfg: ProtT5Config) -> Dict[str, Any]:
    """Inverse of convert_t5_torch_params: ProtT5Tower flax params -> an HF
    `T5EncoderModel` state_dict (numpy fp32). Exact roundtrip
    (test_t5::test_export_roundtrips_converter)."""

    def arr(x):
        return np.asarray(x, dtype=np.float32)

    sd: Dict[str, Any] = {
        "shared.weight": arr(params["embed_tokens"]["embedding"]),
        "encoder.embed_tokens.weight":
            arr(params["embed_tokens"]["embedding"]),
        "encoder.block.0.layer.0.SelfAttention"
        ".relative_attention_bias.weight":
            arr(params["relative_attention_bias"]),
        "encoder.final_layer_norm.weight": arr(params["final_ln"]["weight"]),
    }
    for i in range(cfg.num_layers):
        blk = params[f"layer_{i}"]
        pre = f"encoder.block.{i}"
        sd[f"{pre}.layer.0.layer_norm.weight"] = arr(blk["ln_attn"]["weight"])
        for name in ("q", "k", "v", "o"):
            sd[f"{pre}.layer.0.SelfAttention.{name}.weight"] = \
                arr(blk["attn"][name]["kernel"]).T
        sd[f"{pre}.layer.1.layer_norm.weight"] = arr(blk["ln_ffn"]["weight"])
        sd[f"{pre}.layer.1.DenseReluDense.wi.weight"] = \
            arr(blk["wi"]["kernel"]).T
        sd[f"{pre}.layer.1.DenseReluDense.wo.weight"] = \
            arr(blk["wo"]["kernel"]).T
    return sd
