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
    # erf-GELU, matching torch.nn.GELU()'s default (the reference's
    # projection heads, old/clip.py:20-36); jax/flax default to the tanh
    # approximation, a systematic (if tiny) numerics difference that the
    # convergence-parity A/Bs must be able to rule out.
    "gelu_exact": lambda x: nn.gelu(x, approximate=False),
    "silu": nn.silu,
    "tanh": jnp.tanh,
}


# ---------------------------------------------------------------------------
# fused Dense+LN(+act+dropout) routing (ops/fused_dense.py)
#
# The holder modules declare params under EXACTLY the scope/param names the
# unfused flax modules use ("fc0/kernel", "ln0/scale", ...), so checkpoints
# and TP sharding rules are identical between the fused and unfused paths.
# ---------------------------------------------------------------------------


class _DenseParams(nn.Module):
    features: int
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()  # nn.Dense default

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", self.kernel_init, (in_dim, self.features), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
        )
        return kernel, bias


class _LayerNormParams(nn.Module):
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (dim,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (dim,), self.param_dtype
        )
        return scale, bias


def _fused_dense_mode(flag: bool):
    """(enabled, interpret) for the fused dense path: compiled on TPU,
    interpret-mode when tests force it, silently unfused elsewhere (the
    interpreter stubs the hardware PRNG, so CPU training must not route
    dropout through it)."""
    if not flag:
        return False, False
    from clip_dplm_tpu.ops import fused_dense as fd

    if fd.FORCE_INTERPRET:
        return True, True
    try:
        import jax

        return jax.devices()[0].platform == "tpu", False
    except Exception:  # pragma: no cover - uninitialized backend
        return False, False


def _fused_block(mod: nn.Module, x, features: int, *, dense_name: str,
                 ln_name: Optional[str], order: str, act: str, rate: float,
                 deterministic: bool, out_dtype, dtype, param_dtype,
                 kernel_init=None, interpret: bool = False,
                 skip=None, layer_scale=None, l2_normalize_out=False):
    """Run one Dense+LN(+act+dropout) block through the Pallas fused kernel,
    declaring params under the same names as the unfused modules."""
    import jax

    from clip_dplm_tpu.ops.fused_dense import fused_dense_norm_act

    dp = _DenseParams(
        features=features, param_dtype=param_dtype, name=dense_name,
        **({"kernel_init": kernel_init} if kernel_init is not None else {}),
    )
    kernel, bias = dp(x.shape[-1])
    ln = _LayerNormParams(param_dtype=param_dtype, name=ln_name)
    scale, ln_bias = ln(features)
    seed = None
    if rate > 0.0 and not deterministic:
        key = mod.make_rng("dropout")
        seed = jax.random.key_data(key).ravel()[-1].astype(jnp.int32)
    return fused_dense_norm_act(
        x, kernel, bias, scale, ln_bias, order=order, act=act,
        dropout_rate=rate, dropout_seed=seed, deterministic=deterministic,
        out_dtype=out_dtype, compute_dtype=dtype, interpret=interpret,
        skip=skip, layer_scale=layer_scale, l2_normalize_out=l2_normalize_out,
    )


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
        n = self.cfg.num_hidden_layers
        fused, interp = _fused_dense_mode(self.cfg.fused_dense)
        for i in range(n - 1 if fused else n):
            h = nn.Dense(
                self.cfg.hidden_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"dense_{i}",
            )(h)
            h = act(h)
        if fused:
            # final Dense + act + LN in one Pallas pass (same param tree)
            return _fused_block(
                self, h, self.cfg.hidden_size, dense_name=f"dense_{n - 1}",
                ln_name="LayerNorm_0", order="act_ln",
                act=self.cfg.activation, rate=0.0,
                deterministic=deterministic, out_dtype=jnp.float32,
                dtype=self.dtype, param_dtype=self.param_dtype,
                interpret=interp,
            )
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
    # LN stats are f32 either way (flax); bf16 here skips the f32
    # materialization that the following .astype(dtype) rounds away
    ln_dtype: Dtype = jnp.float32
    # Keep only the first `out_rows` tokens after the attention core: the
    # residual stream, FFN half and block output are computed for those rows
    # only. Exact dead-code elimination when downstream pooling reads just
    # those rows (cls/first): FFN and LNs are row-local, so deterministic
    # values AND gradients equal the full block followed by a slice — XLA
    # cannot see this DCE through the attention custom call, and the last
    # block's FFN chain is ~15 ms/tower-block at flagship geometry. With
    # dropout ACTIVE the computation stays correct but is not bitwise
    # replay-identical to the full block: nn.Dropout draws its mask over the
    # (sliced) input shape, so the random bits differ (same distribution).
    out_rows: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        from clip_dplm_tpu.ops.attention import (
            cls_query_attention,
            multihead_attention,
            packed_qkv_attention_proj,
            packed_tiny_attention_proj,
            short_attn_packed_ok,
            tiny_attn_ok,
        )

        h = nn.LayerNorm(dtype=self.ln_dtype, param_dtype=self.param_dtype,
                         name="ln_attn")(x).astype(self.dtype)
        qkv = nn.Dense(3 * self.d_model, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(h)
        if self.out_rows == 1:
            # single-query attention: only the CLS row's output survives, so
            # the (S, S) attention never happens — rank-1 reductions instead
            attn = cls_query_attention(qkv, self.num_heads, mask=mask)
            attn = nn.Dense(self.d_model, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="out_proj")(attn)
        elif short_attn_packed_ok(qkv.shape, self.num_heads, mask):
            # packed path: the short-S kernel consumes qkv unsplit (no
            # jnp.split copies or backward concat) and the out-projection
            # runs inside the kernel on the VMEM-resident attention output
            dp = _DenseParams(features=self.d_model,
                              param_dtype=self.param_dtype, name="out_proj")
            wo, bo = dp(self.d_model)
            attn = packed_qkv_attention_proj(qkv, wo, bo, self.num_heads,
                                             mask=mask)
            if self.out_rows is not None:
                attn = attn[:, :self.out_rows]
        elif tiny_attn_ok(qkv.shape, self.num_heads, mask):
            # tiny-S path (S < 64, e.g. the tf_clip perturbation tower's 10
            # DEG tokens): packed-diagonal kernel — P samples share one
            # MXU-shaped score dot per head under a block-diagonal bias
            dp = _DenseParams(features=self.d_model,
                              param_dtype=self.param_dtype, name="out_proj")
            wo, bo = dp(self.d_model)
            attn = packed_tiny_attention_proj(qkv, wo, bo, self.num_heads,
                                              mask=mask)
            if self.out_rows is not None:
                attn = attn[:, :self.out_rows]
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            attn = multihead_attention(q, k, v, self.num_heads, mask=mask)
            if self.out_rows is not None:
                attn = attn[:, :self.out_rows]
            attn = nn.Dense(self.d_model, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="out_proj")(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        if self.out_rows is not None:
            x = x[:, :self.out_rows]
        x = x + attn

        h = nn.LayerNorm(dtype=self.ln_dtype, param_dtype=self.param_dtype,
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
        out = nn.Dense(self.cfg.dim, dtype=self.dtype,
                       param_dtype=self.param_dtype)(x.astype(self.dtype))
        if self.cfg.l2_normalize_output:
            from clip_dplm_tpu.ops.infonce import l2_normalize

            out = l2_normalize(out)
        return out


class ProjectionHead(nn.Module):
    """Linear->LN->GELU->Dropout->Linear->LN (reference old/clip.py:20-36)."""

    cfg: ProjectionConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        fused, interp = _fused_dense_mode(self.cfg.fused_dense)
        if self.cfg.act != "gelu":
            fused = False  # the fused kernel implements tanh-GELU only
        if fused:
            h = _fused_block(
                self, x.astype(self.dtype), self.cfg.dim, dense_name="fc1",
                ln_name="ln1", order="ln_act", act="gelu",
                rate=self.cfg.dropout, deterministic=deterministic,
                out_dtype=self.dtype, dtype=self.dtype,
                param_dtype=self.param_dtype, interpret=interp,
            )
            h = _fused_block(
                self, h, self.cfg.dim, dense_name="fc2", ln_name="ln2",
                order="ln_act", act="none", rate=0.0,
                deterministic=deterministic, out_dtype=jnp.float32,
                dtype=self.dtype, param_dtype=self.param_dtype,
                interpret=interp,
            )
            if self.cfg.l2_normalize_output:
                from clip_dplm_tpu.ops.infonce import l2_normalize

                h = l2_normalize(h)
            return h
        h = nn.Dense(self.cfg.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x.astype(self.dtype))
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ln1")(h).astype(self.dtype)
        h = _ACTS[self.cfg.act](h)
        h = nn.Dropout(self.cfg.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.cfg.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(h)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype, name="ln2")(h)
        if self.cfg.l2_normalize_output:
            from clip_dplm_tpu.ops.infonce import l2_normalize

            h = l2_normalize(h)
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
        fused, interp = _fused_dense_mode(self.cfg.fused_dense)
        if self.cfg.act != "gelu":
            fused = False  # the fused kernel implements tanh-GELU only
        h = x
        if fused:
            for i in range(2):
                h = _fused_block(
                    self, h, hidden, dense_name=f"fc{i}", ln_name=f"ln{i}",
                    order="ln_act", act="gelu", rate=self.cfg.dropout,
                    deterministic=deterministic, out_dtype=self.dtype,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    kernel_init=init, interpret=interp,
                )
            layer_scale = self.param(
                "layer_scale",
                nn.initializers.constant(self.cfg.layer_scale_init),
                (1,),
                self.param_dtype,
            )
            # fc_out + ln_out + the skip/layer-scale residual tail in ONE pass
            return _fused_block(
                self, h, self.cfg.dim, dense_name="fc_out", ln_name="ln_out",
                order="ln_act", act="none", rate=0.0,
                deterministic=deterministic, out_dtype=jnp.float32,
                dtype=self.dtype, param_dtype=self.param_dtype,
                kernel_init=init, interpret=interp,
                skip=skip, layer_scale=layer_scale,
                l2_normalize_out=self.cfg.l2_normalize_output,
            )
        else:
            for i in range(2):
                h = nn.Dense(hidden, kernel_init=init, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"fc{i}")(h)
                h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                                 name=f"ln{i}")(h).astype(self.dtype)
                h = _ACTS[self.cfg.act](h)
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
        out = skip.astype(jnp.float32) + layer_scale * h
        if self.cfg.l2_normalize_output:
            from clip_dplm_tpu.ops.infonce import l2_normalize

            out = l2_normalize(out)
        return out


def make_projection(cfg: ProjectionConfig, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32, name: Optional[str] = None) -> nn.Module:
    cls = {
        "linear": LinearProjection,
        "base": ProjectionHead,
        "optimized": OptimizedProjectionHead,
    }[cfg.kind]
    return cls(cfg=cfg, dtype=dtype, param_dtype=param_dtype, name=name)
