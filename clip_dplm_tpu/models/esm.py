"""ESM-2-style protein transformer, implemented natively in flax.

TPU-native replacement for the frozen ESM-2 / ProtT5 inference the reference
runs through fair-esm / HF transformers (tf nb cell 21:
`esm2_t33_650M_UR50D` mean-pooled residue embeddings;
triple_flow/3_esm_integration.py:45-135; old/encoders.py:15-31) — see
SURVEY.md section 2.6 row 6. Architecture follows the public ESM-2 family so
PyTorch checkpoints convert 1:1 (convert_esm_torch_params below):

  * token embedding over the 33-symbol ESM alphabet with ESM's mask-token
    dropout rescaling (token_dropout)
  * pre-LN transformer blocks with rotary position embeddings on q/k
    (applied per head before the Pallas flash-attention dispatch)
  * GELU(exact) FFN, final layer norm
  * pooling: mean over real residues excluding BOS/EOS (the reference's
    embedding-pipeline convention) or per-token outputs

ESM-2 family geometry (public): 8M t6/320/20h, 35M t12/480/20h,
150M t30/640/20h, 650M t33/1280/20h.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_dplm_tpu.config import ESMConfig
from clip_dplm_tpu.ops.attention import attention_dispatch

# fraction of tokens masked during ESM-2 pretraining (0.15 * 0.8); used by
# the token-dropout rescaling at inference
_MASK_RATIO_TRAIN = 0.15 * 0.8

ESM2_SIZES = {
    "esm2_t6_8M": dict(num_layers=6, d_model=320, num_heads=20),
    "esm2_t12_35M": dict(num_layers=12, d_model=480, num_heads=20),
    "esm2_t30_150M": dict(num_layers=30, d_model=640, num_heads=20),
    "esm2_t33_650M": dict(num_layers=33, d_model=1280, num_heads=20),
    # named by the reference's config (triple_flow/1_config.py:152-183) but
    # never run there (single GPU); here they shard via TP (tp_leaf_spec),
    # sequence parallelism (seq_axis ring attention) and the GPipe pipeline
    # (parallel/pipeline.py + stack_layer_params over the layer_i params)
    "esm2_t36_3B": dict(num_layers=36, d_model=2560, num_heads=40),
    "esm2_t48_15B": dict(num_layers=48, d_model=5120, num_heads=40),
}


def rotary_embed(x: jax.Array, positions: jax.Array) -> jax.Array:
    """Apply rotary position embedding over the head dim of (B, H, S, Dh).

    ESM-2 convention: theta = 10000^(-2i/Dh), rotate-half pairing
    (x1, x2 = split halves; out = [x1*cos - x2*sin, x2*cos + x1*sin])."""
    Dh = x.shape[-1]
    half = Dh // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[:, None].astype(jnp.float32) * freqs[None, :]  # (S, half)
    cos = jnp.cos(angles)[None, None]  # (1, 1, S, half)
    sin = jnp.sin(angles)[None, None]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def rotary_embed_bsd(
    x: jax.Array, positions: jax.Array, num_heads: int
) -> jax.Array:
    """rotary_embed in the head-major (B, S, D) layout, D = H * Dh.

    Equals `merge_heads(rotary_embed(split_heads(x)))` without the head
    split/merge transposes: the (B, S, H, Dh) view is a free bitcast and
    everything else is elementwise, so XLA fuses the whole thing into the
    producing matmul's epilogue. Used by the packed-qkv short-attention path
    (EsmBlock below), where q/k must be rotated while still packed."""
    B, S, D = x.shape
    Dh = D // num_heads
    half = Dh // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[:, None].astype(jnp.float32) * freqs[None, :]  # (S, half)
    cos = jnp.cos(angles)[None, :, None, :]  # (1, S, 1, half)
    sin = jnp.sin(angles)[None, :, None, :]
    xh = x.reshape(B, S, num_heads, Dh)
    x1, x2 = xh[..., :half], xh[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.reshape(B, S, D).astype(x.dtype)


class EsmBlock(nn.Module):
    """Pre-LN transformer block with rotary q/k (ESM-2 layer semantics).

    `seq_axis`: mesh axis name for sequence parallelism — attention routes
    through the ring flash kernel (ops/ring_attention.py) with K/V shards
    travelling the ICI ring; every other op is per-token and needs nothing.
    """

    d_model: int
    num_heads: int
    ffn_mult: int = 4
    ln_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    seq_axis: Optional[str] = None
    # LoRA adapter spec (models/lora.py) — None disables. Adapters add
    # `<site>_lora` sibling modules; the base param tree is unchanged, so
    # HF-converted checkpoints load with or without adapters.
    lora: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask, positions):
        from clip_dplm_tpu.models.layers import _DenseParams
        from clip_dplm_tpu.models.lora import LoRAPair
        from clip_dplm_tpu.ops.attention import (
            packed_qkv_attention_proj,
            short_attn_packed_ok,
        )

        H = self.num_heads
        D = self.d_model
        Dh = D // H
        spec = self.lora
        targets = spec.targets if spec is not None else ()

        def _base(w):
            # frozen-base LoRA: stop_gradient at use lets XLA DCE the
            # site's dW matmul from the backward (the masked optimizer in
            # train/state.py enforces the freeze regardless)
            if spec is not None and spec.freeze_base:
                return jax.lax.stop_gradient(w)
            return w

        def _pair(site: str, in_f: int, out_f: int) -> LoRAPair:
            return LoRAPair(
                in_features=in_f, features=out_f, rank=spec.rank,
                alpha=spec.alpha, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"{site}_lora")
        ln_in = x
        if os.environ.get("CLIP_DPLM_LN_FUSE_BARRIER", "0") == "1":
            # keep the PREVIOUS block's ffn_out matmul fusion free of this
            # LN's reduce epilogue (see the ffn-side comment below); the
            # residual stream x itself stays un-barriered
            ln_in = jax.lax.optimization_barrier(x)
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype,
                         name="ln_attn")(ln_in).astype(self.dtype)
        B, S, _ = h.shape
        # q/k/v/out params are declared layout-identically to nn.Dense (same
        # names, kernel/bias, lecun_normal/zeros) so the HF converter and
        # checkpoints are path-independent; which compute path consumes them
        # is a trace-time dispatch.
        wq, bq = _DenseParams(features=D, param_dtype=self.param_dtype,
                              name="q")(D)
        wk, bk = _DenseParams(features=D, param_dtype=self.param_dtype,
                              name="k")(D)
        wv, bv = _DenseParams(features=D, param_dtype=self.param_dtype,
                              name="v")(D)
        wo, bo = _DenseParams(features=D, param_dtype=self.param_dtype,
                              name="out")(D)
        wq, bq, wk, bk = _base(wq), _base(bq), _base(wk), _base(bk)
        wv, bv, wo, bo = _base(wv), _base(bv), _base(wo), _base(bo)
        if "out" in targets:
            # the packed kernel consumes wo with the pre-projection
            # activation VMEM-resident, so the `out` adapter merges into
            # the weight operand (mathematically identical to the
            # activation-space form; grads flow to a/b through the merge)
            wo = wo + _pair("out", D, D)(weight_only=True).astype(wo.dtype)
        if self.seq_axis is None and short_attn_packed_ok((B, S, 3 * D), H,
                                                          mask):
            # packed short-S path (the flagship's winning formulation,
            # RESULTS.md r3): one fused qkv matmul, rotary applied in the
            # packed (B, S, D) layout (no head split/merge transposes — the
            # layout copies were 7.1 ms/block in the flagship trace), and
            # attention + out-projection in one Pallas kernel with the
            # scores and attention output VMEM-resident
            # (ops/short_attention.py::fused_short_attention_qkv_proj).
            w_qkv = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            b_qkv = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            qkv = h @ w_qkv + b_qkv
            for i, t in enumerate(("q", "k", "v")):
                if t in targets:
                    qkv = qkv.at[..., i * D:(i + 1) * D].add(
                        _pair(t, D, D)(h))
            if os.environ.get("CLIP_DPLM_ROPE_KERNEL", "1") == "1" \
                    and Dh % 2 == 0:
                # rotary applied INSIDE the attention kernel (VPU work riding
                # a matmul-bound kernel) — the XLA formulation below rewrites
                # the whole (B, S, 3D) qkv array through HBM
                attn = packed_qkv_attention_proj(qkv, wo, bo, H, mask=mask,
                                                 rope_positions=positions)
            else:
                qr = rotary_embed_bsd(qkv[..., :D], positions, H)
                kr = rotary_embed_bsd(qkv[..., D:2 * D], positions, H)
                qkv = jnp.concatenate([qr, kr, qkv[..., 2 * D:]], axis=-1)
                attn = packed_qkv_attention_proj(qkv, wo, bo, H, mask=mask)
        else:
            q = h @ wq.astype(self.dtype) + bq.astype(self.dtype)
            k = h @ wk.astype(self.dtype) + bk.astype(self.dtype)
            v = h @ wv.astype(self.dtype) + bv.astype(self.dtype)
            if "q" in targets:
                q = q + _pair("q", D, D)(h)
            if "k" in targets:
                k = k + _pair("k", D, D)(h)
            if "v" in targets:
                v = v + _pair("v", D, D)(h)

            def heads(t):
                return t.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

            qh, kh, vh = heads(q), heads(k), heads(v)
            qh = rotary_embed(qh, positions)
            kh = rotary_embed(kh, positions)
            if self.seq_axis is not None:
                from clip_dplm_tpu.ops.ring_attention import (
                    ring_flash_attention,
                )

                attn = ring_flash_attention(qh, kh, vh, self.seq_axis,
                                            mask=mask)
            else:
                attn = attention_dispatch(qh, kh, vh, mask=mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, D)
            attn = attn @ wo.astype(self.dtype) + bo.astype(self.dtype)
        x = x + attn

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype,
                         name="ln_ffn")(x).astype(self.dtype)
        if spec is None:
            h = nn.Dense(self.ffn_mult * self.d_model, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ffn_in")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.d_model, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ffn_out")(h)
        else:
            # manual dense path (same param names/init as nn.Dense) so the
            # frozen base kernels can be stop_gradiented at use
            F = self.ffn_mult * D
            w1, b1 = _DenseParams(features=F, param_dtype=self.param_dtype,
                                  name="ffn_in")(D)
            w2, b2 = _DenseParams(features=D, param_dtype=self.param_dtype,
                                  name="ffn_out")(F)
            w1, b1, w2, b2 = _base(w1), _base(b1), _base(w2), _base(b2)
            h_in = h
            h = h @ w1.astype(self.dtype) + b1.astype(self.dtype)
            if "ffn_in" in targets:
                h = h + _pair("ffn_in", D, F)(h_in)
            h = nn.gelu(h, approximate=False)
            h_mid = h
            h = h @ w2.astype(self.dtype) + b2.astype(self.dtype)
            if "ffn_out" in targets:
                h = h + _pair("ffn_out", F, D)(h_mid)
        # NOTE (DPLM d=640 trace): XLA fuses the NEXT block's ln_attn
        # statistics into this ffn_out matmul as a kOutput fusion, picking
        # the EmitAllBatchInSublanes emitter — the 107-GFLOP matmul runs at
        # ~27% MXU (1.98 ms vs qkv's 0.44 ms at 93%). Barriering the block
        # output to split that fusion made the sampler 2x SLOWER (46.4 ->
        # 22.3 seqs/s); CLIP_DPLM_LN_FUSE_BARRIER=1 above barriers only the
        # LN input instead (residual stream untouched) for A/B.
        return x + h


class _CarryBlock(nn.Module):
    """nn.scan adapter: wraps an EsmBlock class as (carry, *broadcast) ->
    (carry, None) so a deep trunk runs as ONE compiled block scanned over
    stacked per-layer params (ESMConfig/DPLMConfig scan_layers)."""

    block: Any
    kw: tuple  # sorted (key, value) items — hashable module attribute

    @nn.compact
    def __call__(self, h, mask, positions):
        h = self.block(**dict(self.kw), name="block")(h, mask, positions)
        return h, None


def stack_esm_layers(params, num_layers: int):
    """Convert an unrolled tower param tree (layer_<i>/...) — e.g. from
    convert_esm_torch_params — to the scan_layers layout (layers/block/...
    stacked on axis 0)."""
    from clip_dplm_tpu.parallel.pipeline import stack_layer_params

    stacked = stack_layer_params(params, num_layers)
    rest = {k: v for k, v in params.items() if not k.startswith("layer_")}
    rest["layers"] = {"block": stacked}
    return rest


def unstack_esm_layers(params, num_layers: int):
    """Inverse of `stack_esm_layers`: scan_layers layout (layers/block/...
    with an (L, ...) leading axis) back to the unrolled layer_<i>/... tree
    — the layout the HF exporters and the unrolled tower consume."""
    stacked = params["layers"]["block"]
    rest = {k: v for k, v in params.items() if k != "layers"}
    for i in range(num_layers):
        rest[f"layer_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return rest


class ESMTower(nn.Module):
    """ESM-2 encoder over token ids (B, S) with (B, S) validity mask.

    Token ids follow the ESM alphabet (data/protein.py): 0=<cls>, 1=<pad>,
    2=<eos>, 32=<mask>.
    """

    cfg: ESMConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False
    # mesh axis for sequence parallelism: call inside shard_map with tokens
    # sharded (B, S_local); rotary positions, token-dropout statistics and
    # mean pooling are made global via axis_index/psum, attention rides the
    # ring kernel. Long-context scale-out beyond the reference.
    seq_axis: Optional[str] = None

    MASK_IDX: int = 32
    CLS_IDX: int = 0
    EOS_IDX: int = 2
    PAD_IDX: int = 1

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(
            c.vocab_size, c.d_model, param_dtype=self.param_dtype,
            name="embed_tokens")
        block = EsmBlock
        if self.remat:
            block = nn.remat(EsmBlock, static_argnums=())
        from clip_dplm_tpu.models.lora import spec_from
        blk_kw = dict(
            d_model=c.d_model, num_heads=c.num_heads,
            ln_eps=c.layer_norm_eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
            seq_axis=self.seq_axis,
            lora=spec_from(c),
        )
        if getattr(c, "scan_layers", False):
            # one compiled block scanned over stacked params — the
            # compile-time answer for 650M+ trunks (33 unrolled layers are
            # >30 min of XLA; the scan compiles in ~1 min). Incompatible
            # with PipelinedESMTower (which restacks layer_<i> scopes).
            self.blocks = ()
            self.scanned = nn.scan(
                _CarryBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=c.num_layers,
            )(block=block, kw=tuple(sorted(blk_kw.items())), name="layers")
        else:
            self.blocks = [
                block(**blk_kw, name=f"layer_{i}")
                for i in range(c.num_layers)
            ]
        self.final_ln = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="final_ln")

    def embed(self, tokens, mask=None, token_probs=None):
        """Everything before the block stack: token embedding (hard or soft),
        token-dropout rescaling, pad zeroing, rotary positions. Returns
        (h, mask, positions) — exposed so the GPipe driver
        (pipelined_esm_apply) can run the trunk stage-parallel."""
        c = self.cfg
        B, S = tokens.shape
        if mask is None:
            mask = tokens != self.PAD_IDX

        if token_probs is None:
            emb = self.embed_tokens(tokens).astype(jnp.float32)
        else:
            table = self.embed_tokens(
                jnp.arange(c.vocab_size)).astype(jnp.float32)
            emb = token_probs.astype(jnp.float32) @ table

        if c.token_dropout:
            # zero <mask> embeddings, rescale by observed mask ratio
            if token_probs is None:
                p_mask = (tokens == self.MASK_IDX).astype(jnp.float32)
                is_masked = (tokens == self.MASK_IDX)[..., None]
                emb = jnp.where(is_masked, 0.0, emb)
            else:
                p_mask = token_probs[..., self.MASK_IDX].astype(jnp.float32)
                # subtract the expected <mask> contribution (== zeroing in the
                # one-hot limit, smooth in between)
                mask_row = self.embed_tokens(
                    jnp.full((), self.MASK_IDX)).astype(jnp.float32)
                emb = emb - p_mask[..., None] * mask_row
            _gsum = (
                (lambda x: jax.lax.psum(x, self.seq_axis))
                if self.seq_axis is not None else (lambda x: x)
            )
            n_real = jnp.maximum(_gsum(mask.sum(axis=-1, keepdims=True)), 1)
            ratio = _gsum((p_mask * mask).sum(axis=-1, keepdims=True)) / n_real
            scale = (1.0 - _MASK_RATIO_TRAIN) / jnp.maximum(1.0 - ratio, 1e-6)
            emb = emb * scale[..., None]

        # padded positions contribute nothing downstream
        emb = jnp.where(mask[..., None], emb, 0.0)
        h = emb.astype(self.dtype)
        positions = jnp.arange(S)
        if self.seq_axis is not None:
            positions = positions + jax.lax.axis_index(self.seq_axis) * S
        return h, mask, positions

    def head(self, h, tokens, mask=None, pooling: str = "tokens"):
        """Final LayerNorm + pooling (the post-trunk stage)."""
        if mask is None:
            mask = tokens != self.PAD_IDX
        h = self.final_ln(h)
        if pooling == "tokens":
            return h
        if pooling == "mean_residues":
            # mean over real residues excluding BOS/EOS (tf nb cell 21:
            # representations[33] mean over positions 1..L)
            residue = mask & (tokens != self.CLS_IDX) & (tokens != self.EOS_IDX)
            w = residue[..., None].astype(h.dtype)
            sums, counts = (h * w).sum(axis=1), w.sum(axis=1)
            if self.seq_axis is not None:
                sums = jax.lax.psum(sums, self.seq_axis)
                counts = jax.lax.psum(counts, self.seq_axis)
            return sums / jnp.maximum(counts, 1.0)
        if pooling == "cls":
            return h[:, 0]
        raise ValueError(f"unknown pooling {pooling!r}")

    def __call__(
        self,
        tokens: jax.Array,
        mask: Optional[jax.Array] = None,
        pooling: str = "tokens",
        token_probs: Optional[jax.Array] = None,
    ) -> jax.Array:
        """`token_probs` (B, S, vocab): optional soft token distributions; the
        embedding lookup becomes probs @ table (differentiable w.r.t. probs —
        the relaxation behind soft CLIP guidance of the DPLM sampler). Exactly
        equals the hard path when probs is one-hot(tokens). `tokens` still
        supplies special-token positions for masking/pooling."""
        h, mask, positions = self.embed(tokens, mask, token_probs)
        if getattr(self.cfg, "scan_layers", False):
            h, _ = self.scanned(h, mask, positions)
        else:
            for block in self.blocks:
                h = block(h, mask, positions)
        return self.head(h, tokens, mask, pooling)


def esm_config_from_name(name: str, **overrides) -> ESMConfig:
    geom = ESM2_SIZES[name]
    return ESMConfig(name=name, **{**geom, **overrides})


def make_pipelined_esm_fn(
    cfg: ESMConfig,
    params,
    *,
    mesh,
    pipe_axis: str = "model",
    num_microbatches: Optional[int] = None,
    pooling: str = "mean_residues",
    dtype: Any = jnp.bfloat16,
    param_dtype: Any = jnp.float32,
):
    """Build the pipelined ESM forward ONCE and return a reusable jitted
    `(tokens, mask=None) -> pooled` callable: the layer stack
    (`stack_layer_params` — a full param-tree restack, 3B+ at the presets)
    and the `jit(shard_map(...))` closure are constructed here, not per
    batch — calling `pipelined_esm_apply` in a loop re-stacked and
    RECOMPILED the whole pipeline program every chunk."""
    from jax.sharding import PartitionSpec as P

    from clip_dplm_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_layer_params,
    )

    from clip_dplm_tpu.models.lora import spec_from

    tower = ESMTower(cfg=cfg, dtype=dtype, param_dtype=param_dtype)
    stacked = stack_layer_params(params, cfg.num_layers)
    block_mod = EsmBlock(
        d_model=cfg.d_model, num_heads=cfg.num_heads,
        ln_eps=cfg.layer_norm_eps, dtype=dtype, param_dtype=param_dtype,
        lora=spec_from(cfg))
    n_stages = mesh.shape[pipe_axis]
    M = num_microbatches or n_stages

    def block_fn(p_i, carry):
        h, m, pos = carry
        return (block_mod.apply({"params": p_i}, h, m, pos), m, pos)

    def inner(stacked_l, toks_r, mask_r):
        B = toks_r.shape[0]
        h, m2, pos = tower.apply(
            {"params": params}, toks_r, mask_r, method="embed")
        resh = lambda x: x.reshape((M, B // M) + x.shape[1:])
        x_micro = (resh(h), resh(m2),
                   jnp.broadcast_to(pos, (M,) + pos.shape))
        ys = pipeline_apply(block_fn, stacked_l, x_micro, axis_name=pipe_axis)
        h_out = ys[0].reshape((B,) + ys[0].shape[2:])
        return tower.apply(
            {"params": params}, h_out, toks_r, mask_r, pooling, method="head")

    jitted = jax.jit(jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(pipe_axis), P(), P()),
        out_specs=P(), check_vma=False,
    ))

    def fn(tokens: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        if tokens.shape[0] % M:
            raise ValueError(
                f"batch {tokens.shape[0]} not divisible by {M} microbatches")
        if mask is None:
            mask = tokens != ESMTower.PAD_IDX
        return jitted(stacked, tokens, mask)

    return fn


def make_pipelined_esm_train_fwd(
    cfg: ESMConfig,
    *,
    mesh,
    pipe_axis: str = "model",
    data_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
    pooling: str = "mean_residues",
    dtype: Any = jnp.bfloat16,
    param_dtype: Any = jnp.float32,
):
    """DIFFERENTIABLE pipelined ESM forward: (params, tokens, mask) -> pooled.

    Unlike `make_pipelined_esm_fn` (inference path: params baked into the
    shard_map closure), here the params enter the shard_map as arguments, so
    `jax.grad` transposes the whole pipeline — the backward schedule is the
    reversed ppermute ring — and gradients come back on the ORDINARY
    ESMTower param tree (layer_i scopes): checkpoints, the HF converter and
    the TP sharding rule stay layout-independent. The layer stack is rebuilt
    per call with `stack_layer_params` (a differentiable jnp.stack); a
    production 3B+ deployment would keep params permanently stacked and
    sharded instead — at train-step scale the restack is one fused gather.

    With `data_axis`, tokens/mask/pooled are sharded over it: dp x pp in ONE
    program (each data-shard streams its local microbatches through the
    pipe-axis ring independently). Used by the composed dp x tp x pp train
    step (parallel/composed.py) and its gradient-parity test.
    """
    from jax.sharding import PartitionSpec as P

    from clip_dplm_tpu.models.lora import spec_from
    from clip_dplm_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_layer_params,
    )

    tower = ESMTower(cfg=cfg, dtype=dtype, param_dtype=param_dtype)
    block_mod = EsmBlock(
        d_model=cfg.d_model, num_heads=cfg.num_heads,
        ln_eps=cfg.layer_norm_eps, dtype=dtype, param_dtype=param_dtype,
        lora=spec_from(cfg))
    n_stages = mesh.shape[pipe_axis]
    M = num_microbatches or n_stages
    dspec = P(data_axis) if data_axis else P()

    def block_fn(p_i, carry):
        h, m, pos = carry
        return (block_mod.apply({"params": p_i}, h, m, pos), m, pos)

    def inner(rest, stacked_l, toks_r, mask_r):
        B = toks_r.shape[0]
        h, m2, pos = tower.apply(
            {"params": rest}, toks_r, mask_r, method="embed")
        resh = lambda x: x.reshape((M, B // M) + x.shape[1:])
        x_micro = (resh(h), resh(m2),
                   jnp.broadcast_to(pos, (M,) + pos.shape))
        ys = pipeline_apply(block_fn, stacked_l, x_micro, axis_name=pipe_axis)
        h_out = ys[0].reshape((B,) + ys[0].shape[2:])
        return tower.apply(
            {"params": rest}, h_out, toks_r, mask_r, pooling, method="head")

    smapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P(pipe_axis), dspec, dspec),
        out_specs=dspec, check_vma=False,
    )

    def fwd(params, tokens: jax.Array, mask: Optional[jax.Array] = None):
        if mask is None:
            mask = tokens != ESMTower.PAD_IDX
        rest = {k: v for k, v in params.items()
                if not k.startswith("layer_")}
        stacked = stack_layer_params(params, cfg.num_layers)
        return smapped(rest, stacked, tokens, mask)

    return fwd


def pipelined_esm_apply(
    cfg: ESMConfig,
    params,
    tokens: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    mesh,
    pipe_axis: str = "model",
    num_microbatches: Optional[int] = None,
    pooling: str = "mean_residues",
    dtype: Any = jnp.bfloat16,
    param_dtype: Any = jnp.float32,
) -> jax.Array:
    """ESM forward with the block trunk pipelined over `pipe_axis` — the run
    path for the esm2_t36_3B / t48_15B presets whose trunk does not fit one
    chip. Embedding and head run replicated on every stage (tiny vs the
    trunk); the L blocks are stacked on a leading layer axis, sharded over
    the pipe axis, and microbatches stream through the GPipe ring
    (parallel/pipeline.py). Verified equal to the plain tower
    (tests/test_pipeline.py::test_pipelined_esm_apply_matches_tower).

    One-shot convenience: for repeated batches use `make_pipelined_esm_fn`
    (or `PipelinedESMTower`, which caches it) — this function rebuilds the
    layer stack and the jitted pipeline program on every call.
    """
    return make_pipelined_esm_fn(
        cfg, params, mesh=mesh, pipe_axis=pipe_axis,
        num_microbatches=num_microbatches, pooling=pooling, dtype=dtype,
        param_dtype=param_dtype,
    )(tokens, mask)


class PipelinedESMTower:
    """ESMTower with the block trunk pipelined over a mesh axis — the
    feature-level wrapper around pipelined_esm_apply for the esm2_t36_3B /
    t48_15B presets (triple_flow/1_config.py:152-183, named but never run by
    the single-GPU reference).

    Checkpoint layout: the param tree is IDENTICAL to ESMTower's (layer_i
    scopes; the stacked (L/P, ...) pipeline layout is derived per call by
    stack_layer_params), so Orbax checkpoints, convert_esm_torch_params
    output and the TP sharding rule all apply unchanged — a tower trained or
    converted anywhere runs pipelined by swapping the wrapper.

        tower = PipelinedESMTower(cfg, mesh=mesh, pipe_axis="model")
        params = tower.init(rng, tokens)["params"]     # == ESMTower.init
        pooled = tower.apply({"params": params}, tokens, mask,
                             pooling="mean_residues")
    """

    def __init__(self, cfg: ESMConfig, *, mesh, pipe_axis: str = "model",
                 num_microbatches: Optional[int] = None,
                 dtype: Any = jnp.bfloat16, param_dtype: Any = jnp.float32):
        n_stages = mesh.shape[pipe_axis]
        if cfg.num_layers % n_stages:
            raise ValueError(
                f"num_layers={cfg.num_layers} not divisible by "
                f"{n_stages} pipeline stages over axis {pipe_axis!r}")
        self.cfg = cfg
        self.mesh = mesh
        self.pipe_axis = pipe_axis
        self.num_microbatches = num_microbatches
        self.dtype = dtype
        self.param_dtype = param_dtype
        self._tower = ESMTower(cfg=cfg, dtype=dtype, param_dtype=param_dtype)
        # one-slot memo: the layer restack and the jit(shard_map) program
        # are built once per (params, pooling) and reused across batches
        self._fn_key = None
        self._fn = None

    def init(self, rng, tokens, mask=None):
        return self._tower.init(rng, tokens, mask)

    def apply(self, variables, tokens, mask=None, *,
              pooling: str = "mean_residues"):
        key = (id(variables["params"]), pooling)
        if self._fn_key != key:
            self._fn = make_pipelined_esm_fn(
                self.cfg, variables["params"],
                mesh=self.mesh, pipe_axis=self.pipe_axis,
                num_microbatches=self.num_microbatches, pooling=pooling,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )
            self._fn_key = key
        return self._fn(tokens, mask)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_esm_torch_params(state_dict: Dict[str, Any], cfg: ESMConfig):
    """Convert an HF `EsmModel` state_dict (rotary variant — the real ESM-2
    layout) into ESMTower flax params. Tensors arrive as torch tensors or
    numpy arrays; returns a flax params dict (fp32).

    HF layout reference: transformers.models.esm.modeling_esm
    (embeddings.word_embeddings, encoder.layer.N.attention.self.{query,key,
    value}, attention.output.dense, attention.LayerNorm [pre-attn LN],
    intermediate.dense, output.dense, LayerNorm [pre-ffn LN],
    encoder.emb_layer_norm_after).
    """
    import numpy as np

    def get(key):
        t = state_dict[key]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                          dtype=np.float32)

    def dense(prefix):
        return {"kernel": get(f"{prefix}.weight").T, "bias": get(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": get("embeddings.word_embeddings.weight")},
        "final_ln": ln("encoder.emb_layer_norm_after"),
    }
    for i in range(cfg.num_layers):
        hf = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "ln_attn": ln(f"{hf}.attention.LayerNorm"),
            "q": dense(f"{hf}.attention.self.query"),
            "k": dense(f"{hf}.attention.self.key"),
            "v": dense(f"{hf}.attention.self.value"),
            "out": dense(f"{hf}.attention.output.dense"),
            "ln_ffn": ln(f"{hf}.LayerNorm"),
            "ffn_in": dense(f"{hf}.intermediate.dense"),
            "ffn_out": dense(f"{hf}.output.dense"),
        }
    return params


def export_esm_torch_params(params, cfg: ESMConfig) -> Dict[str, Any]:
    """Inverse of convert_esm_torch_params: ESMTower flax params -> an HF
    `EsmModel` state_dict (numpy fp32, HF key layout) so towers trained or
    LoRA-merged here (models/lora.py::merge_lora) publish back to the HF
    ecosystem. Roundtrip is exact
    (test_esm::test_export_roundtrips_converter); load with
    `model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
    strict=False)` (strict=False: HF carries rotary inv_freq buffers and a
    contact head this tower does not own). scan_layers trees (stacked
    layers/block layout) are unstacked transparently.
    """
    import numpy as np

    if "layers" in params and "layer_0" not in params:
        params = unstack_esm_layers(params, cfg.num_layers)

    def arr(x):
        return np.asarray(x, dtype=np.float32)

    def dense(prefix, leaf):
        return {f"{prefix}.weight": arr(leaf["kernel"]).T,
                f"{prefix}.bias": arr(leaf["bias"])}

    def ln(prefix, leaf):
        return {f"{prefix}.weight": arr(leaf["scale"]),
                f"{prefix}.bias": arr(leaf["bias"])}

    sd: Dict[str, Any] = {
        "embeddings.word_embeddings.weight":
            arr(params["embed_tokens"]["embedding"]),
    }
    sd.update(ln("encoder.emb_layer_norm_after", params["final_ln"]))
    for i in range(cfg.num_layers):
        blk = params[f"layer_{i}"]
        if any(k.endswith("_lora") for k in blk):
            raise ValueError(
                "param tree still carries LoRA adapters — fold them with "
                "models/lora.py::merge_lora before exporting")
        hf = f"encoder.layer.{i}"
        sd.update(ln(f"{hf}.attention.LayerNorm", blk["ln_attn"]))
        sd.update(dense(f"{hf}.attention.self.query", blk["q"]))
        sd.update(dense(f"{hf}.attention.self.key", blk["k"]))
        sd.update(dense(f"{hf}.attention.self.value", blk["v"]))
        sd.update(dense(f"{hf}.attention.output.dense", blk["out"]))
        sd.update(ln(f"{hf}.LayerNorm", blk["ln_ffn"]))
        sd.update(dense(f"{hf}.intermediate.dense", blk["ffn_in"]))
        sd.update(dense(f"{hf}.output.dense", blk["ffn_out"]))
    return sd
