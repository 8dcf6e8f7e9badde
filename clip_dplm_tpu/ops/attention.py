"""Attention ops.

`multihead_attention` is the single entry point every tower uses. On TPU with
MXU-aligned shapes it dispatches to the Pallas flash-attention kernel
(ops/flash_attention.py); otherwise it falls back to a fused-by-XLA reference
implementation with an fp32 softmax.

Replaces the cuDNN attention the reference gets via
`nn.TransformerEncoderLayer` / `nn.MultiheadAttention` (rna nb cell 28, tf nb
cell 41, tong/models/encoders/perturbation_encoder.py:31-37).

Masking convention: `mask` is a boolean array of shape (B, S) — True = real
token, False = padding — matching `create_padding_mask` of rna nb cell 24
(`~isnan(x).any(-1)`), converted from NaN-padding to explicit masks at the
data boundary.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Softmax attention, fp32 accumulation.

    q,k,v: (B, H, S, D); mask: (B, S) key-validity or (B, 1, S, S) full mask.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        if mask.ndim == 2:  # key padding mask (B, S)
            bias = jnp.where(mask[:, None, None, :], 0.0, _NEG_INF)
        else:
            bias = jnp.where(mask, 0.0, _NEG_INF)
        logits = logits + bias
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, S, D = x.shape
    return x.reshape(B, S, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    B, H, S, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _flash_min_seq() -> int:
    """Key-count threshold for routing to the Pallas flash kernel (measured
    crossover vs XLA's fused attention on v5e: ~256 keys at small batch).
    Override with CLIP_DPLM_FLASH_MIN_SEQ for shape regimes where the
    batched-small-matmul XLA path degrades (e.g. very large B*H at short S)."""
    import os

    try:
        return int(os.environ.get("CLIP_DPLM_FLASH_MIN_SEQ", 256))
    except ValueError:  # pragma: no cover
        return 256


def attention_dispatch(
    qh: jax.Array,
    kh: jax.Array,
    vh: jax.Array,
    mask: Optional[jax.Array] = None,
    use_flash: Optional[bool] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Head-level dispatch over (B, H, S, Dh): Pallas flash kernel on TPU,
    XLA reference otherwise. Used directly by towers that transform q/k per
    head before attention (e.g. ESM rotary embeddings)."""
    seq_k = kh.shape[2]
    # the flash wrapper pads seq to block multiples and head_dim to the lane
    # width itself, so the only dispatch requirements are a TPU backend, a
    # key-padding (2D) mask, and enough keys that blockwise attention wins
    # over XLA's fused path (measured crossover on v5e: ~256 keys).
    flash_ok = (
        _on_tpu() and seq_k >= _flash_min_seq()
        and (mask is None or mask.ndim == 2)
    )
    auto = use_flash is None
    if auto:
        use_flash = flash_ok
    if use_flash and flash_ok:
        from clip_dplm_tpu.ops.flash_attention import flash_attention

        return flash_attention(qh, kh, vh, mask=mask, scale=scale)
    # short self-attention at the head level (e.g. ESM rotary towers at
    # S < the flash crossover): same fused kernel, bhsd blocks
    if (
        auto
        and _on_tpu()
        and _short_attn_enabled()
        and qh.shape == kh.shape == vh.shape
        and _short_attn_min_seq() <= seq_k < _flash_min_seq()
        and qh.shape[-1] % 8 == 0
        and (mask is None or mask.ndim == 2)
    ):
        from clip_dplm_tpu.ops.short_attention import (
            fused_short_attention_heads,
        )

        return fused_short_attention_heads(qh, kh, vh, mask=mask,
                                           scale=scale,
                                           block_b=_short_attn_g())
    return attention_reference(qh, kh, vh, mask=mask, scale=scale)


def _short_attn_enabled() -> bool:
    """Fused short-S multi-head kernel (ops/short_attention.py) below the
    flash crossover. CLIP_DPLM_SHORT_ATTN=0 opts out (falls back to XLA's
    batched formulation)."""
    import os

    return os.environ.get("CLIP_DPLM_SHORT_ATTN", "1") == "1"


def _short_attn_min_seq() -> int:
    """Lower sequence bound for the short-S kernel (default 64, measured).

    Tiny S is supported by the kernel since r5 (S pads to the 16-row
    sublane tile, ops/short_attention.py::_seq_pad) but stays OFF by
    default: at the tf_clip perturbation-tower shape (B=4096, S=10,
    D=512) routing the per-head loop kernel there measured 82.8 vs 70.2
    ms on the full 3-way step — G x H tiny (16,64)x(64,16) dots are MXU
    instruction-bound (r5 A/B, RESULTS.md dead end). Override with
    CLIP_DPLM_SHORT_ATTN_MIN_SEQ for shape experiments."""
    import os

    try:
        return int(os.environ.get("CLIP_DPLM_SHORT_ATTN_MIN_SEQ", 64))
    except ValueError:  # pragma: no cover
        return 64


def _tiny_attn_enabled() -> bool:
    """Packed-diagonal tiny-S attention kernel (S < 64):
    ops/short_attention.py::fused_tiny_attention_proj. CLIP_DPLM_TINY_ATTN=0
    opts out (falls back to XLA's batched formulation)."""
    import os

    return os.environ.get("CLIP_DPLM_TINY_ATTN", "1") == "1"


def tiny_attn_ok(qkv_shape, num_heads: int, mask) -> bool:
    """True when the packed-diagonal tiny-S kernel handles this (B, S, 3D)
    shape: 2 <= S < 64 (S=1 attention is a trivial XLA fusion; >= 64 is the
    per-head short-S kernel's regime)."""
    S, D3 = qkv_shape[1], qkv_shape[2]
    if D3 % 3:
        return False
    D = D3 // 3
    return (
        _on_tpu()
        and _tiny_attn_enabled()
        and 2 <= S < 64
        and D % num_heads == 0
        and (D // num_heads) % 8 == 0
        and (mask is None or mask.ndim == 2)
    )


def packed_tiny_attention_proj(
    qkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Tiny-S packed attention with the out-projection fused (caller must
    have checked tiny_attn_ok)."""
    from clip_dplm_tpu.ops.short_attention import fused_tiny_attention_proj

    return fused_tiny_attention_proj(qkv, wo, bo, num_heads, mask=mask)


def short_attn_packed_ok(qkv_shape, num_heads: int, mask) -> bool:
    """True when the packed short-S kernel handles this (B, S, 3D) shape."""
    S, D3 = qkv_shape[1], qkv_shape[2]
    if D3 % 3:
        return False
    D = D3 // 3
    return (
        _on_tpu()
        and _short_attn_enabled()
        and _short_attn_min_seq() <= S < _flash_min_seq()
        and D % num_heads == 0
        and (D // num_heads) % 8 == 0
        and (mask is None or mask.ndim == 2)
    )


def _short_attn_g() -> int:
    import os

    return int(os.environ.get("CLIP_DPLM_SHORT_ATTN_G", "8"))


def cls_query_attention(
    qkv: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention output for query row 0 ONLY, from packed (B, S, 3D) qkv.

    With one query per head the (S, S) score matrix collapses to a single
    row: scores and the weighted value sum are rank-1 multiply-reduce
    contractions (VPU-shaped work) — no score tensor in HBM, no attention
    kernel, and the backward is the same shapes mirrored. Semantics match
    `multihead_attention(q, k, v)[:, :1]` exactly (same scale, mask bias,
    f32 softmax, f32-accumulated value sum — attention_reference above).
    Used by TransformerBlock when `out_rows == 1` (last-block CLS
    truncation): computing all S query rows and slicing wastes a full
    attention fwd+bwd (~5.6 ms/tower-block at flagship geometry).

    On TPU this routes to the head-batched mask-contraction Pallas kernel
    (ops/short_attention.py::fused_cls_attention) — the XLA formulation
    below spends ~10 ms/step in relayout copies at flagship geometry."""
    B, S, D3 = qkv.shape
    D = D3 // 3
    Dh = D // num_heads
    # the kernel's head-mask matrices cover at most 128 head columns (the
    # lane width); beyond that, fall through to the XLA formulation
    if num_heads <= 128 and short_attn_packed_ok(qkv.shape, num_heads, mask):
        from clip_dplm_tpu.ops.short_attention import fused_cls_attention

        return fused_cls_attention(qkv, num_heads, mask=mask,
                                   block_b=_short_attn_g())
    q0 = qkv[:, 0, :D].reshape(B, num_heads, 1, Dh)
    k = qkv[:, :, D:2 * D].reshape(B, S, num_heads, Dh)
    v = qkv[:, :, 2 * D:].reshape(B, S, num_heads, Dh)
    logits = jnp.einsum(
        "bhqd,bshd->bhqs", q0, k, preferred_element_type=jnp.float32
    ) * (1.0 / (Dh ** 0.5))
    if mask is not None:
        if mask.ndim == 2:  # key padding mask (B, S)
            logits = logits + jnp.where(mask[:, None, None, :], 0.0,
                                        _NEG_INF)
        else:  # full (B, 1, S, S) mask — keep its query-0 row, as
            # attention_reference + slice would
            logits = logits + jnp.where(mask[:, :, :1, :], 0.0, _NEG_INF)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqs,bshd->bqhd", w.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype).reshape(B, 1, D)


def packed_qkv_attention_proj(
    qkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    rope_positions: Optional[jax.Array] = None,
) -> jax.Array:
    """Packed attention with the out-projection fused into the kernel
    (caller must have checked short_attn_packed_ok). rope_positions applies
    ESM rotate-half RoPE to q/k inside the kernel."""
    from clip_dplm_tpu.ops.short_attention import (
        fused_short_attention_qkv_proj,
    )

    return fused_short_attention_qkv_proj(
        qkv, wo, bo, num_heads, mask=mask, block_b=_short_attn_g(),
        rope_positions=rope_positions)


def multihead_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Multi-head self/cross attention over (B, S, D) inputs."""
    S, D = q.shape[1], q.shape[2]
    # short self-attention: the fused multi-head kernel consumes the (B,S,D)
    # layout directly — no head split/merge transposes, Dh unpadded, scores
    # VMEM-only, single-kernel backward (ops/short_attention.py)
    if (
        use_flash is None
        and _on_tpu()
        and _short_attn_enabled()
        and q.shape == k.shape == v.shape
        and _short_attn_min_seq() <= S < _flash_min_seq()  # pads S to 128; tiny S stays on XLA
        and D % num_heads == 0
        and (D // num_heads) % 8 == 0
        and (mask is None or mask.ndim == 2)
    ):
        import os

        from clip_dplm_tpu.ops.short_attention import fused_short_attention

        layout = os.environ.get("CLIP_DPLM_SHORT_ATTN_LAYOUT", "bsd")
        return fused_short_attention(q, k, v, num_heads, mask=mask,
                                     layout=layout)
    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    out = attention_dispatch(qh, kh, vh, mask=mask, use_flash=use_flash)
    return _merge_heads(out)
