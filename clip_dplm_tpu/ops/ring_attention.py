"""Ring flash attention — context/sequence parallelism over a mesh axis.

Scale-out extension beyond the reference (which is single-GPU attention,
rna nb cell 28 / tf nb cell 41): the sequence axis is sharded over the mesh;
each device keeps its query shard while K/V shards travel a `ppermute` ring.
Every ring step runs the local Pallas flash kernel (ops/flash_attention.py)
against the currently-held K/V shard and folds the result into the running
online-softmax state `(out, lse)` — the permute has no data dependence on the
step's compute, so the scheduler overlaps ICI with the kernel. The backward
rides the same ring: dK/dV accumulators TRAVEL WITH their shard and arrive
home complete, dQ accumulates locally (same pattern as
ops/fused_infonce.ring_fused_symmetric_infonce).

Semantics == full-sequence flash_attention on the gathered sequence
(tests/test_ring_attention.py), with peak memory O(S_local) per device.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from clip_dplm_tpu.ops.flash_attention import (
    NEG_INF,
    _flash_bwd,
    _flash_fwd,
    _round_up,
)


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _xla_partial_attention(q, k, v, bias, scale):
    """(out, lse) of one K/V shard in plain XLA — the non-TPU ring core and
    the reference the Pallas path must match. Differentiable, so the XLA ring
    needs no custom VJP (ppermute/scan transpose rules compose)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias[:, :, None, :]  # (B, 1, Sk) -> broadcast over H, Sq
    lse = jax.nn.logsumexp(s, axis=-1, keepdims=True)  # (B, H, Sq, 1)
    p = jnp.exp(s - lse)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return out, lse


def _combine(o, lse, o_t, lse_t):
    """Fold a new partial-attention block into the running online-softmax
    state. All-masked shards produce lse_t ~ -1e30 and drop out exactly."""
    new_lse = jnp.logaddexp(lse, lse_t)
    w = jnp.exp(lse - new_lse)
    w_t = jnp.exp(lse_t - new_lse)
    return o * w + o_t.astype(jnp.float32) * w_t, new_lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _ring_core(q, k, v, bias, axis_name, scale, block_q, block_k):
    out, _ = _ring_fwd(q, k, v, bias, axis_name, scale, block_q, block_k)
    return out


def _ring_fwd(q, k, v, bias, axis_name, scale, block_q, block_k):
    n = jax.lax.axis_size(axis_name)
    perm = _ring_perm(n)
    B, H, S, Dh = q.shape
    o0 = jnp.zeros((B, H, S, Dh), jnp.float32)
    lse0 = jnp.full((B, H, S, 1), NEG_INF, jnp.float32)

    def step(carry, _):
        k_cur, v_cur, bias_cur, o, lse = carry
        o_t, lse_t = _flash_fwd(
            q, k_cur, v_cur, bias_cur,
            block_q=block_q, block_k=block_k, scale=scale)
        o, lse = _combine(o, lse, o_t, lse_t)
        k_cur, v_cur, bias_cur = jax.lax.ppermute(
            (k_cur, v_cur, bias_cur), axis_name, perm)
        return (k_cur, v_cur, bias_cur, o, lse), None

    (k_home, v_home, bias_home, o, lse), _ = jax.lax.scan(
        step, (k, v, bias, o0, lse0), None, length=n)
    out = o.astype(q.dtype)
    return out, (q, k, v, bias, out, lse)


def _ring_bwd(axis_name, scale, block_q, block_k, res, do):
    q, k, v, bias, out, lse = res
    n = jax.lax.axis_size(axis_name)
    perm = _ring_perm(n)

    def step(carry, _):
        k_cur, v_cur, bias_cur, dk_cur, dv_cur, dq_acc = carry
        dq_t, dk_t, dv_t = _flash_bwd(
            q, k_cur, v_cur, bias_cur, out, lse, do,
            block_q=block_q, block_k=block_k, scale=scale)
        dq_acc = dq_acc + dq_t.astype(jnp.float32)
        dk_cur = dk_cur + dk_t.astype(jnp.float32)
        dv_cur = dv_cur + dv_t.astype(jnp.float32)
        k_cur, v_cur, bias_cur, dk_cur, dv_cur = jax.lax.ppermute(
            (k_cur, v_cur, bias_cur, dk_cur, dv_cur), axis_name, perm)
        return (k_cur, v_cur, bias_cur, dk_cur, dv_cur, dq_acc), None

    zeros_kv = jnp.zeros(k.shape, jnp.float32)
    (k_home, v_home, bias_home, dk, dv, dq), _ = jax.lax.scan(
        step,
        (k, v, bias, zeros_kv, jnp.zeros(v.shape, jnp.float32),
         jnp.zeros(q.shape, jnp.float32)),
        None, length=n)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_ring_core.defvjp(_ring_fwd, _ring_bwd)


def _ring_xla(q, k, v, bias, axis_name, scale):
    """Plain-XLA ring (non-TPU fallback and CI reference): same schedule and
    combine as the Pallas path, autodiff supplies the backward."""
    n = jax.lax.axis_size(axis_name)
    perm = _ring_perm(n)
    B, H, S, Dh = q.shape
    o0 = jnp.zeros((B, H, S, Dh), jnp.float32)
    lse0 = jnp.full((B, H, S, 1), NEG_INF, jnp.float32)

    def step(carry, _):
        k_cur, v_cur, bias_cur, o, lse = carry
        o_t, lse_t = _xla_partial_attention(q, k_cur, v_cur, bias_cur, scale)
        o, lse = _combine(o, lse, o_t, lse_t)
        k_cur, v_cur, bias_cur = jax.lax.ppermute(
            (k_cur, v_cur, bias_cur), axis_name, perm)
        return (k_cur, v_cur, bias_cur, o, lse), None

    (_, _, _, o, _), _ = jax.lax.scan(step, (k, v, bias, o0, lse0), None,
                                      length=n)
    return o.astype(q.dtype)


def ring_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Sequence-parallel flash attention inside shard_map.

    q, k, v: (B, H, S_local, Dh) — the LOCAL shard of a sequence sharded over
    `axis_name` (all shards equal length; pad globally first). `mask`:
    (B, S_local) validity of the local keys. Returns the local output shard.

    On TPU the per-step core is the Pallas flash kernel (custom ring VJP);
    elsewhere a plain-XLA core with the identical ring schedule (autodiff
    backward) — same dispatch rule as ops/attention.attention_dispatch.
    """
    B, H, S, Dh = q.shape
    if scale is None:
        scale = 1.0 / (Dh**0.5)
    if use_flash is None:
        use_flash = _on_tpu()

    if mask is None:
        mask = jnp.ones((B, S), dtype=bool)

    if not use_flash:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
        return _ring_xla(q, k, v, bias, axis_name, float(scale))

    if block_q is None:
        block_q = min(_round_up(S, 128), 512)
    if block_k is None:
        block_k = min(_round_up(S, 128), 1024)

    Sp = _round_up(S, block_q)
    Skp = _round_up(S, block_k)
    Dp = _round_up(Dh, 128)

    bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    if Skp != S:
        bias = jnp.pad(bias, ((0, 0), (0, Skp - S)), constant_values=NEG_INF)
    bias = bias[:, None, :]  # (B, 1, Skp)

    def pad_qkv(x, St):
        pads = [(0, 0), (0, 0), (0, St - x.shape[2]), (0, Dp - Dh)]
        return jnp.pad(x, pads) if any(p[1] for p in pads) else x

    qp, kp, vp = pad_qkv(q, Sp), pad_qkv(k, Skp), pad_qkv(v, Skp)
    out = _ring_core(qp, kp, vp, bias, axis_name, float(scale),
                     block_q, block_k)
    return out[:, :, :S, :Dh]
