"""Pallas TPU flash attention (forward + backward), padding-mask aware.

MXU-tiled blockwise attention with online softmax: never materializes the
S x S score matrix in HBM. This is the TPU-native replacement for the cuDNN
attention the reference used via `nn.TransformerEncoderLayer` (rna nb cell 28,
tf nb cell 41) — see SURVEY.md section 2.6 row 1.

Design:
  * grid (B, H, nq, nk) with the key-block axis innermost; scratch carries the
    running max / normalizer / accumulator across key blocks, output written
    on the last key block (canonical TPU accumulation pattern).
  * key-padding mask enters as an additive f32 bias row (0 / -1e30), matching
    the NaN-pad -> boolean-mask convention at the data boundary.
  * forward also emits per-row logsumexp stats; backward recomputes
    probabilities blockwise (no stored S x S matrix) in two kernels: dq over
    (q-block outer, k-block inner) and dk/dv over (k-block outer, q-block
    inner).
  * head_dim is zero-padded to a lane multiple (128) by the wrapper — softmax
    is invariant to zero-padded channels.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _diag_bias(iq, ik, bq, bk, diag_block: int):
    """Additive block-diagonal bias: rows and keys attend only within the
    same `diag_block`-sized group (grouped short-sequence attention packs G
    independent (batch, head) pairs into one G*S-row attention)."""
    row = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    same = (row // diag_block) == (col // diag_block)
    return jnp.where(same, 0.0, NEG_INF).astype(jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale: float, nk: int,
                diag_block: int = 0):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # (bq, dh)
    k = k_ref[0, 0]  # (bk, dh)
    v = v_ref[0, 0]  # (bk, dh)
    bias = bias_ref[0]  # (1, bk) f32 additive key bias

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)
    s = s + bias  # broadcast (1, bk) over rows
    if diag_block:
        s = s + _diag_bias(iq, ik, s.shape[0], s.shape[1], diag_block)

    m_prev = m_scr[:, 0:1]  # (bq, 1)
    l_prev = l_scr[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # (bq, 1)
    p = jnp.exp(s - m_new)  # (bq, bk) f32
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _():
        l = l_scr[:, 0:1]
        safe_l = jnp.maximum(l, 1e-30)
        out_ref[0, 0] = (acc_scr[:] / safe_l).astype(out_ref.dtype)
        # logsumexp per row; rows with all keys masked get NEG_INF-ish stats
        lse_ref[0, 0] = m_scr[:, 0:1] + jnp.log(safe_l)


def _flash_fwd(q, k, v, bias, *, block_q: int, block_k: int,
               scale: float, diag_block: int = 0) -> Tuple[jax.Array, jax.Array]:
    B, H, S, Dh = q.shape
    Sk = k.shape[2]
    nq = pl.cdiv(S, block_q)
    nk = pl.cdiv(Sk, block_k)

    grid = (B, H, nq, nk)
    kernel = functools.partial(_fwd_kernel, scale=scale, nk=nk,
                               diag_block=diag_block)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, iq, ik: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, iq, ik: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, iq, ik: (b, 0, ik)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, iq, ik: (b, h, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
    )(q, k, v, bias)
    return out, lse


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_scr, *, scale: float, nk: int,
                   diag_block: int = 0):
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (bq, 1)
    delta = delta_ref[0, 0]  # (bq, 1) rowsum(dO * O)
    bias = bias_ref[0]  # (1, bk)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias
    if diag_block:
        s = s + _diag_bias(iq, ik, s.shape[0], s.shape[1], diag_block)
    p = jnp.exp(s - lse)  # (bq, bk)
    dp = jax.lax.dot_general(
        do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    ds = p * (dp - delta) * scale
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float, nq: int,
                    diag_block: int = 0):
    ik, iq = pl.program_id(2), pl.program_id(3)

    @pl.when(iq == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]  # (bq, dh)
    k = k_ref[0, 0]  # (bk, dh)
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)  # (bq, dh)
    lse = lse_ref[0, 0]  # (bq, 1)
    delta = delta_ref[0, 0]  # (bq, 1)
    bias = bias_ref[0]  # (1, bk)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias  # (bq, bk)
    if diag_block:
        s = s + _diag_bias(iq, ik, s.shape[0], s.shape[1], diag_block)
    p = jnp.exp(s - lse)
    # dv += p^T @ dO
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * scale  # (bq, bk)
    # dk += ds^T @ q
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, bias, out, lse, do, *, block_q: int, block_k: int,
               scale: float, diag_block: int = 0):
    B, H, S, Dh = q.shape
    Sk = k.shape[2]
    nq = pl.cdiv(S, block_q)
    nk = pl.cdiv(Sk, block_k)

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B, H, S, 1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk,
                          diag_block=diag_block),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, iq, ik: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, iq, ik: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, iq, ik: (b, 0, ik)),
            pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, iq, ik: (b, h, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, iq, ik: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, Dh), jnp.float32)],
    )(q, k, v, bias, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq,
                          diag_block=diag_block),
        grid=(B, H, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, ik, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, ik, iq: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, ik, iq: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, ik, iq: (b, 0, ik)),
            pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, ik, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, ik, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, ik, iq: (b, h, iq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, ik, iq: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, ik, iq: (b, h, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sk, Dh), k.dtype),
            jax.ShapeDtypeStruct((B, H, Sk, Dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, Dh), jnp.float32),
            pltpu.VMEM((block_k, Dh), jnp.float32),
        ],
    )(q, k, v, bias, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention_core(q, k, v, bias, scale, block_q, block_k,
                          diag_block=0):
    out, _ = _flash_fwd(q, k, v, bias, block_q=block_q, block_k=block_k,
                        scale=scale, diag_block=diag_block)
    return out


def _core_fwd(q, k, v, bias, scale, block_q, block_k, diag_block=0):
    out, lse = _flash_fwd(q, k, v, bias, block_q=block_q, block_k=block_k,
                          scale=scale, diag_block=diag_block)
    return out, (q, k, v, bias, out, lse)


def _core_bwd(scale, block_q, block_k, diag_block, residuals, do):
    q, k, v, bias, out, lse = residuals
    dq, dk, dv = _flash_bwd(
        q, k, v, bias, out, lse, do, block_q=block_q, block_k=block_k,
        scale=scale, diag_block=diag_block
    )
    return dq, dk, dv, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    diag_block: int = 0,
) -> jax.Array:
    """Flash attention over (B, H, S, Dh) with optional (B, S) key mask
    (True = real token). Pads S to the block size and Dh to the 128 lane
    width; zero-padded channels do not perturb the softmax, padded keys are
    masked with -1e30 bias, padded queries are sliced away.

    Default block sizes are tuned on v5e: large q/k blocks win while the
    working set fits VMEM (measured 2x over 128x128 tiling at S=1024)."""
    B, H, S, Dh = q.shape
    Sk = k.shape[2]
    if scale is None:
        scale = 1.0 / (Dh**0.5)  # scale from the *unpadded* head dim
    if block_q is None:
        block_q = min(_round_up(S, 128), 512)
    if block_k is None:
        block_k = min(_round_up(Sk, 128), 1024)

    Sp = _round_up(S, block_q)
    Skp = _round_up(Sk, block_k)
    Dp = _round_up(Dh, 128)

    if mask is None:
        mask = jnp.ones((B, Sk), dtype=bool)
    bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    if Skp != Sk:
        bias = jnp.pad(bias, ((0, 0), (0, Skp - Sk)), constant_values=NEG_INF)
    bias = bias[:, None, :]  # (B, 1, Skp) — TPU block rule: trailing dims (1, Sk)

    def pad_qkv(x, St):
        pads = [(0, 0), (0, 0), (0, St - x.shape[2]), (0, Dp - Dh)]
        return jnp.pad(x, pads) if any(p[1] for p in pads) else x

    qp, kp, vp = pad_qkv(q, Sp), pad_qkv(k, Skp), pad_qkv(v, Skp)
    out = _flash_attention_core(qp, kp, vp, bias, float(scale), block_q,
                                block_k, diag_block)
    return out[:, :, :S, :Dh]

