"""Pallas TPU fused multi-head attention for SHORT sequences (S <= ~256).

The flagship token-transformer (rna nb cell 28: S=128, H=8, Dh=64) is exactly
the regime where both standard formulations lose on TPU:

  * XLA's batched path lowers to B*H tiny (S, Dh) x (Dh, S) matmuls and
    materializes the (B, H, S, S) scores in HBM — measured ~8x over the
    attention flop floor at S=128/Dh=64 on v5e (RESULTS.md r2);
  * the flash kernel (ops/flash_attention.py) runs one program per (b, h)
    pair — 8k programs of ~4 us of work — and its wrapper pads Dh 64 -> 128
    in HBM, doubling q/k/v traffic (both measured slower, RESULTS.md r2).

This kernel processes G whole batch rows per program, ALL heads unrolled
in-register; scores never leave VMEM, Dh stays unpadded, and S fits one key
block, so the softmax needs no online rescaling and the BACKWARD collapses to
a single kernel that recomputes the (S, S) probabilities (bit-identical max/
normalizer) and emits dq, dk, dv together — no lse/delta residuals at all.

Two block layouts (measured on v5e, scripts/tpu_short_attn_probe.py):
  * layout='bsd' (the DISPATCH DEFAULT): blocks are (G, S, D), heads are
    lane-offset slices — zero XLA-side relayout. ISOLATED, the in-kernel
    lane rotates make it slower than bhsd (4.5 vs 3.6 ms at the flagship
    shape), but IN-MODEL it wins: XLA's head-split transposes around the
    bhsd entry cost more than the rotates save (RESULTS.md r3 — keep the
    default unless the in-model A/B says otherwise for your geometry).
  * layout='bhsd': blocks are (G, H, S, Dh) — per-head slices are native
    sublane-tiled (S, Dh) arrays; the wrapper takes (B, S, D) and lets XLA
    produce the head-split layout. Fastest standalone; the split/merge
    relayout bills elsewhere in the model.

Masking: (B, S) key-validity (True = real token), same convention as
ops/attention.py. Fully-padded rows produce zeros (normalizer clamped).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _vmem_params(q, G, n_bufs):
    """Raise the scoped-VMEM limit above Mosaic's 16 MB default when the
    blocks need it: a (G, H, S, Dh=64) block is lane-PADDED to 128 in VMEM,
    so its footprint is 2x its HBM bytes; n_bufs blocks double-buffered.
    v5e has far more physical VMEM than the 16 MB default limit."""
    H = q.shape[1] if q.ndim == 4 else 1
    S = q.shape[-2]
    Dh_pad = _round_up(q.shape[-1], 128)
    per_buf = G * H * S * Dh_pad * q.dtype.itemsize
    need = int(2.2 * n_bufs * per_buf) + 4 * 2**20  # + scores/slack
    if need <= 15 * 2**20:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need, 110 * 2**20))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seq_pad(S: int) -> int:
    """Padded sequence length. At the measured >=64 regime S rounds to 128
    (the original design point). Below it, round to the bf16 sublane tile
    (16): a 10-token sequence (the tf_clip perturbation tower's top-DEG
    tokens, tf nb cell 41) pads 10 -> 16 (1.6x) instead of 10 -> 128
    (12.8x). NOTE: tiny-S support is correct (parity tests) but the
    per-head-loop kernels LOSE to XLA there (G x H tiny dots are MXU
    instruction-bound; measured 82.8 vs 70.2 ms on the tf_clip step, r5
    dead end) — the dispatch default keeps tiny S on XLA
    (ops/attention.py::_short_attn_min_seq)."""
    return _round_up(S, 128) if S >= 64 else max(16, _round_up(S, 16))


def _rows_per_program(block_b: int, B: int, Sp: int) -> int:
    """Rows per program, scaled up for short padded lengths so per-program
    work stays amortized (each program runs G x H head bodies of (Sp, Sp)
    math; at Sp=16 a G=8 program would be ~64x smaller than at Sp=128)."""
    g = block_b * max(1, 128 // Sp)
    return max(1, min(g, B))


# ---------------------------------------------------------------------------
# kernels (layout-generic: refs are (G, S, D) for 'bsd', (G, H, S, Dh) for
# 'bhsd'; bias is (G, 1, S) either way)
# ---------------------------------------------------------------------------


def _get_h(ref, g, h, heads, layout):
    if layout == "bhsd":
        return ref[g, h]
    Dh = ref.shape[-1] // heads
    return ref[g, :, h * Dh:(h + 1) * Dh]


def _put_h(ref, g, h, heads, layout, val):
    if layout == "bhsd":
        ref[g, h] = val.astype(ref.dtype)
    else:
        Dh = ref.shape[-1] // heads
        ref[g, :, h * Dh:(h + 1) * Dh] = val.astype(ref.dtype)


# ---------------------------------------------------------------------------
# packed-qkv kernels: consume the qkv Dense output (B, S, 3D) DIRECTLY and
# emit dqkv (B, S, 3D) — the jnp.split(qkv) copies in the forward (3 slice
# materializations per block) and their concat transposes in the backward
# never exist (trace r3: ~0.4 ms per slice, 18 of them per step).
# ---------------------------------------------------------------------------


def _rope_rot(t, cos, sin):
    """Rotate-half RoPE on one head block t (S, Dh); cos/sin (S, Dh//2) f32.

    ESM-2 convention (models/esm.py::rotary_embed): out = [t1*cos - t2*sin,
    t2*cos + t1*sin]. f32 math, caller casts back. Pure VPU work — the
    kernel is matmul-instruction-bound, so this rides free where the XLA
    formulation cost a full (B, S, 3D) rewrite + relayout copies
    (pad_maximum fusions, ~0.5 ms/layer at DPLM geometry)."""
    half = cos.shape[-1]
    t = t.astype(jnp.float32)
    t1, t2 = t[:, :half], t[:, half:]
    return jnp.concatenate([t1 * cos - t2 * sin, t2 * cos + t1 * sin],
                           axis=-1)


def _rope_rot_inv(g, cos, sin):
    """Transpose (= inverse) rotation: maps d(rot(t)) cotangents to d(t)."""
    half = cos.shape[-1]
    g = g.astype(jnp.float32)
    g1, g2 = g[:, :half], g[:, half:]
    return jnp.concatenate([g1 * cos + g2 * sin, g2 * cos - g1 * sin],
                           axis=-1)


def _fwd_kernel_qkv(qkv_ref, bias_ref, *refs, heads: int, scale: float,
                    g_rows: int, save_probs: bool, with_proj: bool,
                    emit_o: bool = True, rope: bool = False):
    refs = list(refs)
    cos_ref = refs.pop(0) if rope else None
    sin_ref = refs.pop(0) if rope else None
    wo_ref = refs.pop(0) if with_proj else None
    bo_ref = refs.pop(0) if with_proj else None
    if emit_o:
        o_ref = refs.pop(0)
        probs_ref = refs.pop(0) if save_probs else None
        y_ref = refs.pop(0) if with_proj else None
    else:
        # inference (primal) path: y is the only HBM output; the
        # pre-projection attention output lives in a VMEM scratch ref
        # (passed after the outputs) and the probs residual never exists
        y_ref = refs.pop(0)
        o_ref = refs.pop(0)
        probs_ref = None
    D = qkv_ref.shape[-1] // 3
    Dh = D // heads

    def row(g, _):
        bias = bias_ref[g]  # (1, S)
        for h in range(heads):
            q = qkv_ref[g, :, h * Dh:(h + 1) * Dh]
            k = qkv_ref[g, :, D + h * Dh:D + (h + 1) * Dh]
            v = qkv_ref[g, :, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
            if rope:
                q = _rope_rot(q, cos_ref[:], sin_ref[:]).astype(v.dtype)
                k = _rope_rot(k, cos_ref[:], sin_ref[:]).astype(v.dtype)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l
            o_ref[g, :, h * Dh:(h + 1) * Dh] = o.astype(o_ref.dtype)
            if save_probs:
                probs_ref[g, h] = (p / l).astype(probs_ref.dtype)
        if with_proj:
            # out-projection rides the same program: y = o @ Wo + bo
            # (o just written is VMEM-resident in the output block)
            y = jax.lax.dot_general(
                o_ref[g], wo_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bo_ref[:].astype(jnp.float32)
            y_ref[g] = y.astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, g_rows, row, 0)


def _bwd_kernel_qkv(qkv_ref, bias_ref, do_ref, *refs, heads: int,
                    scale: float, g_rows: int, save_probs: bool,
                    with_proj: bool, rope: bool = False):
    refs = list(refs)
    cos_ref = refs.pop(0) if rope else None
    sin_ref = refs.pop(0) if rope else None
    wo_ref = refs.pop(0) if with_proj else None
    if save_probs:
        probs_ref = refs.pop(0)
        o_ref = None
    else:
        o_ref = refs.pop(0)
        probs_ref = None
    (dqkv_ref,) = refs
    D = qkv_ref.shape[-1] // 3
    Dh = D // heads

    def row(g, _):
        bias = bias_ref[g]
        if with_proj:
            # do_ref holds dy (the out-projection output cotangent):
            # do = dy @ Wo^T, computed once for all heads of this row
            do_full = jax.lax.dot_general(
                do_ref[g], wo_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(do_ref.dtype)
        for h in range(heads):
            q = qkv_ref[g, :, h * Dh:(h + 1) * Dh]
            k = qkv_ref[g, :, D + h * Dh:D + (h + 1) * Dh]
            v = qkv_ref[g, :, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
            if rope:
                # rotate EXACTLY as the forward did (same f32 math + cast)
                # so the recompute path reproduces the probabilities
                # bit-identically
                q = _rope_rot(q, cos_ref[:], sin_ref[:]).astype(v.dtype)
                k = _rope_rot(k, cos_ref[:], sin_ref[:]).astype(v.dtype)
            if with_proj:
                do = do_full[:, h * Dh:(h + 1) * Dh].astype(jnp.float32)
            else:
                do = do_ref[g, :, h * Dh:(h + 1) * Dh].astype(jnp.float32)
            dp = jax.lax.dot_general(
                do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if save_probs:
                prob = probs_ref[g, h].astype(jnp.float32)
                delta = jnp.sum(dp * prob, axis=-1, keepdims=True)
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + bias
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
                prob = p / l
                o = o_ref[g, :, h * Dh:(h + 1) * Dh].astype(jnp.float32)
                delta = jnp.sum(do * o, axis=-1, keepdims=True)
            ds = prob * (dp - delta) * scale
            ds_c = ds.astype(k.dtype)
            dq = jax.lax.dot_general(
                ds_c, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds_c, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if rope:
                # cotangents are w.r.t. the ROTATED q/k; map them back to
                # the unrotated qkv with the transpose rotation so dqkv
                # flows straight into the qkv Dense VJP
                dq = _rope_rot_inv(dq, cos_ref[:], sin_ref[:])
                dk = _rope_rot_inv(dk, cos_ref[:], sin_ref[:])
            dqkv_ref[g, :, h * Dh:(h + 1) * Dh] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[g, :, D + h * Dh:D + (h + 1) * Dh] = (
                dk.astype(dqkv_ref.dtype))
            dqkv_ref[g, :, 2 * D + h * Dh:2 * D + (h + 1) * Dh] = (
                jax.lax.dot_general(
                    prob.astype(do_ref.dtype), do.astype(do_ref.dtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dqkv_ref.dtype))
        return 0

    jax.lax.fori_loop(0, g_rows, row, 0)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, *out_refs, heads: int,
                scale: float, g_rows: int, layout: str, save_probs: bool):
    if save_probs:
        o_ref, probs_ref = out_refs
    else:
        (o_ref,) = out_refs

    # fori_loop over the G batch rows (dynamic leading-dim indexing) keeps
    # the Mosaic program size at H bodies instead of G*H — the unrolled
    # G=8 x H=8 variant took minutes to compile for no runtime gain
    def row(g, _):
        bias = bias_ref[g]  # (1, S) f32 additive key bias
        for h in range(heads):
            q = _get_h(q_ref, g, h, heads, layout)  # (S, Dh)
            k = _get_h(k_ref, g, h, heads, layout)
            v = _get_h(v_ref, g, h, heads, layout)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias  # (S, S)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l
            _put_h(o_ref, g, h, heads, layout, o)
            if save_probs:
                # normalized probs in bf16 — the backward reads these
                # instead of recomputing the scores matmul + softmax
                probs_ref[g, h] = (p / l).astype(probs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, g_rows, row, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, *refs,
                heads: int, scale: float, g_rows: int, layout: str,
                save_probs: bool):
    refs = list(refs)
    if save_probs:
        probs_ref = refs.pop(0)
        o_ref = None
    else:
        o_ref = refs.pop(0)
        probs_ref = None
    dq_ref, dk_ref, dv_ref = refs

    def row(g, _):
        bias = bias_ref[g]  # (1, S)
        for h in range(heads):
            q = _get_h(q_ref, g, h, heads, layout)
            k = _get_h(k_ref, g, h, heads, layout)
            v = _get_h(v_ref, g, h, heads, layout)
            do = _get_h(do_ref, g, h, heads, layout).astype(jnp.float32)
            dp = jax.lax.dot_general(
                do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (S, S)
            if save_probs:
                prob = probs_ref[g, h].astype(jnp.float32)  # (S, S)
                # delta_i = sum_d do*o = sum_j P_ij dp_ij — o never read
                delta = jnp.sum(dp * prob, axis=-1, keepdims=True)
            else:
                # recompute the probabilities EXACTLY as the forward did
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + bias
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
                prob = p / l  # (S, S) f32
                o = _get_h(o_ref, g, h, heads, layout).astype(jnp.float32)
                delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (S, 1)
            ds = prob * (dp - delta) * scale
            ds_c = ds.astype(k.dtype)
            _put_h(dq_ref, g, h, heads, layout, jax.lax.dot_general(
                ds_c, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            # dk = ds^T q, dv = prob^T do: contract over the ROW axis — no
            # explicit transpose materializes
            _put_h(dk_ref, g, h, heads, layout, jax.lax.dot_general(
                ds_c, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            _put_h(dv_ref, g, h, heads, layout, jax.lax.dot_general(
                prob.astype(do_ref.dtype), do.astype(do_ref.dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return 0

    jax.lax.fori_loop(0, g_rows, row, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _io_spec(G, shape, layout):
    if layout == "bhsd":
        H, S, Dh = shape[1], shape[2], shape[3]
        return pl.BlockSpec((G, H, S, Dh), lambda i: (i, 0, 0, 0))
    S, D = shape[1], shape[2]
    return pl.BlockSpec((G, S, D), lambda i: (i, 0, 0))


def _probs_spec(G, heads, S):
    return pl.BlockSpec((G, heads, S, S), lambda i: (i, 0, 0, 0))


def _fwd_call(q, k, v, bias, *, heads, scale, G, layout, interpret,
              save_probs):
    B = q.shape[0]
    S = q.shape[-2] if layout == "bhsd" else q.shape[1]
    io = _io_spec(G, q.shape, layout)
    bias_spec = pl.BlockSpec((G, 1, bias.shape[-1]), lambda i: (i, 0, 0))
    kernel = functools.partial(_fwd_kernel, heads=heads, scale=scale,
                               g_rows=G, layout=layout,
                               save_probs=save_probs)
    out_specs = [io]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if save_probs:
        out_specs.append(_probs_spec(G, heads, S))
        out_shape.append(
            jax.ShapeDtypeStruct((B, heads, S, S), jnp.bfloat16))
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[io, io, io, bias_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_vmem_params(q, G, 6 if save_probs else 4),
        interpret=interpret,
    )(q, k, v, bias)
    if save_probs:
        return outs[0], outs[1]
    return outs[0], None


def _bwd_call(q, k, v, bias, do, o, probs, *, heads, scale, G, layout,
              interpret):
    B = q.shape[0]
    S = q.shape[-2] if layout == "bhsd" else q.shape[1]
    io = _io_spec(G, q.shape, layout)
    bias_spec = pl.BlockSpec((G, 1, bias.shape[-1]), lambda i: (i, 0, 0))
    kernel = functools.partial(_bwd_kernel, heads=heads, scale=scale,
                               g_rows=G, layout=layout,
                               save_probs=probs is not None)
    in_specs = [io, io, io, bias_spec, io]
    args = [q, k, v, bias, do]
    if probs is not None:
        in_specs.append(_probs_spec(G, heads, S))
        args.append(probs)
    else:
        in_specs.append(io)
        args.append(o)
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=[io] * 3,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        compiler_params=_vmem_params(q, G, 11 if probs is not None else 9),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _short_attn_core(q, k, v, bias, heads, scale, G, layout, interpret,
                     save_probs):
    # primal (inference) path: probs is a backward residual — never write it
    # when no grad will flow
    o, _ = _fwd_call(q, k, v, bias, heads=heads, scale=scale, G=G,
                     layout=layout, interpret=interpret,
                     save_probs=False)
    return o


def _short_attn_fwd(q, k, v, bias, heads, scale, G, layout, interpret,
                    save_probs):
    o, probs = _fwd_call(q, k, v, bias, heads=heads, scale=scale, G=G,
                         layout=layout, interpret=interpret,
                         save_probs=save_probs)
    # with saved probs the backward never reads o (delta comes from dp*P)
    return o, (q, k, v, bias, None if save_probs else o, probs)


def _short_attn_bwd(heads, scale, G, layout, interpret, save_probs, res, do):
    q, k, v, bias, o, probs = res
    dq, dk, dv = _bwd_call(q, k, v, bias, do.astype(q.dtype), o, probs,
                           heads=heads, scale=scale, G=G, layout=layout,
                           interpret=interpret)
    return dq, dk, dv, None


_short_attn_core.defvjp(_short_attn_fwd, _short_attn_bwd)


def _qkv_specs(G, S, D3):
    return pl.BlockSpec((G, S, D3), lambda i: (i, 0, 0))


def _rope_specs(S, half):
    """Grid-invariant (S, half) f32 cos/sin blocks, shared by every head."""
    spec = pl.BlockSpec((S, half), lambda i: (0, 0))
    return [spec, spec]


def _fwd_call_qkv(qkv, bias, wo, bo, *, heads, scale, G, interpret,
                  save_probs, emit_o=True, rope_cs=None):
    B, S, D3 = qkv.shape
    D = D3 // 3
    with_proj = wo is not None
    rope = rope_cs is not None
    if not emit_o:
        assert with_proj and not save_probs  # inference-primal mode only
    io = _qkv_specs(G, S, D3)
    o_spec = pl.BlockSpec((G, S, D), lambda i: (i, 0, 0))
    bias_spec = pl.BlockSpec((G, 1, S), lambda i: (i, 0, 0))
    kernel = functools.partial(_fwd_kernel_qkv, heads=heads, scale=scale,
                               g_rows=G, save_probs=save_probs,
                               with_proj=with_proj, emit_o=emit_o, rope=rope)
    in_specs = [io, bias_spec]
    args = [qkv, bias]
    if rope:
        in_specs += _rope_specs(S, rope_cs[0].shape[-1])
        args += list(rope_cs)
    if with_proj:
        in_specs.append(pl.BlockSpec((D, D), lambda i: (0, 0)))
        in_specs.append(pl.BlockSpec((1, D), lambda i: (0, 0)))
        # cast to the kernel dtype HERE (inside the custom VJP) so the
        # param cotangents stay f32 — casting in the public wrapper would
        # round dWo/dbo to bf16 on their way to the f32 params
        args += [wo.astype(qkv.dtype), bo.astype(qkv.dtype)]
    scratch_shapes = []
    if emit_o:
        out_specs = [o_spec]
        out_shape = [jax.ShapeDtypeStruct((B, S, D), qkv.dtype)]
        if save_probs:
            out_specs.append(_probs_spec(G, heads, S))
            out_shape.append(
                jax.ShapeDtypeStruct((B, heads, S, S), jnp.bfloat16))
        if with_proj:
            out_specs.append(o_spec)
            out_shape.append(jax.ShapeDtypeStruct((B, S, D), qkv.dtype))
    else:
        # y only; o becomes a VMEM scratch (no dead HBM writes in inference)
        out_specs = [o_spec]
        out_shape = [jax.ShapeDtypeStruct((B, S, D), qkv.dtype)]
        scratch_shapes = [pltpu.VMEM((G, S, D), qkv.dtype)]
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=_vmem_params(qkv, G, 3 if save_probs else 2),
        interpret=interpret,
    )(*args)
    if not isinstance(outs, (tuple, list)):
        outs = [outs]
    outs = list(outs)
    if not emit_o:
        return None, None, outs[0]
    o = outs.pop(0)
    probs = outs.pop(0) if save_probs else None
    y = outs.pop(0) if with_proj else None
    return o, probs, y


def _bwd_call_qkv(qkv, bias, do, o, probs, wo, *, heads, scale, G,
                  interpret, rope_cs=None):
    B, S, D3 = qkv.shape
    D = D3 // 3
    with_proj = wo is not None
    io = _qkv_specs(G, S, D3)
    d_spec = pl.BlockSpec((G, S, D), lambda i: (i, 0, 0))
    bias_spec = pl.BlockSpec((G, 1, S), lambda i: (i, 0, 0))
    kernel = functools.partial(_bwd_kernel_qkv, heads=heads, scale=scale,
                               g_rows=G, save_probs=probs is not None,
                               with_proj=with_proj, rope=rope_cs is not None)
    in_specs = [io, bias_spec, d_spec]
    args = [qkv, bias, do]
    if rope_cs is not None:
        in_specs += _rope_specs(S, rope_cs[0].shape[-1])
        args += list(rope_cs)
    if with_proj:
        in_specs.append(pl.BlockSpec((D, D), lambda i: (0, 0)))
        args.append(wo.astype(qkv.dtype))
    if probs is not None:
        in_specs.append(_probs_spec(G, heads, S))
        args.append(probs)
    else:
        in_specs.append(d_spec)
        args.append(o)
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=io,
        out_shape=jax.ShapeDtypeStruct((B, S, D3), qkv.dtype),
        compiler_params=_vmem_params(qkv, G, 5 if probs is not None else 4),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _short_attn_core_qkv(qkv, bias, cos, sin, heads, scale, G, interpret,
                         save_probs):
    # primal (inference) path: probs is a residual for the backward only —
    # never write it when no grad will flow (save_probs stays a nondiff arg
    # so the differentiated path keeps its configured behavior)
    o, _, _ = _fwd_call_qkv(qkv, bias, None, None, heads=heads, scale=scale,
                            G=G, interpret=interpret, save_probs=False,
                            rope_cs=None if cos is None else (cos, sin))
    return o


def _short_attn_qkv_fwd(qkv, bias, cos, sin, heads, scale, G, interpret,
                        save_probs):
    o, probs, _ = _fwd_call_qkv(qkv, bias, None, None, heads=heads,
                                scale=scale, G=G, interpret=interpret,
                                save_probs=save_probs,
                                rope_cs=None if cos is None else (cos, sin))
    return o, (qkv, bias, cos, sin, None if save_probs else o, probs)


def _short_attn_qkv_bwd(heads, scale, G, interpret, save_probs, res, do):
    qkv, bias, cos, sin, o, probs = res
    dqkv = _bwd_call_qkv(qkv, bias, do.astype(qkv.dtype), o, probs, None,
                         heads=heads, scale=scale, G=G, interpret=interpret,
                         rope_cs=None if cos is None else (cos, sin))
    return dqkv, None, None, None


_short_attn_core_qkv.defvjp(_short_attn_qkv_fwd, _short_attn_qkv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _short_attn_core_qkv_proj(qkv, bias, wo, bo, cos, sin, heads, scale, G,
                              interpret, save_probs):
    # primal (inference) path: o and probs are backward residuals — skip
    # their HBM writes entirely (o lives in a VMEM scratch, probs never
    # exists). The differentiated path goes through _short_attn_qkv_proj_fwd
    # below, which emits both as configured.
    _, _, y = _fwd_call_qkv(qkv, bias, wo, bo, heads=heads, scale=scale,
                            G=G, interpret=interpret, save_probs=False,
                            emit_o=False,
                            rope_cs=None if cos is None else (cos, sin))
    return y


def _short_attn_qkv_proj_fwd(qkv, bias, wo, bo, cos, sin, heads, scale, G,
                             interpret, save_probs):
    o, probs, y = _fwd_call_qkv(qkv, bias, wo, bo, heads=heads, scale=scale,
                                G=G, interpret=interpret,
                                save_probs=save_probs,
                                rope_cs=None if cos is None else (cos, sin))
    return y, (qkv, bias, cos, sin, o, probs, wo, jnp.zeros((0,), bo.dtype))


def _short_attn_qkv_proj_bwd(heads, scale, G, interpret, save_probs, res,
                             dy):
    qkv, bias, cos, sin, o, probs, wo, bo_tag = res
    dy_c = dy.astype(qkv.dtype)
    dqkv = _bwd_call_qkv(qkv, bias, dy_c, None if save_probs else o, probs,
                         wo, heads=heads, scale=scale, G=G,
                         interpret=interpret,
                         rope_cs=None if cos is None else (cos, sin))
    # dWo = o^T dy and dbo = column-sum ride XLA/MXU (o is a saved residual)
    B, S, D = o.shape
    o2 = o.reshape(B * S, D)
    dy2 = dy_c.reshape(B * S, D)
    # keep f32: the wo/bo primals are the RAW param values (the kernel-dtype
    # cast happens inside the calls above), so these cotangents reach the
    # f32 params unquantized — matching nn.Dense and fused_dense semantics
    dwo = jax.lax.dot_general(
        o2, dy2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(wo.dtype)
    dbo = jnp.sum(dy2.astype(jnp.float32), axis=0)[None, :]
    return dqkv, None, dwo, dbo.astype(bo_tag.dtype), None, None


_short_attn_core_qkv_proj.defvjp(_short_attn_qkv_proj_fwd,
                                 _short_attn_qkv_proj_bwd)


def _rope_cos_sin(positions: jax.Array, Dh: int, Sp: int):
    """(Sp, Dh//2) f32 cos/sin tables for the in-kernel rotate-half RoPE
    (ESM-2 frequency convention — models/esm.py::rotary_embed). Padded rows
    get the identity rotation (cos=1, sin=0); they are masked out anyway."""
    half = Dh // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[:, None] * freqs[None, :]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    S = positions.shape[0]
    if Sp != S:
        cos = jnp.pad(cos, ((0, Sp - S), (0, 0)), constant_values=1.0)
        sin = jnp.pad(sin, ((0, Sp - S), (0, 0)))
    return cos, sin


def fused_short_attention_qkv(
    qkv: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_b: int = 8,
    save_probs: Optional[bool] = None,
    rope_positions: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Packed variant: consumes the qkv projection output (B, S, 3D) with
    the [q | k | v] concatenation layout of a single 3D-wide Dense, returns
    the (B, S, D) attention output. The jnp.split(qkv) slice copies and
    their backward concat never materialize — dqkv flows straight back into
    the qkv Dense VJP. Otherwise identical to fused_short_attention
    (layout='bsd' semantics).

    rope_positions: (S,) positions — apply rotate-half RoPE (ESM-2
    convention) to q/k INSIDE the kernel. The XLA formulation
    (models/esm.py::rotary_embed_bsd) rewrites the whole (B, S, 3D) qkv
    array through HBM; in-kernel it is pure VPU work riding a
    matmul-instruction-bound kernel. dqkv cotangents come back w.r.t. the
    UNROTATED qkv (transpose rotation applied in the backward kernel)."""
    B, S, D3 = qkv.shape
    if D3 % 3:
        raise ValueError(f"packed qkv needs last dim divisible by 3, got {D3}")
    D = D3 // 3
    if D % num_heads:
        raise ValueError(f"D={D} not divisible by num_heads={num_heads}")
    Dh = D // num_heads
    if rope_positions is not None and Dh % 2:
        raise ValueError(f"in-kernel RoPE needs even Dh, got {Dh}")
    if scale is None:
        scale = 1.0 / (Dh ** 0.5)
    Sp = _seq_pad(S)
    # rows-per-program: clamped to the actual batch (B=1 scoring callers
    # would otherwise pad to block_b rows and compute block_b x the work),
    # scaled up when Sp is short so programs stay amortized
    G = _rows_per_program(block_b, B, Sp)
    Bp = _round_up(B, G)
    if mask is None:
        mask = jnp.ones((B, S), dtype=bool)
    maskp = mask
    if Sp != S or Bp != B:
        qkv = jnp.pad(qkv, ((0, Bp - B), (0, Sp - S), (0, 0)))
        maskp = jnp.pad(mask, ((0, Bp - B), (0, Sp - S)))
    bias = jnp.where(maskp, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    if save_probs is None:
        save_probs = Bp * num_heads * Sp * Sp * 2 <= 512 * 1024 * 1024
    cos, sin = (None, None) if rope_positions is None else _rope_cos_sin(
        rope_positions, Dh, Sp)
    o = _short_attn_core_qkv(qkv, bias, cos, sin, num_heads, float(scale),
                             G, interpret, bool(save_probs))
    if Sp != S or Bp != B:
        o = o[:B, :S]
    return o


def fused_short_attention_qkv_proj(
    qkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_b: int = 8,
    save_probs: Optional[bool] = None,
    rope_positions: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Packed qkv attention WITH the out-projection fused:
    y = attention(qkv) @ wo + bo, (B, S, D) out. The per-row attention
    output is VMEM-resident when the projection matmul runs, so the
    standalone out_proj op (and the backward's separate dy @ Wo^T pass)
    disappear; dWo/dbo ride XLA from the saved attention output.
    rope_positions: in-kernel rotate-half RoPE on q/k — see
    fused_short_attention_qkv."""
    B, S, D3 = qkv.shape
    if D3 % 3:
        raise ValueError(f"packed qkv needs last dim divisible by 3, got {D3}")
    D = D3 // 3
    if wo.shape != (D, D):
        raise ValueError(f"wo must be ({D}, {D}), got {wo.shape}")
    if D % num_heads:
        raise ValueError(f"D={D} not divisible by num_heads={num_heads}")
    Dh = D // num_heads
    if rope_positions is not None and Dh % 2:
        raise ValueError(f"in-kernel RoPE needs even Dh, got {Dh}")
    if scale is None:
        scale = 1.0 / (Dh ** 0.5)
    Sp = _seq_pad(S)
    # rows-per-program: clamped to the actual batch (B=1 scoring callers
    # would otherwise pad to block_b rows and compute block_b x the work),
    # scaled up when Sp is short so programs stay amortized
    G = _rows_per_program(block_b, B, Sp)
    Bp = _round_up(B, G)
    if mask is None:
        mask = jnp.ones((B, S), dtype=bool)
    maskp = mask
    if Sp != S or Bp != B:
        qkv = jnp.pad(qkv, ((0, Bp - B), (0, Sp - S), (0, 0)))
        maskp = jnp.pad(mask, ((0, Bp - B), (0, Sp - S)))
    bias = jnp.where(maskp, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    if save_probs is None:
        save_probs = Bp * num_heads * Sp * Sp * 2 <= 512 * 1024 * 1024
    cos, sin = (None, None) if rope_positions is None else _rope_cos_sin(
        rope_positions, Dh, Sp)
    y = _short_attn_core_qkv_proj(
        qkv, bias, wo, bo.reshape(1, D), cos, sin,
        num_heads, float(scale), G, interpret, bool(save_probs))
    if Sp != S or Bp != B:
        y = y[:B, :S]
    return y


# ---------------------------------------------------------------------------
# CLS-query kernels: attention for query row 0 ONLY, from packed (B, S, 3D)
# qkv. One query per head collapses the (S, S) score matrix to a column, so
# the whole computation is 2 fwd / 4 bwd head-batched dots per batch row
# (vs 16 in the full kernel): every per-head reduction/expansion goes
# through constant head-mask matrices (hsum[d, h] = 1 iff lane d belongs to
# head h; hexp = hsum^T) so ONLY standard-layout ops exist — per-head
# lane-offset slices, (S, 1) keepdims intermediates and row slices of
# dynamically-indexed blocks all produce layouts Mosaic rejects ("Invalid
# input layout", measured twice). The q part of qkv is read as an 8-row
# block view (8/S of its DMA; row 0 extracted by a masked sublane
# reduction). The XLA formulation of the same math
# (ops/attention.py::cls_query_attention) costs ~10 ms/step at flagship
# geometry in relayout copies + slice_convert fusions (trace r3); this
# kernel reads the packed layout in place. Backward recomputes the softmax
# (no residuals) and emits dqkv with only row 0 of the q part nonzero,
# flowing straight into the qkv Dense VJP. Measured: flagship 8,194 ->
# 8,727 pairs/s/chip (RESULTS.md r3).
# ---------------------------------------------------------------------------


def _cls_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, hsum_ref, hexp_ref,
                    o_ref, *, scale: float, g_rows: int):
    def row(g, _):
        # extract query row 0 from the 8-row q block with a masked sublane
        # reduction (row slices of dynamically-indexed blocks produced
        # layouts Mosaic rejects; this is all standard ops)
        q8 = q_ref[g].astype(jnp.float32)  # (8, D)
        sel = jax.lax.broadcasted_iota(jnp.int32, q8.shape, 0) == 0
        q0 = jnp.sum(jnp.where(sel, q8, 0.0), axis=0, keepdims=True)  # (1, D)
        k = k_ref[g].astype(jnp.float32)  # (S, D)
        v = v_ref[g].astype(jnp.float32)
        # scores for ALL heads in one standard-layout dot: e[s, h*Dh+d] =
        # k[s, h*Dh+d] * q0[h*Dh+d]; s_all[s, h] = sum_d e -> e @ hsum
        e = k * jnp.broadcast_to(q0, k.shape)
        s = jax.lax.dot_general(
            e, hsum_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias_ref[g]  # (S, Hp)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=0, keepdims=True), 1e-30)
        probs = p / l  # (S, Hp)
        # per-head value sums, all heads at once: pv[h, d] = sum_s probs*v;
        # head h owns lane block h -> mask with hexp and sublane-sum
        pv = jax.lax.dot_general(
            probs, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Hp, D)
        o = jnp.sum(pv * hexp_ref[:], axis=0, keepdims=True)  # (1, D)
        o_ref[g] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, g_rows, row, 0)


def _cls_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, hsum_ref, hexp_ref,
                    do_ref, dqkv_ref, *, scale: float, g_rows: int):
    S = k_ref.shape[1]
    D = k_ref.shape[-1]
    row_is0 = jax.lax.broadcasted_iota(jnp.int32, (S, D), 0) == 0

    def row(g, _):
        q8 = q_ref[g].astype(jnp.float32)  # (8, D); see fwd kernel comment
        sel = jax.lax.broadcasted_iota(jnp.int32, q8.shape, 0) == 0
        q0 = jnp.sum(jnp.where(sel, q8, 0.0), axis=0, keepdims=True)  # (1, D)
        k = k_ref[g].astype(jnp.float32)
        v = v_ref[g].astype(jnp.float32)
        do = do_ref[g].astype(jnp.float32)  # (1, D)
        q0_b = jnp.broadcast_to(q0, k.shape)
        do_b = jnp.broadcast_to(do, v.shape)
        # recompute the softmax (no residuals), then the rank-1 backward —
        # every contraction is head-batched via the hsum/hexp masks, so no
        # lane-offset intermediates exist
        e = k * q0_b
        s = jax.lax.dot_general(
            e, hsum_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias_ref[g]
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=0, keepdims=True), 1e-30)
        probs = p / l  # (S, Hp)
        dp = jax.lax.dot_general(
            v * do_b, hsum_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, Hp)
        delta = jnp.sum(probs * dp, axis=0, keepdims=True)  # (1, Hp)
        ds = probs * (dp - delta) * scale  # (S, Hp)
        ds_exp = jax.lax.dot_general(
            ds, hexp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, D) — ds_exp[s, h*Dh+d] = ds[s, h]
        dq0 = jnp.sum(ds_exp * k, axis=0, keepdims=True)  # (1, D)
        probs_exp = jax.lax.dot_general(
            probs, hexp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, D)
        dqkv_ref[g, :, 0:D] = jnp.where(
            row_is0, jnp.broadcast_to(dq0, (S, D)), 0.0
        ).astype(dqkv_ref.dtype)
        dqkv_ref[g, :, D:2 * D] = (ds_exp * q0_b).astype(dqkv_ref.dtype)
        dqkv_ref[g, :, 2 * D:3 * D] = (probs_exp * do_b).astype(dqkv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, g_rows, row, 0)


def _cls_part_specs(G, S, D):
    """Three views into the packed (B, S, 3D) qkv: the q part as the first
    8 seq rows (Mosaic's sublane minimum; the kernel reads row 0 — 8/S of
    the q DMA), k and v as full (G, S, D) blocks."""
    return [
        pl.BlockSpec((G, 8, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((G, S, D), lambda i: (i, 0, 1)),
        pl.BlockSpec((G, S, D), lambda i: (i, 0, 2)),
    ]


_CLS_HP = 128  # head columns padded to the lane width


def _cls_head_masks(D: int, heads: int):
    """hsum (D, Hp): column h sums head h's Dh lanes; hexp = hsum^T expands
    head columns back to their lane blocks. Grid-invariant kernel inputs."""
    Dh = D // heads
    lane_head = np.arange(D) // Dh  # head owning each lane
    hsum = (lane_head[:, None] == np.arange(_CLS_HP)[None, :])
    hsum = jnp.asarray(hsum, jnp.float32)
    return hsum, hsum.T.copy()


def _cls_mask_specs(D):
    return [
        pl.BlockSpec((D, _CLS_HP), lambda i: (0, 0)),
        pl.BlockSpec((_CLS_HP, D), lambda i: (0, 0)),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _cls_attn_core(qkv, bias, heads, scale, G, interpret):
    B, S, D3 = qkv.shape
    D = D3 // 3
    hsum, hexp = _cls_head_masks(D, heads)
    return pl.pallas_call(
        functools.partial(_cls_fwd_kernel, scale=scale, g_rows=G),
        grid=(B // G,),
        in_specs=_cls_part_specs(G, S, D) + [
            pl.BlockSpec((G, S, _CLS_HP), lambda i: (i, 0, 0))
        ] + _cls_mask_specs(D),
        out_specs=pl.BlockSpec((G, 1, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), qkv.dtype),
        compiler_params=_vmem_params(qkv, G, 1),
        interpret=interpret,
    )(qkv, qkv, qkv, bias, hsum, hexp)


def _cls_attn_fwd(qkv, bias, heads, scale, G, interpret):
    o = _cls_attn_core(qkv, bias, heads, scale, G, interpret)
    return o, (qkv, bias)


def _cls_attn_bwd(heads, scale, G, interpret, res, do):
    qkv, bias = res
    B, S, D3 = qkv.shape
    D = D3 // 3
    hsum, hexp = _cls_head_masks(D, heads)
    dqkv = pl.pallas_call(
        functools.partial(_cls_bwd_kernel, scale=scale, g_rows=G),
        grid=(B // G,),
        in_specs=_cls_part_specs(G, S, D) + [
            pl.BlockSpec((G, S, _CLS_HP), lambda i: (i, 0, 0))
        ] + _cls_mask_specs(D) + [
            pl.BlockSpec((G, 1, D), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, S, D3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, D3), qkv.dtype),
        compiler_params=_vmem_params(qkv, G, 2),
        interpret=interpret,
    )(qkv, qkv, qkv, bias, hsum, hexp, do.astype(qkv.dtype))
    return dqkv, None


_cls_attn_core.defvjp(_cls_attn_fwd, _cls_attn_bwd)


def fused_cls_attention(
    qkv: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Attention output for query row 0 only, (B, 1, D), from packed
    (B, S, 3D) qkv — semantics of `multihead_attention(q, k, v)[:, :1]`.
    Head-batched mask-contraction kernel (see the section comment above);
    used by TransformerBlock's `out_rows == 1` CLS-truncation path on TPU."""
    B, S, D3 = qkv.shape
    if D3 % 3:
        raise ValueError(f"packed qkv needs last dim divisible by 3, got {D3}")
    D = D3 // 3
    if D % num_heads:
        raise ValueError(f"D={D} not divisible by num_heads={num_heads}")
    if num_heads > _CLS_HP:
        raise ValueError(
            f"num_heads={num_heads} exceeds the {_CLS_HP} head columns of "
            "the head-mask matrices; use the XLA cls_query_attention path")
    Dh = D // num_heads
    if scale is None:
        scale = 1.0 / (Dh ** 0.5)
    Sp = _seq_pad(S)
    # rows-per-program: clamped to the actual batch (B=1 scoring callers
    # would otherwise pad to block_b rows and compute block_b x the work),
    # scaled up when Sp is short so programs stay amortized
    G = _rows_per_program(block_b, B, Sp)
    Bp = _round_up(B, G)
    if mask is None:
        mask = jnp.ones((B, S), dtype=bool)
    maskp = mask
    if Sp != S or Bp != B:
        qkv = jnp.pad(qkv, ((0, Bp - B), (0, Sp - S), (0, 0)))
        maskp = jnp.pad(mask, ((0, Bp - B), (0, Sp - S)))
    # pre-broadcast over the padded head columns: a (B, S, 1) f32 array is
    # tile-padded to 128 lanes in HBM anyway, so this costs no extra bytes
    # and keeps the in-kernel add a standard-layout op
    bias = jnp.broadcast_to(
        jnp.where(maskp, 0.0, NEG_INF).astype(jnp.float32)[:, :, None],
        (Bp, Sp, _CLS_HP))
    o = _cls_attn_core(qkv, bias, num_heads, float(scale), G, interpret)
    return o[:B]


def fused_short_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_b: int = 8,
    layout: str = "bhsd",
    save_probs: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head self-attention over (B, S, D) inputs, D = num_heads * Dh.

    Returns (B, S, D) — same contract as ops.attention.multihead_attention.
    mask: (B, S) bool, True = real token. Requires self-attention (q/k/v of
    one shape). layout: 'bhsd' (head-split blocks, default) or 'bsd'
    (direct lane-sliced blocks) — see module docstring.

    save_probs: store the normalized (B, H, S, S) probabilities in bf16 from
    the forward so the backward skips the scores matmul + softmax recompute
    (4 dots per head instead of 5 — the backward is dot-instruction-bound).
    Costs the probs buffer in HBM; None = auto (on while the buffer stays
    under 512 MB). bf16 probs bound the extra dq/dk gradient error at the
    bf16 rounding the forward's own p@v matmul already applies.
    """
    B, S, D = q.shape
    if k.shape != q.shape or v.shape != q.shape:
        raise ValueError("fused_short_attention requires q/k/v of equal "
                         f"shape, got {q.shape} {k.shape} {v.shape}")
    if D % num_heads:
        raise ValueError(f"D={D} not divisible by num_heads={num_heads}")
    if layout not in ("bhsd", "bsd"):
        raise ValueError(f"unknown layout {layout!r}")
    Dh = D // num_heads
    if scale is None:
        scale = 1.0 / (Dh ** 0.5)

    Sp = _seq_pad(S)
    # rows-per-program: clamped to the actual batch (B=1 scoring callers
    # would otherwise pad to block_b rows and compute block_b x the work),
    # scaled up when Sp is short so programs stay amortized
    G = _rows_per_program(block_b, B, Sp)
    Bp = _round_up(B, G)
    if mask is None:
        mask = jnp.ones((B, S), dtype=bool)
    maskp = mask
    if Sp != S or Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, Sp - S), (0, 0)))
        k = jnp.pad(k, ((0, Bp - B), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, Bp - B), (0, Sp - S), (0, 0)))
        maskp = jnp.pad(mask, ((0, Bp - B), (0, Sp - S)))
    bias = jnp.where(maskp, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    if layout == "bhsd":
        def split(t):
            return t.reshape(Bp, Sp, num_heads, Dh).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)

    if save_probs is None:
        save_probs = Bp * num_heads * Sp * Sp * 2 <= 512 * 1024 * 1024

    o = _short_attn_core(q, k, v, bias, num_heads, float(scale), G, layout,
                         interpret, bool(save_probs))
    if layout == "bhsd":
        o = o.transpose(0, 2, 1, 3).reshape(Bp, Sp, D)
    if Sp != S or Bp != B:
        o = o[:B, :S]
    return o


def fused_short_attention_heads(
    qh: jax.Array,
    kh: jax.Array,
    vh: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_b: int = 8,
    save_probs: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Head-level entry over (B, H, S, Dh) — for towers that transform q/k
    per head AFTER the split (ESM rotary embeddings). Same kernel as the
    'bhsd' layout of fused_short_attention, minus the wrapper's split."""
    B, H, S, Dh = qh.shape
    if kh.shape != qh.shape or vh.shape != qh.shape:
        raise ValueError("fused_short_attention_heads requires q/k/v of one "
                         f"shape, got {qh.shape} {kh.shape} {vh.shape}")
    if scale is None:
        scale = 1.0 / (Dh ** 0.5)
    Sp = _seq_pad(S)
    # rows-per-program: clamped to the actual batch (B=1 scoring callers
    # would otherwise pad to block_b rows and compute block_b x the work),
    # scaled up when Sp is short so programs stay amortized
    G = _rows_per_program(block_b, B, Sp)
    Bp = _round_up(B, G)
    if mask is None:
        mask = jnp.ones((B, S), dtype=bool)
    maskp = mask
    if Sp != S or Bp != B:
        pad4 = ((0, Bp - B), (0, 0), (0, Sp - S), (0, 0))
        qh = jnp.pad(qh, pad4)
        kh = jnp.pad(kh, pad4)
        vh = jnp.pad(vh, pad4)
        maskp = jnp.pad(mask, ((0, Bp - B), (0, Sp - S)))
    bias = jnp.where(maskp, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    if save_probs is None:
        save_probs = Bp * H * Sp * Sp * 2 <= 512 * 1024 * 1024
    o = _short_attn_core(qh, kh, vh, bias, H, float(scale), G, "bhsd",
                         interpret, bool(save_probs))
    if Sp != S or Bp != B:
        o = o[:B, :, :S]
    return o


def short_attention_reference(q, k, v, num_heads, mask=None, scale=None):
    """Pure-JAX parity target: head split -> softmax attention -> merge."""
    from clip_dplm_tpu.ops.attention import (
        _merge_heads, _split_heads, attention_reference,
    )

    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    return _merge_heads(attention_reference(qh, kh, vh, mask=mask,
                                            scale=scale))


# ---------------------------------------------------------------------------
# TINY-S packed-diagonal attention (S < 64): the tf_clip perturbation tower
# (B=4096, S=10 top-DEG tokens, tf nb cell 41). Neither standard formulation
# works there (r5 measurements):
#   * XLA tiles the [B, H, S, S] scores to (8, 128) lanes — 10/128 lane
#     density, ~20 ms/step of inflated fusions + layout copies in the
#     BACKWARD (r5 trace);
#   * the per-head-loop kernels above run G x H tiny (16, Dh) dots — MXU
#     instruction-bound (82.8 vs 70.2 ms on the full step, r5 dead end).
# This variant packs P = R / Sp samples along the row axis of ONE
# (R, Dh) x (Dh, R) score dot per head with a static block-diagonal bias
# (rows attend only within their own sample), so every dot is MXU-shaped
# (R = 128 rows) and the scores never leave VMEM. The 2D (B*Sp, 3D) layout
# is a reshape VIEW of the padded qkv — no head-split or transpose copies
# on either side, and the out-projection rides the same program.
# ---------------------------------------------------------------------------


def _tiny_diag_bias(R: int, sp: int):
    """(R, R) additive bias: 0 within a sample's sp-row group, -1e30 across."""
    r = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    return jnp.where((r // sp) == (c // sp), 0.0, NEG_INF).astype(jnp.float32)


def _tiny_fwd_kernel(qkv_ref, bias_ref, wo_ref, bo_ref, o_ref, y_ref, *,
                     heads: int, scale: float, sp: int):
    R = qkv_ref.shape[0]
    D = qkv_ref.shape[-1] // 3
    Dh = D // heads
    diag = _tiny_diag_bias(R, sp)
    kbias = bias_ref[0][None, :]  # (1, R) additive key bias
    for h in range(heads):
        q = qkv_ref[:, h * Dh:(h + 1) * Dh]
        k = qkv_ref[:, D + h * Dh:D + (h + 1) * Dh]
        v = qkv_ref[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + kbias + diag  # (R, R)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[:, h * Dh:(h + 1) * Dh] = o.astype(o_ref.dtype)
    y = jax.lax.dot_general(
        o_ref[:], wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _tiny_bwd_kernel(qkv_ref, bias_ref, wo_ref, o_ref, dy_ref, dqkv_ref, *,
                     heads: int, scale: float, sp: int):
    R = qkv_ref.shape[0]
    D = qkv_ref.shape[-1] // 3
    Dh = D // heads
    diag = _tiny_diag_bias(R, sp)
    kbias = bias_ref[0][None, :]
    # do = dy @ Wo^T once for all heads (dWo/dbo ride XLA from the saved o)
    do_full = jax.lax.dot_general(
        dy_ref[:], wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dy_ref.dtype)
    for h in range(heads):
        q = qkv_ref[:, h * Dh:(h + 1) * Dh]
        k = qkv_ref[:, D + h * Dh:D + (h + 1) * Dh]
        v = qkv_ref[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        do = do_full[:, h * Dh:(h + 1) * Dh].astype(jnp.float32)
        # recompute the probabilities EXACTLY as the forward did
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + kbias + diag
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        prob = p / l
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o_ref[:, h * Dh:(h + 1) * Dh].astype(jnp.float32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = prob * (dp - delta) * scale
        ds_c = ds.astype(k.dtype)
        dqkv_ref[:, h * Dh:(h + 1) * Dh] = jax.lax.dot_general(
            ds_c, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
        dqkv_ref[:, D + h * Dh:D + (h + 1) * Dh] = jax.lax.dot_general(
            ds_c, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
        dqkv_ref[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh] = (
            jax.lax.dot_general(
                prob.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dqkv_ref.dtype))


def _tiny_fwd_call(qkv2, bias2, wo, bo, *, heads, scale, sp, R, interpret):
    N, D3 = qkv2.shape
    D = D3 // 3
    kernel = functools.partial(_tiny_fwd_kernel, heads=heads, scale=scale,
                               sp=sp)
    o, y = pl.pallas_call(
        kernel,
        grid=(N // R,),
        in_specs=[
            pl.BlockSpec((R, D3), lambda i: (i, 0)),
            pl.BlockSpec((1, R), lambda i: (0, i)),
            pl.BlockSpec((D, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((R, D), lambda i: (i, 0)),
            pl.BlockSpec((R, D), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), qkv2.dtype),
            jax.ShapeDtypeStruct((N, D), qkv2.dtype),
        ],
        interpret=interpret,
    )(qkv2, bias2, wo.astype(qkv2.dtype), bo.reshape(1, D).astype(qkv2.dtype))
    return o, y


def _tiny_bwd_call(qkv2, bias2, wo, o, dy, *, heads, scale, sp, R,
                   interpret):
    N, D3 = qkv2.shape
    D = D3 // 3
    kernel = functools.partial(_tiny_bwd_kernel, heads=heads, scale=scale,
                               sp=sp)
    return pl.pallas_call(
        kernel,
        grid=(N // R,),
        in_specs=[
            pl.BlockSpec((R, D3), lambda i: (i, 0)),
            pl.BlockSpec((1, R), lambda i: (0, i)),
            pl.BlockSpec((D, D), lambda i: (0, 0)),
            pl.BlockSpec((R, D), lambda i: (i, 0)),
            pl.BlockSpec((R, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((R, D3), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D3), qkv2.dtype),
        interpret=interpret,
    )(qkv2, bias2, wo.astype(qkv2.dtype), o, dy.astype(qkv2.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _tiny_attn_core(qkv2, bias2, wo_bo, heads, scale, sp, R, interpret):
    wo, bo = wo_bo
    _, y = _tiny_fwd_call(qkv2, bias2, wo, bo, heads=heads, scale=scale,
                          sp=sp, R=R, interpret=interpret)
    return y


def _tiny_attn_fwd(qkv2, bias2, wo_bo, heads, scale, sp, R, interpret):
    wo, bo = wo_bo
    o, y = _tiny_fwd_call(qkv2, bias2, wo, bo, heads=heads, scale=scale,
                          sp=sp, R=R, interpret=interpret)
    return y, (qkv2, bias2, wo, o)


def _tiny_attn_bwd(heads, scale, sp, R, interpret, res, dy):
    qkv2, bias2, wo, o = res
    dqkv = _tiny_bwd_call(qkv2, bias2, wo, o, dy, heads=heads, scale=scale,
                          sp=sp, R=R, interpret=interpret)
    # dWo = o^T dy, dbo = sum dy: two well-shaped XLA matmul/reduce ops on
    # the saved (N, D) attention output — f32 param cotangents
    dwo = jnp.einsum("nd,ne->de", o.astype(jnp.float32),
                     dy.astype(jnp.float32))
    dbo = jnp.sum(dy.astype(jnp.float32), axis=0)
    return dqkv, None, (dwo, dbo)


_tiny_attn_core.defvjp(_tiny_attn_fwd, _tiny_attn_bwd)


def tiny_attention_rows() -> int:
    """Packed rows per program (R). 128 = one MXU tile of rows; score-FLOP
    waste grows as R/Sp, so keep R at the tile size.
    CLIP_DPLM_TINY_ATTN_ROWS overrides."""
    import os

    try:
        return int(os.environ.get("CLIP_DPLM_TINY_ATTN_ROWS", 128))
    except ValueError:  # pragma: no cover
        return 128


def fused_tiny_attention_proj(
    qkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Tiny-S (S < 64) packed attention with the out-projection fused:
    y = attention(qkv) @ wo + bo, (B, S, D) out — same contract as
    fused_short_attention_qkv_proj. P = R/Sp samples share each (R, R)
    score dot under a static block-diagonal bias."""
    B, S, D3 = qkv.shape
    if D3 % 3:
        raise ValueError(f"packed qkv needs last dim divisible by 3, got {D3}")
    D = D3 // 3
    if wo.shape != (D, D):
        raise ValueError(f"wo must be ({D}, {D}), got {wo.shape}")
    if D % num_heads:
        raise ValueError(f"D={D} not divisible by num_heads={num_heads}")
    Dh = D // num_heads
    if scale is None:
        scale = 1.0 / (Dh ** 0.5)
    sp = max(16, _round_up(S, 16))
    # R must be divisible by sp (whole samples per program) AND by the 128
    # lane width (the (1, R) key-bias block's last dim must be a lane
    # multiple or Mosaic rejects the lowering — hit at S=33/sp=48, where
    # the old round-to-sp gave R=144): R = the smallest lcm(sp, 128)
    # multiple >= the configured row target.
    import math

    r0 = sp * 128 // math.gcd(sp, 128)
    base = tiny_attention_rows()
    R = max(r0, (base + r0 - 1) // r0 * r0)
    P = R // sp  # samples per program
    Bp = _round_up(B, P)
    if mask is None:
        mask = jnp.ones((B, S), dtype=bool)
    qkvp, maskp = qkv, mask
    if sp != S or Bp != B:
        qkvp = jnp.pad(qkv, ((0, Bp - B), (0, sp - S), (0, 0)))
        maskp = jnp.pad(mask, ((0, Bp - B), (0, sp - S)))
    qkv2 = qkvp.reshape(Bp * sp, D3)
    bias2 = jnp.where(maskp, 0.0, NEG_INF).astype(
        jnp.float32).reshape(1, Bp * sp)
    y2 = _tiny_attn_core(qkv2, bias2, (wo, bo), num_heads, float(scale),
                         sp, R, interpret)
    y = y2.reshape(Bp, sp, D)
    if sp != S or Bp != B:
        y = y[:B, :S]
    return y
