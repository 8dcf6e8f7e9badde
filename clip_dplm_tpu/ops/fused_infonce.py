"""Fused InfoNCE Pallas kernel — the north-star hot path.

Computes the symmetric global-batch CLIP loss (normalize -> scaled similarity
-> symmetric cross-entropy, old/clip_opt.py:83-151 semantics) WITHOUT ever
materializing the B x B similarity matrix in HBM: the forward is a blockwise
online-logsumexp kernel, the backward recomputes probability blocks and
contracts them against the opposite tower on the fly (flash-attention-style),
via a custom VJP.

Core primitive: `fused_row_ce(x, y, scale, labels)` — mean_i CE of row i of
(scale * x y^T) against labels. The symmetric loss composes two calls (a vs
b_cols, b vs a_cols); under a mesh the columns are the all-gathered global
embeddings while rows stay local, so the kernel plugs directly into
shard_map/pjit and the all-gather rides ICI (see infonce.global_clip_loss for
the XLA reference formulation this must match).

Memory: XLA's formulation keeps sim (B^2 f32) + its softmax live; at B=8192
that is 2 x 256 MB. The fused path stores only per-row statistics (B f32).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_dplm_tpu.ops.infonce import effective_scale, l2_normalize

NEG_INF = -1e30
BLOCK_M = 512
BLOCK_N = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward: blockwise row logsumexp of scale * x @ y^T
# ---------------------------------------------------------------------------


def _lse_kernel(x_ref, y_ref, scale_ref, mask_ref, lse_ref, m_scr, l_scr, *, nn: int):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    x = x_ref[:]  # (bm, d)
    y = y_ref[:]  # (bn, d)
    scale = scale_ref[0, 0]
    colmask = mask_ref[0]  # (1, bn): 0 valid / NEG_INF padded column

    s = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + colmask  # (bm, bn)

    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    l_new = l_prev * jnp.exp(m_prev - m_new) + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jn == nn - 1)
    def _():
        lse_ref[:] = m_scr[:, 0:1] + jnp.log(jnp.maximum(l_scr[:, 0:1], 1e-30))


def _row_lse(x: jax.Array, y: jax.Array, scale: jax.Array,
             n_valid=None, dot_dtype=None,
             block_m: int = BLOCK_M, block_n: int = BLOCK_N) -> jax.Array:
    """(m,1) f32 row logsumexp of scale * x y^T, blockwise.

    `n_valid` (static int or traced scalar) masks trailing columns with -1e30
    — used both for block padding and for the dynamic hard-negative cache
    fill level (matches infonce.clip_loss's cache_len masking)."""
    m, d = x.shape
    n = y.shape[0]
    if n_valid is None:
        n_valid = n
    block_m = min(block_m, _round_up(m, 8))
    block_n = min(block_n, _round_up(n, 128))
    mp, np_ = _round_up(m, block_m), _round_up(n, block_n)
    xp = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    yp = jnp.pad(y, ((0, np_ - n), (0, 0))) if np_ != n else y
    if dot_dtype is not None:
        xp, yp = xp.astype(dot_dtype), yp.astype(dot_dtype)
    colmask = jnp.where(
        jnp.arange(np_)[None, :] < n_valid, 0.0, NEG_INF
    ).astype(jnp.float32)[None]  # (1, 1, np_) -> trailing dims (1, np_)

    nm, nn = mp // block_m, np_ // block_n
    scale2d = scale.reshape(1, 1).astype(jnp.float32)
    lse = pl.pallas_call(
        functools.partial(_lse_kernel, nn=nn),
        grid=(nm, nn),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_m, 128), jnp.float32),
            pltpu.VMEM((block_m, 128), jnp.float32),
        ],
    )(xp, yp, scale2d, colmask)
    return lse[:m]


# ---------------------------------------------------------------------------
# backward: dX = P @ Y, dY = P^T @ X, plus row sums of P * raw for d_scale
# ---------------------------------------------------------------------------


def _dx_kernel(x_ref, y_ref, scale_ref, mask_ref, lse_ref, dx_ref, rowdot_ref,
               acc_scr, dot_scr, *, nn: int):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        dot_scr[:] = jnp.zeros_like(dot_scr)

    x = x_ref[:]
    y = y_ref[:]
    scale = scale_ref[0, 0]
    colmask = mask_ref[0]
    lse = lse_ref[:]  # (bm, 1)

    raw = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp(raw * scale + colmask - lse)  # (bm, bn) softmax rows
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        p.astype(y.dtype), y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dot_scr[:] = dot_scr[:] + jnp.sum(p * raw, axis=-1, keepdims=True)

    @pl.when(jn == nn - 1)
    def _():
        dx_ref[:] = acc_scr[:].astype(dx_ref.dtype)
        rowdot_ref[:] = dot_scr[:, 0:1]


def _dy_kernel(x_ref, y_ref, scale_ref, rowmask_ref, lse_ref, dy_ref,
               acc_scr, *, nm: int):
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[:]  # (bm, d)
    y = y_ref[:]  # (bn, d)
    scale = scale_ref[0, 0]
    rowmask = rowmask_ref[0]  # (1, bm): 0 valid row / NEG_INF padded row
    lse = lse_ref[:]  # (bm, 1)

    raw = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bm, bn)
    # mask padded rows so they contribute nothing to dY
    p = jnp.exp(raw * scale - lse + rowmask.reshape(-1, 1)[: raw.shape[0]])
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        p.astype(x.dtype), x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, d)

    @pl.when(im == nm - 1)
    def _():
        dy_ref[:] = acc_scr[:].astype(dy_ref.dtype)


def _softmax_contractions(x, y, scale, lse, n_valid=None, dot_dtype=None,
                          block_m: int = BLOCK_M, block_n: int = BLOCK_N):
    """Returns (P @ y, rowsum(P*raw), P^T @ x) where P = softmax rows of
    scale * x y^T (using precomputed lse), all blockwise."""
    m, d = x.shape
    n = y.shape[0]
    if n_valid is None:
        n_valid = n
    block_m = min(block_m, _round_up(m, 8))
    block_n = min(block_n, _round_up(n, 128))
    mp, np_ = _round_up(m, block_m), _round_up(n, block_n)
    xp = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    yp = jnp.pad(y, ((0, np_ - n), (0, 0))) if np_ != n else y
    if dot_dtype is not None:
        xp, yp = xp.astype(dot_dtype), yp.astype(dot_dtype)
    # padded rows: lse -> +inf-ish so p = exp(raw*scale - big) = 0
    lse_p = jnp.pad(lse, ((0, mp - m), (0, 0)), constant_values=-NEG_INF)
    colmask = jnp.where(jnp.arange(np_)[None, :] < n_valid, 0.0, NEG_INF).astype(
        jnp.float32
    )[None]
    rowmask = jnp.where(jnp.arange(mp)[None, :] < m, 0.0, NEG_INF).astype(
        jnp.float32
    )[None]
    scale2d = scale.reshape(1, 1).astype(jnp.float32)
    nm, nn = mp // block_m, np_ // block_n

    py, rowdot = pl.pallas_call(
        functools.partial(_dx_kernel, nn=nn),
        grid=(nm, nn),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, d), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.float32),
            pltpu.VMEM((block_m, 128), jnp.float32),
        ],
    )(xp, yp, scale2d, colmask, lse_p)

    ptx = pl.pallas_call(
        functools.partial(_dy_kernel, nm=nm),
        grid=(nn, nm),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda j, i: (i, 0)),
            pl.BlockSpec((block_n, d), lambda j, i: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_m), lambda j, i: (0, 0, i)),
            pl.BlockSpec((block_m, 1), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_n, d), jnp.float32)],
    )(xp, yp, scale2d, rowmask, lse_p)

    return py[:m], rowdot[:m], ptx[:n]


# ---------------------------------------------------------------------------
# fused row cross-entropy with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_row_ce(x, y, scale, labels, n_valid=None, dot_dtype=None):
    """mean_i [ logsumexp_j(scale * <x_i, y_j>) - scale * <x_i, y_{labels_i}> ]

    x: (m, d), y: (n, d) — both assumed already L2-normalized.
    scale: fp32 scalar (the clamped exp of the learned logit scale).
    labels: (m,) int32 column index of the positive for each row.
    n_valid: optional traced count of valid columns (trailing columns masked
    with -1e30, e.g. the unfilled tail of the hard-negative cache).
    """
    loss, _ = _fused_row_ce_fwd(x, y, scale, labels, n_valid, dot_dtype)
    return loss


def _fused_row_ce_fwd(x, y, scale, labels, n_valid, dot_dtype=None):
    lse = _row_lse(x, y, scale, n_valid=n_valid, dot_dtype=dot_dtype)  # (m, 1)
    y_pos = jnp.take(y, labels, axis=0)  # (m, d)
    raw_pos = jnp.sum(x * y_pos, axis=-1, keepdims=True)  # (m, 1)
    loss = jnp.mean(lse - scale * raw_pos)
    return loss, (x, y, scale, labels, lse, raw_pos, n_valid)


def _fused_row_ce_bwd(dot_dtype, res, g):
    x, y, scale, labels, lse, raw_pos, n_valid = res
    m = x.shape[0]
    py, rowdot, ptx = _softmax_contractions(
        x, y, scale, lse, n_valid=n_valid, dot_dtype=dot_dtype
    )
    coef = g / m
    # dX: softmax part minus the positive column, all times scale
    y_pos = jnp.take(y, labels, axis=0)
    dx = coef * scale * (py - y_pos)
    # dY: P^T x, minus scatter of x into the positive rows
    dy = coef * scale * ptx
    dy = dy.at[labels].add(-coef * scale * x)
    # d scale: sum_i [ sum_j P_ij raw_ij - raw_pos_i ] / m
    dscale = coef * (jnp.sum(rowdot) - jnp.sum(raw_pos))
    return dx.astype(x.dtype), dy.astype(y.dtype), dscale.astype(scale.dtype), None, None


fused_row_ce.defvjp(_fused_row_ce_fwd, _fused_row_ce_bwd)


# ---------------------------------------------------------------------------
# public symmetric loss
# ---------------------------------------------------------------------------


def _smoothing_adjustment(
    x: jax.Array, y: jax.Array, scale: jax.Array, labels: jax.Array,
    smoothing: float, n_valid=None,
) -> jax.Array:
    """Additive correction turning the hard-label fused CE into label-smoothed
    CE (the intent of old/clip_opt.py:141-148, which built smoothed targets
    but fed hard labels to F.cross_entropy).

      smooth_i = hard_i + s*z_pos_i - s/(n-1) * (rowsum_z_i - z_pos_i)

    with z = scale * <x, y> over the n valid columns. rowsum_z_i collapses to
    scale * <x_i, sum_valid y> — O((m+n)d), no kernel change. Plain jnp ops,
    so autodiff supplies this term's VJP on top of the kernel's custom VJP.
    """
    if n_valid is None:
        n = jnp.float32(y.shape[0])
        ysum = jnp.sum(y, axis=0)
    else:
        n = n_valid.astype(jnp.float32) if hasattr(n_valid, "dtype") else jnp.float32(n_valid)
        col = jnp.arange(y.shape[0])[:, None] < n_valid
        ysum = jnp.sum(jnp.where(col, y, 0.0), axis=0)
    z_pos = scale * jnp.sum(x * jnp.take(y, labels, axis=0), axis=-1)
    rowsum_z = scale * (x @ ysum)
    s = smoothing
    adj = s * z_pos - (s / jnp.maximum(n - 1.0, 1.0)) * (rowsum_z - z_pos)
    return jnp.mean(adj)


def _resolve_materialize(materialize_raw, rows: int, cols: int) -> bool:
    """'auto' materializes while the int16 raw buffer stays under
    MATERIALIZE_BYTES_LIMIT; 'always'/'never' (or booleans) force it."""
    if materialize_raw == "auto":
        return rows * cols * 2 <= MATERIALIZE_BYTES_LIMIT
    if isinstance(materialize_raw, str):
        return materialize_raw == "always"
    return bool(materialize_raw)


def fused_clip_loss(
    emb_a: jax.Array,
    emb_b: jax.Array,
    logit_scale: jax.Array,
    cache: Optional[jax.Array] = None,
    cache_len: Optional[jax.Array] = None,
    max_scale: float = 100.0,
    axis_name: Optional[str] = None,
    dot_dtype=None,
    label_smoothing: float = 0.0,
    materialize_raw="auto",
    assume_normalized: bool = False,
) -> Tuple[jax.Array, dict]:
    """Drop-in fused replacement for infonce.clip_loss / global_clip_loss.

    With `axis_name` (inside shard_map) rows stay local while columns are the
    all-gathered global embeddings — the ICI all-gather feeds the kernel
    directly and each chip computes CE for its local rows of both directions.
    `assume_normalized` skips the L2 normalize when the projection head
    already emitted unit rows (projection.l2_normalize_output).
    """
    if assume_normalized:
        a = emb_a.astype(jnp.float32)
        b = emb_b.astype(jnp.float32)
    else:
        a = l2_normalize(emb_a)
        b = l2_normalize(emb_b)
    scale = effective_scale(logit_scale, max_scale)

    if axis_name is None:
        B = a.shape[0]
        labels = jnp.arange(B, dtype=jnp.int32)
        cols_b, cols_a = b, a
    else:
        idx = jax.lax.axis_index(axis_name)
        b_local = a.shape[0]
        labels = idx * b_local + jnp.arange(b_local, dtype=jnp.int32)
        cols_b = jax.lax.all_gather(b, axis_name, tiled=True)
        cols_a = jax.lax.all_gather(a, axis_name, tiled=True)

    n_valid = None
    if cache is not None:
        # cache rows are stored normalized; the unfilled tail is masked by
        # column count (same -1e30 semantics as infonce.clip_loss)
        cols_b_a_dir = jnp.concatenate([cols_b, cache.astype(cols_b.dtype)], axis=0)
        if cache_len is not None:
            n_valid = cols_b.shape[0] + cache_len
    else:
        cols_b_a_dir = cols_b

    if axis_name is None and cache is None:
        mat = _resolve_materialize(materialize_raw, a.shape[0], b.shape[0])
        loss = fused_symmetric_infonce(a, b, scale, dot_dtype, mat)
        if label_smoothing > 0.0:
            loss = loss + 0.5 * (
                _smoothing_adjustment(a, b, scale, labels, label_smoothing)
                + _smoothing_adjustment(b, a, scale, labels, label_smoothing)
            )
        return loss, {"loss_a": loss, "loss_b": loss, "logit_scale": scale}

    loss_a = fused_row_ce(a, cols_b_a_dir, scale, labels, n_valid, dot_dtype)
    loss_b = fused_row_ce(b, cols_a, scale, labels, None, dot_dtype)
    if label_smoothing > 0.0:
        loss_a = loss_a + _smoothing_adjustment(
            a, cols_b_a_dir, scale, labels, label_smoothing, n_valid)
        loss_b = loss_b + _smoothing_adjustment(
            b, cols_a, scale, labels, label_smoothing)
    if axis_name is not None:
        loss_a = jax.lax.pmean(loss_a, axis_name)
        loss_b = jax.lax.pmean(loss_b, axis_name)
    loss = 0.5 * (loss_a + loss_b)
    return loss, {"loss_a": loss_a, "loss_b": loss_b, "logit_scale": scale}


# ---------------------------------------------------------------------------
# symmetric fast path: both CE directions share one raw = a b^T matrix
# ---------------------------------------------------------------------------
#
# For the common diagonal-label single-device case the backward collapses:
#   dL/d raw_ij = (scale/2B) * (P_a + P_b^T - 2 I)_ij
#   da = (scale/2B) (P_a + P_b^T) b - (scale/B) b     (one blockwise pass)
#   db = (scale/2B) (P_a^T + P_b) a - (scale/B) a     (one blockwise pass)
# so fwd+bwd costs 6 B x B matmul passes instead of 10 (two independent
# fused_row_ce calls) — measured 1.5x on v5e at B=16k.
#
# `materialize_raw` trades O(B^2) bf16 HBM for the backward's raw recompute:
# the forward writes its raw tiles out once and both backward passes stream
# them back in (DMA overlaps the contraction matmul), so fwd+bwd does exactly
# the 6 B^2 d matmul FLOPs of the ideal formulation instead of 10 (the two
# recompute matmuls disappear). At B=8192 the buffer is 128 MB; "auto"
# materializes while rows*cols*2 bytes <= MATERIALIZE_BYTES_LIMIT.

MATERIALIZE_BYTES_LIMIT = 640 * 1024 * 1024


# Materialized raw is stored as int16 fixed-point: cosines of (bf16-rounded)
# L2-normalized vectors are bounded by ~1.008, so q = round(raw * RAW_QSCALE)
# covers the range with absolute error ~3e-5 — an order of magnitude tighter
# than bf16 at the same 2 bytes/element, keeping backward parity with the
# recompute path at ~1e-4. The error enters the backward softmax as
# err * effective_scale, so parity degrades linearly as the learned
# temperature grows — at the logit_scale_max clamp (scale 100) per-logit
# error is ~3e-3, which the softmax's normalization largely cancels
# (gradient parity at max scale is tested:
# test_fused_infonce.py::test_materialized_raw_at_max_scale).
RAW_QSCALE = 32767.0 / 1.01


def _sym_grad_raw_kernel(raw_ref, y_ref, scale_ref, colmask_ref, lse_row_ref,
                         lse_col_ref, dx_ref, rowdot_ref, acc_scr, dot_scr,
                         *, nn: int, resident_n: int = 0, masked: bool = True):
    """Pass-A backward from materialized raw: accumulates
    (P_row + P_colT) @ y and rowsum(p*raw) over the inner column axis —
    `_sym_grad_kernel` minus the raw recompute matmul (the DMA of the int16
    tile overlaps the contraction)."""
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        dot_scr[:] = jnp.zeros_like(dot_scr)

    qf = raw_ref[:].astype(jnp.float32)
    if resident_n:
        y = y_ref[pl.ds(jn * resident_n, resident_n), :]
    else:
        y = y_ref[:]
    scale = scale_ref[0, 0]
    lse_row = lse_row_ref[:]  # (bm, 1)
    lse_col = lse_col_ref[0]  # (1, bn)

    # dequant and logit scale folded into ONE per-element multiply; the
    # unscaled raw for the d_scale rowsum is recovered by scaling the
    # per-row reduction once (sum(p * raw) == sum(p * qf) / RAW_QSCALE)
    s = qf * (scale * (1.0 / RAW_QSCALE))
    if masked:
        s = s + colmask_ref[0]  # (1, bn)
    p = jnp.exp(s - lse_row) + jnp.exp(s - lse_col)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        p.astype(y.dtype), y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dot_scr[:] = dot_scr[:] + jnp.sum(p * qf, axis=-1, keepdims=True)

    @pl.when(jn == nn - 1)
    def _():
        dx_ref[:] = acc_scr[:].astype(dx_ref.dtype)
        rowdot_ref[:] = dot_scr[:, 0:1] * (1.0 / RAW_QSCALE)


def _sym_grad_rawT_kernel(raw_ref, x_ref, scale_ref, rowmask_ref, lse_row_ref,
                          lse_col_ref, dy_ref, acc_scr, *, nm: int,
                          resident_m: int = 0, masked: bool = True):
    """Pass-B backward from materialized raw: accumulates the transposed
    contraction (P_row + P_colT)^T @ x over the inner ROW axis, reading the
    same (i, j) raw tiles — no transpose and no recompute. The rowmask zeroes
    padded rows exactly (their zero x rows would otherwise meet inf from
    exp(-lse) when lse is very negative, producing NaN in the contraction)."""
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qf = raw_ref[:].astype(jnp.float32)  # (bm, bn)
    if resident_m:
        x = x_ref[pl.ds(im * resident_m, resident_m), :]
    else:
        x = x_ref[:]  # (bm, d)
    scale = scale_ref[0, 0]
    lse_row = lse_row_ref[:]  # (bm, 1)
    lse_col = lse_col_ref[0]  # (1, bn)

    s = qf * (scale * (1.0 / RAW_QSCALE))
    if masked:
        rowmask = rowmask_ref[0]  # (1, bm)
        s = s + rowmask.reshape(-1, 1)[: qf.shape[0]]
    p = jnp.exp(s - lse_row) + jnp.exp(s - lse_col)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        p.astype(x.dtype), x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, d)

    @pl.when(im == nm - 1)
    def _():
        dy_ref[:] = acc_scr[:].astype(dy_ref.dtype)


def _sym_grad_merged_kernel(raw_ref, y_ref, x_ref, scale_ref, colmask_ref,
                            rowmask_ref, lse_row_ref, lse_col_ref,
                            dx_ref, rowdot_ref, dy_ref,
                            acc_a_scr, dot_scr, acc_b_scr,
                            *, nm: int, nn: int, block_n: int,
                            masked: bool = True):
    """Single-pass symmetric backward from materialized raw: each int16 tile
    is read ONCE and its probability block p = exp(s-lse_row)+exp(s-lse_col)
    is contracted BOTH ways — p @ y accumulates into a per-row-block scratch
    (flushed at the end of each inner sweep, like pass A), and p^T @ x
    accumulates into a grid-persistent (np_, d) f32 VMEM scratch whose j-th
    slice is emitted on the final outer row (replacing pass B). Halves the
    raw DMA and the exp VPU work of the two-pass formulation."""
    i = pl.program_id(0)
    jn = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, jn == 0))
    def _():
        acc_b_scr[:] = jnp.zeros_like(acc_b_scr)

    @pl.when(jn == 0)
    def _():
        acc_a_scr[:] = jnp.zeros_like(acc_a_scr)
        dot_scr[:] = jnp.zeros_like(dot_scr)

    qf = raw_ref[:].astype(jnp.float32)
    y = y_ref[pl.ds(jn * block_n, block_n), :]  # resident (np_, d) operand
    x = x_ref[:]  # (bm, d) streamed once per outer row (grid-invariant in j)
    scale = scale_ref[0, 0]
    lse_row = lse_row_ref[:]  # (bm, 1)
    lse_col = lse_col_ref[0]  # (1, bn)

    s = qf * (scale * (1.0 / RAW_QSCALE))
    if masked:
        s = s + colmask_ref[0]  # (1, bn) kills padded columns
        rowmask = rowmask_ref[0]  # (1, bm) kills padded rows
        s = s + rowmask.reshape(-1, 1)[: qf.shape[0]]
    p = jnp.exp(s - lse_row) + jnp.exp(s - lse_col)
    acc_a_scr[:] = acc_a_scr[:] + jax.lax.dot_general(
        p.astype(y.dtype), y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dot_scr[:] = dot_scr[:] + jnp.sum(p * qf, axis=-1, keepdims=True)
    pb = jax.lax.dot_general(
        p.astype(x.dtype), x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, d)
    acc_b_new = acc_b_scr[pl.ds(jn * block_n, block_n), :] + pb
    acc_b_scr[pl.ds(jn * block_n, block_n), :] = acc_b_new

    @pl.when(jn == nn - 1)
    def _():
        dx_ref[:] = acc_a_scr[:].astype(dx_ref.dtype)
        rowdot_ref[:] = dot_scr[:, 0:1] * (1.0 / RAW_QSCALE)

    @pl.when(i == nm - 1)
    def _():
        dy_ref[:] = acc_b_new.astype(dy_ref.dtype)


# The TPU compiler's scoped-VMEM budget is 40 MB on this generation: the
# merged backward engages only when its FULL working set — grid-persistent
# (np_, d) dB accumulator, resident y operand, dA/rowdot scratch and the
# double-buffered raw/x/dx/dy block tiles — fits with margin. Accounting
# only for accumulator + resident operand let B=10240 at d=512 through
# (31.5 MB) while the real allocation was 40.7 MB and the compile failed
# outright; the two-pass backward handles everything above the cap.
MERGED_VMEM_CAP = 38 * 1024 * 1024


def _merged_vmem_need(np_: int, d: int, bp, block_m: int, block_n: int) -> int:
    """Byte estimate of `_sym_grad_merged_kernel`'s scoped-VMEM working set."""
    esize = bp.dtype.itemsize
    return (
        np_ * d * 4                    # grid-persistent dB accumulator
        + _resident_bytes(bp)          # whole resident y operand
        + block_m * d * 4              # dA accumulator scratch
        + block_m * 128 * 4            # rowdot scratch
        + 2 * block_m * block_n * 2    # int16 raw tiles (double-buffered)
        + 2 * block_m * d * esize      # x tiles
        + 2 * block_m * d * 4          # dx output tiles
        + 2 * block_n * d * 4          # dy output tiles
        + 2 * block_m * 128 * 4        # rowdot output tiles (lane-padded)
    )


def _merged_vmem_need_padded(np_: int, d: int, bp, block_m: int,
                             block_n: int) -> int:
    """Padded estimate (15% + 2 MB over the itemized sum): Mosaic's true
    stack depends on surrounding-program layouts, not just this kernel's
    blocks (r5: 24.66 MiB actual vs 22.75 estimated in the
    tf_clip+fused_dense composition). Used by BOTH the engagement gate and
    the vmem limit outside the proven headline point, so they agree."""
    return int(1.15 * _merged_vmem_need(np_, d, bp, block_m, block_n)) \
        + 2 * 1024 * 1024


def _sym_grad_merged(raw_q, ap, bp, scale2d, colmask, rowmask, lse_row_p,
                     lse_col_p, block_m: int, block_n: int, masked: bool):
    """Driver for `_sym_grad_merged_kernel`: grid (nm, nn) row-major; dy's
    block index parks at 0 until the final outer row so the (np_, d) output
    is flushed exactly once per column block."""
    mp, np_ = raw_q.shape
    d = ap.shape[1]
    nm, nn = mp // block_m, np_ // block_n

    dy_index = lambda i, j: (jnp.where(i == nm - 1, j, 0), 0)
    # Mosaic's actual stack need runs below `_merged_vmem_need` (outputs and
    # grid-invariant operands are not all double-buffered); this tighter
    # limit is proven at the engaged shapes and raising it to the full
    # estimate measured ~0.25% slower at B=8192 (scheduler headroom).
    vmem_need = (np_ * d * 4 + _resident_bytes(bp) + 2 * block_m * d * 4
                 + 8 * 1024 * 1024)
    # The tight limit is PROVEN only at the certified headline operating
    # point (d=512, np_==8192, default 512x1024 blocks) IN the headline
    # model. It is NOT a pure shape property: the r5 tf_clip+fused_dense
    # composition hit a hard Mosaic stack OOM at np_=4096/d=512 (24.7M
    # stack vs the 22.0M tight limit) even though the same shape compiled
    # fine in the r3 headline B-sweep — surrounding-program layouts change
    # Mosaic's window allocation. Everywhere outside the exact headline
    # point, pass the full (over-)estimate: ~0.25% scheduling cost beats a
    # compile failure the engagement gate admitted (ADVICE r3, r5 fix).
    proven = d == 512 and np_ == 8192 and block_m == 512 and block_n == 1024
    if not proven:
        # the raw estimate itself undercounts in some compositions (r5:
        # tf_clip+fused_dense allocated 24.66 MiB where the sum said
        # 22.75 for the same shape that compiled leaner in the headline
        # program — Mosaic's stack depends on surrounding layouts); pad
        # 15% + 2 MB, clamped at the 40 MB hard cap
        vmem_need = max(
            vmem_need,
            _merged_vmem_need_padded(np_, d, bp, block_m, block_n))
    acc_a, rowdot, acc_b = pl.pallas_call(
        functools.partial(_sym_grad_merged_kernel, nm=nm, nn=nn,
                          block_n=block_n, masked=masked),
        grid=(nm, nn),
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
            pl.BlockSpec((np_, d), lambda i, j: (0, 0)),
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, 1, block_m), lambda i, j: (0, 0, i)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, d), dy_index),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, d), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.float32),
            pltpu.VMEM((block_m, 128), jnp.float32),
            pltpu.VMEM((np_, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_need, 40 * 1024 * 1024)),
    )(raw_q, bp, ap, scale2d, colmask, rowmask, lse_row_p, lse_col_p)
    return acc_a, rowdot, acc_b


def _merged_bwd_mode() -> str:
    import os

    return os.environ.get("CLIP_DPLM_LOSS_MERGED", "auto")


def _sym_grad_passes_from_raw(raw_q, a, b, scale, lse_row, lse_col,
                              dot_dtype=None,
                              block_m: int = BLOCK_M, block_n: int = BLOCK_N):
    """Both symmetric backward contractions from the materialized raw tiles:
    returns (acc_a (m,d), rowdot (m,1), acc_b (n,d)). raw_q is the padded
    (mp, np_) int16 buffer written by the forward."""
    m, d = a.shape
    n = b.shape[0]
    block_m = min(block_m, _round_up(m, 8))
    block_n = min(block_n, _round_up(n, 128))
    mp, np_ = raw_q.shape
    ap = jnp.pad(a, ((0, mp - m), (0, 0))) if mp != m else a
    bp = jnp.pad(b, ((0, np_ - n), (0, 0))) if np_ != n else b
    if dot_dtype is not None:
        ap, bp = ap.astype(dot_dtype), bp.astype(dot_dtype)
    lse_row_p = jnp.pad(lse_row, ((0, mp - m), (0, 0)), constant_values=-NEG_INF)
    lse_col_p = jnp.pad(lse_col[:, 0], (0, np_ - n), constant_values=-NEG_INF)
    lse_col_p = lse_col_p[None, None, :]
    colmask = jnp.where(jnp.arange(np_)[None, :] < n, 0.0, NEG_INF).astype(
        jnp.float32)[None]
    rowmask = jnp.where(jnp.arange(mp)[None, :] < m, 0.0, NEG_INF).astype(
        jnp.float32)[None]
    scale2d = scale.reshape(1, 1).astype(jnp.float32)
    nm, nn = mp // block_m, np_ // block_n
    masked = mp != m or np_ != n
    res_b = _resident_bytes(bp) <= RESIDENT_BYTES_LIMIT
    res_a = _resident_bytes(ap) <= RESIDENT_BYTES_LIMIT

    mode = _merged_bwd_mode()
    # Engagement must use the SAME padded estimate the limit uses outside
    # the proven point (r5 review finding: gating on the raw sum while the
    # limit is clamped at 40 MB re-admits shapes near the cap whose true
    # Mosaic stack exceeds it — the exact failure class the padding fixed).
    # The proven headline point (d=512, np_=8192, 512x1024 blocks) keeps
    # its measured engagement: its raw 36.4 MB working set compiles at the
    # tight limit across the r3/r4/r5 bench history.
    proven_pt = d == 512 and np_ == 8192 and block_m == 512 and block_n == 1024
    merged_ok = res_b and (
        (_merged_vmem_need(np_, d, bp, block_m, block_n)
         if proven_pt else
         _merged_vmem_need_padded(np_, d, bp, block_m, block_n))
        <= MERGED_VMEM_CAP)
    if mode == "1" or (mode == "auto" and merged_ok):
        acc_a, rowdot, acc_b = _sym_grad_merged(
            raw_q, ap, bp, scale2d, colmask, rowmask, lse_row_p, lse_col_p,
            block_m, block_n, masked)
        return acc_a[:m], rowdot[:m], acc_b[:n]

    acc_a, rowdot = pl.pallas_call(
        functools.partial(_sym_grad_raw_kernel, nn=nn,
                          resident_n=block_n if res_b else 0, masked=masked),
        grid=(nm, nn),
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
            (pl.BlockSpec((np_, d), lambda i, j: (0, 0)) if res_b
             else pl.BlockSpec((block_n, d), lambda i, j: (j, 0))),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, d), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.float32),
            pltpu.VMEM((block_m, 128), jnp.float32),
        ],
        compiler_params=_loss_vmem_params(res_b, bp),
    )(raw_q, bp, scale2d, colmask, lse_row_p, lse_col_p)

    acc_b = pl.pallas_call(
        functools.partial(_sym_grad_rawT_kernel, nm=nm,
                          resident_m=block_m if res_a else 0, masked=masked),
        grid=(nn, nm),
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
            (pl.BlockSpec((mp, d), lambda j, i: (0, 0)) if res_a
             else pl.BlockSpec((block_m, d), lambda j, i: (i, 0))),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_m), lambda j, i: (0, 0, i)),
            pl.BlockSpec((block_m, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((1, 1, block_n), lambda j, i: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_n, d), jnp.float32)],
        compiler_params=_loss_vmem_params(res_a, ap),
    )(raw_q, ap, scale2d, rowmask, lse_row_p, lse_col_p)

    return acc_a[:m], rowdot[:m], acc_b[:n]


def _sym_grad_kernel(x_ref, y_ref, scale_ref, colmask_ref, lse_row_ref,
                     lse_col_ref, dx_ref, rowdot_ref, acc_scr, dot_scr,
                     *, nn: int):
    """Accumulates (P_row + P_colT) @ y over the inner (column) grid axis.

    P_row  = exp(raw*scale + colmask - lse_row_i)   (row softmax)
    P_colT = exp(raw*scale + colmask - lse_col_j)   (transposed col softmax)
    """
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        dot_scr[:] = jnp.zeros_like(dot_scr)

    x = x_ref[:]
    y = y_ref[:]
    scale = scale_ref[0, 0]
    colmask = colmask_ref[0]  # (1, bn)
    lse_row = lse_row_ref[:]  # (bm, 1)
    lse_col = lse_col_ref[0]  # (1, bn)

    raw = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = raw * scale + colmask
    p = jnp.exp(s - lse_row) + jnp.exp(s - lse_col)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        p.astype(y.dtype), y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dot_scr[:] = dot_scr[:] + jnp.sum(p * raw, axis=-1, keepdims=True)

    @pl.when(jn == nn - 1)
    def _():
        dx_ref[:] = acc_scr[:].astype(dx_ref.dtype)
        rowdot_ref[:] = dot_scr[:, 0:1]


def _sym_grad_pass(x, y, scale, lse_row, lse_col, dot_dtype=None,
                   block_m: int = BLOCK_M, block_n: int = BLOCK_N):
    """(P_row + P_colT) @ y and rowsum((P_row + P_colT) * raw), blockwise.
    lse_row: (m, 1) row stats; lse_col: (n, 1) stats of the transposed
    direction, broadcast along columns."""
    m, d = x.shape
    n = y.shape[0]
    block_m = min(block_m, _round_up(m, 8))
    block_n = min(block_n, _round_up(n, 128))
    mp, np_ = _round_up(m, block_m), _round_up(n, block_n)
    xp = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    yp = jnp.pad(y, ((0, np_ - n), (0, 0))) if np_ != n else y
    if dot_dtype is not None:
        xp, yp = xp.astype(dot_dtype), yp.astype(dot_dtype)
    lse_row_p = jnp.pad(lse_row, ((0, mp - m), (0, 0)), constant_values=-NEG_INF)
    # lay column stats out as (1, 1, np_) so blocks are (1, 1, block_n)
    lse_col_p = jnp.pad(lse_col[:, 0], (0, np_ - n), constant_values=-NEG_INF)
    lse_col_p = lse_col_p[None, None, :]
    colmask = jnp.where(jnp.arange(np_)[None, :] < n, 0.0, NEG_INF).astype(
        jnp.float32
    )[None]
    scale2d = scale.reshape(1, 1).astype(jnp.float32)
    nm, nn = mp // block_m, np_ // block_n

    acc, rowdot = pl.pallas_call(
        functools.partial(_sym_grad_kernel, nn=nn),
        grid=(nm, nn),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, d), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.float32),
            pltpu.VMEM((block_m, 128), jnp.float32),
        ],
    )(xp, yp, scale2d, colmask, lse_row_p, lse_col_p)
    return acc[:m], rowdot[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_symmetric_infonce(a, b, scale, dot_dtype=None,
                            materialize_raw: bool = False):
    """0.5 * (row-CE(scale*a b^T, diag) + row-CE(scale*b a^T, diag)) with a
    6-pass fwd+bwd (see header above). a, b must be L2-normalized.

    `materialize_raw` stores the forward's raw tiles (int16 fixed-point,
    O(B^2) HBM) so the backward skips both recompute matmuls."""
    loss, _ = _sym_fwd(a, b, scale, dot_dtype, materialize_raw)
    return loss


def _sym_fwd(a, b, scale, dot_dtype, materialize_raw=False):
    # one shared-raw pass: row lse of scale*a b^T and its column lse
    # (== row lse of scale*b a^T)
    if materialize_raw:
        lse_a, lse_b, raw_q = _sym_row_col_lse(
            a, b, scale, dot_dtype=dot_dtype, save_raw=True)
    else:
        lse_a, lse_b = _sym_row_col_lse(a, b, scale, dot_dtype=dot_dtype)
        raw_q = None
    diag = jnp.sum(a * b, axis=-1, keepdims=True)  # (B,1)
    loss = 0.5 * (jnp.mean(lse_a - scale * diag) + jnp.mean(lse_b - scale * diag))
    return loss, (a, b, scale, lse_a, lse_b, diag, raw_q)


def _sym_bwd(dot_dtype, materialize_raw, res, g):
    a, b, scale, lse_a, lse_b, diag, raw_q = res
    B = a.shape[0]
    coef = g / B
    if materialize_raw:
        acc_a, rowdot, acc_b = _sym_grad_passes_from_raw(
            raw_q, a, b, scale, lse_a, lse_b, dot_dtype)
    else:
        acc_a, rowdot = _sym_grad_pass(a, b, scale, lse_a, lse_b, dot_dtype)
        acc_b, _ = _sym_grad_pass(b, a, scale, lse_b, lse_a, dot_dtype)
    da = 0.5 * coef * scale * acc_a - coef * scale * b
    db = 0.5 * coef * scale * acc_b - coef * scale * a
    dscale = 0.5 * coef * jnp.sum(rowdot) - coef * jnp.sum(diag)
    return (
        da.astype(a.dtype),
        db.astype(b.dtype),
        dscale.astype(scale.dtype),
    )


fused_symmetric_infonce.defvjp(_sym_fwd, _sym_bwd)


# ---------------------------------------------------------------------------
# ring-scheduled global loss: the all-gather absorbed into the kernel schedule
# ---------------------------------------------------------------------------
#
# Instead of lax.all_gather materializing the (B_g, d) column matrix before
# the kernel (old composition), each device keeps its (b_l, d) shard and the
# shards travel a ppermute ring: at ring step k the local kernel processes the
# currently-held column shard while the next one is already in flight on ICI
# (the permute has no data dependence on the step's compute, so the scheduler
# overlaps them). Per-shard column statistics and the dY accumulator TRAVEL
# WITH the shard — after n steps each shard arrives home with its column
# logsumexp and gradient complete. This removes the B_g x d gather buffer
# (peak memory) and runs at the single-chip kernel's pass structure.
#
# Semantics == fused_clip_loss(axis_name=...) == infonce.global_clip_loss
# (old/clip_opt.py:102-112 global-batch symmetric CE), no cache columns.


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def _logaddexp(a, b):
    # masked slots use the finite NEG_INF sentinel, so m is always finite
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ring_fused_symmetric_infonce(a, b, scale, axis_name, dot_dtype=None):
    """Global-batch symmetric InfoNCE over a mesh axis with ring-overlap.

    a, b: (b_l, d) L2-normalized local shards inside shard_map. Returns the
    replicated scalar global loss (mean over the 2*B_g row CEs)."""
    loss, _ = _ring_sym_fwd(a, b, scale, axis_name, dot_dtype)
    return loss


def _ring_sym_fwd(a, b, scale, axis_name, dot_dtype):
    n = jax.lax.axis_size(axis_name)
    bl = a.shape[0]
    perm = _ring_perm(n)
    neg = jnp.full((bl, 1), NEG_INF, jnp.float32)

    def step(carry, _):
        y_cur, col_lse_cur, row_lse = carry
        r_step, c_step = _sym_row_col_lse(a, y_cur, scale, dot_dtype=dot_dtype)
        row_lse = _logaddexp(row_lse, r_step)
        col_lse_cur = _logaddexp(col_lse_cur, c_step)
        y_cur, col_lse_cur = jax.lax.ppermute(
            (y_cur, col_lse_cur), axis_name, perm)
        return (y_cur, col_lse_cur, row_lse), None

    (b_home, col_lse, row_lse), _ = jax.lax.scan(
        step, (b, neg, neg), None, length=n)
    # after n permutes the shard (and its completed stats) is back home
    diag = jnp.sum(a * b, axis=-1, keepdims=True)  # local positives
    B_g = bl * n
    local = jnp.sum(row_lse - scale * diag) + jnp.sum(col_lse - scale * diag)
    loss = jax.lax.psum(local, axis_name) / (2.0 * B_g)
    return loss, (a, b, scale, row_lse, col_lse, diag)


def _ring_sym_bwd(axis_name, dot_dtype, res, g):
    a, b, scale, row_lse, col_lse, diag = res
    n = jax.lax.axis_size(axis_name)
    bl = a.shape[0]
    B_g = bl * n
    perm = _ring_perm(n)
    # shard_map hands each device 1/n of the replicated output's cotangent;
    # SHARDED inputs (a, b) consume the full cotangent directly -> psum it
    # back. REPLICATED inputs (scale) get their per-device cotangents summed
    # by the shard_map transpose itself, so they keep the raw g.
    coef_sharded = jax.lax.psum(g, axis_name) / B_g
    coef = g / B_g

    def step(carry, _):
        y_cur, col_lse_cur, dy_cur, acc_x, rowdot = carry
        px_y, rd = _sym_grad_pass(a, y_cur, scale, row_lse, col_lse_cur,
                                  dot_dtype)
        acc_x = acc_x + px_y
        rowdot = rowdot + rd
        py_x, _ = _sym_grad_pass(y_cur, a, scale, col_lse_cur, row_lse,
                                 dot_dtype)
        dy_cur = dy_cur + py_x
        y_cur, col_lse_cur, dy_cur = jax.lax.ppermute(
            (y_cur, col_lse_cur, dy_cur), axis_name, perm)
        return (y_cur, col_lse_cur, dy_cur, acc_x, rowdot), None

    zeros_y = jnp.zeros((bl, a.shape[1]), jnp.float32)
    (b_home, _, dy_home, acc_x, rowdot), _ = jax.lax.scan(
        step, (b, col_lse, zeros_y, jnp.zeros_like(a, jnp.float32),
               jnp.zeros((bl, 1), jnp.float32)),
        None, length=n)
    da = 0.5 * coef_sharded * scale * acc_x - coef_sharded * scale * b
    db = 0.5 * coef_sharded * scale * dy_home - coef_sharded * scale * a
    dscale = 0.5 * coef * jax.lax.psum(jnp.sum(rowdot), axis_name) \
        - coef * jax.lax.psum(jnp.sum(diag), axis_name)
    return da.astype(a.dtype), db.astype(b.dtype), dscale.astype(scale.dtype)


ring_fused_symmetric_infonce.defvjp(_ring_sym_fwd, _ring_sym_bwd)


def ring_fused_clip_loss(
    emb_a: jax.Array,
    emb_b: jax.Array,
    logit_scale: jax.Array,
    axis_name: str,
    max_scale: float = 100.0,
    dot_dtype=None,
    label_smoothing: float = 0.0,
) -> Tuple[jax.Array, dict]:
    """shard_map entry point: normalize local shards, ring-fused global loss.

    Drop-in for fused_clip_loss(axis_name=...) when no hard-negative cache is
    used; the smoothing adjustment composes the same way (psum'd)."""
    a = l2_normalize(emb_a)
    b = l2_normalize(emb_b)
    scale = effective_scale(logit_scale, max_scale)
    loss = ring_fused_symmetric_infonce(a, b, scale, axis_name, dot_dtype)
    if label_smoothing > 0.0:
        bl = a.shape[0]
        idx = jax.lax.axis_index(axis_name)
        labels = idx * bl + jnp.arange(bl, dtype=jnp.int32)
        cols_b = jax.lax.all_gather(b, axis_name, tiled=True)
        cols_a = jax.lax.all_gather(a, axis_name, tiled=True)
        adj = 0.5 * (
            _smoothing_adjustment(a, cols_b, scale, labels, label_smoothing)
            + _smoothing_adjustment(b, cols_a, scale, labels, label_smoothing)
        )
        loss = loss + jax.lax.pmean(adj, axis_name)
    return loss, {"loss_a": loss, "loss_b": loss, "logit_scale": scale}


def fused_multiway_clip_loss(
    embeddings: dict,
    logit_scale: jax.Array,
    pairs=None,
    max_scale: float = 100.0,
    label_smoothing: float = 0.0,
    weights=None,
    axis_name: Optional[str] = None,
    dot_dtype=None,
    materialize_raw="auto",
) -> Tuple[jax.Array, dict]:
    """Fused-kernel multiway CLIP loss (tf nb cell 41 3-way semantics).

    Each modality pair term is exactly the pairwise-symmetric shape the fused
    kernel handles, so the three B x B similarity matrices of
    infonce.multiway_clip_loss never materialize in HBM. With `axis_name`
    (inside shard_map) every pair routes through the ring-scheduled
    global-batch kernel — the gather-for-every-variant semantics of
    old/clip_opt.py:102-112 with the gather absorbed into the ring schedule.
    Parity with infonce.multiway_clip_loss: rtol ~1e-4 (no per-pair accuracy
    metric — the fused kernels never materialize the argmax row).
    """
    names = list(embeddings.keys())
    if pairs is None:
        pairs = tuple(
            (names[i], names[j])
            for i in range(len(names))
            for j in range(i + 1, len(names))
        )
    total = jnp.zeros(())
    metrics = {}
    for a_name, b_name in pairs:
        if a_name not in embeddings or b_name not in embeddings:
            continue
        a, b = embeddings[a_name], embeddings[b_name]
        if axis_name is not None:
            loss, _ = ring_fused_clip_loss(
                a, b, logit_scale, axis_name=axis_name, max_scale=max_scale,
                dot_dtype=dot_dtype, label_smoothing=label_smoothing,
            )
        else:
            loss, _ = fused_clip_loss(
                a, b, logit_scale, max_scale=max_scale, dot_dtype=dot_dtype,
                label_smoothing=label_smoothing,
                materialize_raw=materialize_raw,
            )
        w = 1.0 if weights is None else weights.get((a_name, b_name), 1.0)
        total = total + w * loss
        metrics[f"loss_{a_name}_{b_name}"] = loss
    metrics["logit_scale"] = effective_scale(logit_scale, max_scale)
    return total, metrics


# ---------------------------------------------------------------------------
# shared-raw forward: one B x B pass yields BOTH directions' logsumexps
# ---------------------------------------------------------------------------
#
# lse_b (row lse of scale*b a^T) equals the column lse of scale*a b^T, so the
# forward can compute the raw matrix once: row stats accumulate online in
# scratch (exact), column stats are emitted as per-row-block partials
# (block max + sumexp relative to it) and combined with an exact logsumexp
# over the nm partials in XLA — no bounded-max approximation needed.
# Cuts the symmetric forward from 2 full matmul passes to 1.


def _sym_lse_impl(x_ref, y_ref, scale_ref, colmask_ref, rowmask_ref,
                  row_lse_ref, colmax_ref, colsum_ref, raw_ref, m_scr, l_scr,
                  *, nn: int, resident_n: int = 0, masked: bool = True):
    """Single-exp tile: the forward is VPU-bound (one matmul vs the exp
    traffic), so the column statistics are DERIVED from the row-shifted
    probabilities instead of a second exp:

        exp(s - M) summed over rows  ==  sum_i p_ij * e_i,
        p = exp(s + colmask - m_r_i),  e_i = exp(m_r_i + rowmask_i - M),
        M = tile max of (m_r + rowmask)

    e_i <= 1 by construction (no overflow); cold/padded rows underflow to 0
    exactly like fp32 softmax. Measured 1.5x on the forward pass on v5e.

    `raw_ref` (optional): int16 fixed-point copy of the raw tile for the
    materialized backward (see RAW_QSCALE).
    """
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    x = x_ref[:]
    if resident_n:
        # whole (np_, d) operand VMEM-resident (grid-invariant block): no
        # per-row-block re-stream of y — slice this program's column block
        y = y_ref[pl.ds(jn * resident_n, resident_n), :]
    else:
        y = y_ref[:]
    scale = scale_ref[0, 0]

    raw = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if raw_ref is not None:
        raw_ref[:] = jnp.round(raw * RAW_QSCALE).astype(jnp.int16)
    s = raw * scale
    if masked:
        s = s + colmask_ref[0]  # (1, bn): -1e30 on padded columns

    # row stats (online logsumexp over the column grid axis)
    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_tile = jnp.max(s, axis=-1, keepdims=True)  # (bm, 1)
    m_new = jnp.maximum(m_prev, m_tile)
    p = jnp.exp(s - m_new)  # the ONLY per-element exp
    l_new = l_prev * jnp.exp(m_prev - m_new) + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jn == nn - 1)
    def _():
        row_lse_ref[:] = m_scr[:, 0:1] + jnp.log(jnp.maximum(l_scr[:, 0:1], 1e-30))

    # column partials from the SAME p (padded rows drop out via rowmask)
    if masked:
        rowmask = rowmask_ref[0]  # (1, bm): -1e30 on padded rows
        m_r = m_new + rowmask.reshape(-1, 1)[: s.shape[0]]  # (bm, 1)
    else:
        m_r = m_new
    M = jnp.max(m_r)  # tile scalar
    e_i = jnp.exp(m_r - M)  # (bm, 1), <= 1
    p_c = jnp.sum(p * e_i, axis=0, keepdims=True)  # (1, bn)
    colmax_ref[0] = jnp.broadcast_to(M, colmax_ref.shape[1:])
    colsum_ref[0] = p_c


def _sym_lse_kernel(x_ref, y_ref, scale_ref, colmask_ref, rowmask_ref,
                    row_lse_ref, colmax_ref, colsum_ref, m_scr, l_scr,
                    *, nn: int, resident_n: int = 0, masked: bool = True):
    _sym_lse_impl(x_ref, y_ref, scale_ref, colmask_ref, rowmask_ref,
                  row_lse_ref, colmax_ref, colsum_ref, None, m_scr, l_scr,
                  nn=nn, resident_n=resident_n, masked=masked)


def _sym_lse_save_kernel(x_ref, y_ref, scale_ref, colmask_ref, rowmask_ref,
                         row_lse_ref, colmax_ref, colsum_ref, raw_ref,
                         m_scr, l_scr, *, nn: int, resident_n: int = 0,
                         masked: bool = True):
    _sym_lse_impl(x_ref, y_ref, scale_ref, colmask_ref, rowmask_ref,
                  row_lse_ref, colmax_ref, colsum_ref, raw_ref, m_scr, l_scr,
                  nn=nn, resident_n=resident_n, masked=masked)


# whole-operand VMEM residency: below this byte size the (n, d) embedding
# operand of a loss kernel is loaded ONCE as a grid-invariant block instead
# of re-streaming an (block, d) tile per outer grid step (which costs
# nm * n * d * esize of redundant DMA). 12 MB covers B=8192 at d<=768 bf16
# (d=1024 is 16 MB and takes the streaming path); bigger shapes stream.
RESIDENT_BYTES_LIMIT = 12 * 1024 * 1024


def _resident_bytes(arr) -> int:
    return arr.size * arr.dtype.itemsize


def _loss_vmem_params(resident: bool, operand):
    """Raise Mosaic's scoped-VMEM limit only when the resident operand plus
    double-buffered tiles would not fit the 16 MB default."""
    if not resident:
        return None
    need = _resident_bytes(operand) + 6 * 1024 * 1024
    if need <= 15 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(need + 4 * 1024 * 1024, 110 * 1024 * 1024))


def _sym_row_col_lse(x, y, scale, dot_dtype=None,
                     block_m: int = BLOCK_M, block_n: int = BLOCK_N,
                     save_raw: bool = False):
    """One pass over scale * x y^T returning (row_lse (m,1), col_lse (n,1)),
    plus the padded (mp, np_) int16 raw buffer when `save_raw`."""
    m, d = x.shape
    n = y.shape[0]
    block_m = min(block_m, _round_up(m, 8))
    block_n = min(block_n, _round_up(n, 128))
    mp, np_ = _round_up(m, block_m), _round_up(n, block_n)
    xp = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    yp = jnp.pad(y, ((0, np_ - n), (0, 0))) if np_ != n else y
    if dot_dtype is not None:
        xp, yp = xp.astype(dot_dtype), yp.astype(dot_dtype)
    colmask = jnp.where(jnp.arange(np_)[None, :] < n, 0.0, NEG_INF).astype(
        jnp.float32)[None]
    rowmask = jnp.where(jnp.arange(mp)[None, :] < m, 0.0, NEG_INF).astype(
        jnp.float32)[None]
    scale2d = scale.reshape(1, 1).astype(jnp.float32)
    nm, nn = mp // block_m, np_ // block_n

    out_specs = [
        pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
        pl.BlockSpec((1, 1, block_n), lambda i, j: (i, 0, j)),
        pl.BlockSpec((1, 1, block_n), lambda i, j: (i, 0, j)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        jax.ShapeDtypeStruct((nm, 1, np_), jnp.float32),
        jax.ShapeDtypeStruct((nm, 1, np_), jnp.float32),
    ]
    kernel = _sym_lse_kernel
    if save_raw:
        out_specs.append(pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)))
        out_shape.append(jax.ShapeDtypeStruct((mp, np_), jnp.int16))
        kernel = _sym_lse_save_kernel

    resident = _resident_bytes(yp) <= RESIDENT_BYTES_LIMIT
    masked = mp != m or np_ != n
    y_spec = (
        pl.BlockSpec((np_, d), lambda i, j: (0, 0)) if resident
        else pl.BlockSpec((block_n, d), lambda i, j: (j, 0))
    )
    outs = pl.pallas_call(
        functools.partial(kernel, nn=nn,
                          resident_n=block_n if resident else 0,
                          masked=masked),
        grid=(nm, nn),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            y_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, 1, block_m), lambda i, j: (0, 0, i)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_m, 128), jnp.float32),
            pltpu.VMEM((block_m, 128), jnp.float32),
        ],
        compiler_params=_loss_vmem_params(resident, yp),
    )(xp, yp, scale2d, colmask, rowmask)
    row_lse, colmax, colsum = outs[:3]

    # exact combine of the nm column partials
    log_part = colmax[:, 0, :] + jnp.log(jnp.maximum(colsum[:, 0, :], 1e-30))
    col_lse = jax.nn.logsumexp(log_part, axis=0)[:, None]  # (np_, 1)
    if save_raw:
        return row_lse[:m], col_lse[:n], outs[3]
    return row_lse[:m], col_lse[:n]
