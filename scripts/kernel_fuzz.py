#!/usr/bin/env python
"""Shape-fuzz the Pallas kernels against their pure-JAX references.

The parity tests cover curated shapes; this harness samples random
IN-CONSTRAINT shapes/dtypes/flags and compares loss AND gradients in
interpret mode on CPU (no TPU needed). Run it after kernel changes:

    python scripts/kernel_fuzz.py --seed 0 --cases 30 --op all

Any failing case prints its full recipe so it can be committed as a
regression test.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu


def _close(a, b, atol, rtol, name, recipe):
    """Scale-normalized: per-element relative error explodes where the
    reference is ~0; compare against the tensor's magnitude instead."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(float(np.max(np.abs(b))), 1e-6)
    err = float(np.max(np.abs(a - b)))
    if err > atol + rtol * scale:
        raise AssertionError(
            f"{name} mismatch (maxabs {err:.2e} vs scale {scale:.2e}) "
            f"for {recipe}")


def fuzz_fused_loss(rng: np.random.Generator, case: int) -> str:
    from clip_dplm_tpu.ops import infonce
    from clip_dplm_tpu.ops.fused_infonce import fused_clip_loss

    B = int(rng.choice([8, 17, 33, 64, 100, 160]))
    d = int(rng.choice([16, 48, 64, 136, 256]))
    dt = rng.choice(["float32", "bfloat16"])
    smooth = float(rng.choice([0.0, 0.1]))
    mat = bool(rng.choice([True, False]))
    recipe = f"loss B={B} d={d} dtype={dt} smooth={smooth} mat={mat}"

    a = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
    ls = jnp.asarray(np.float32(rng.uniform(0.0, 4.0)))
    dot = jnp.bfloat16 if dt == "bfloat16" else None

    def f_ref(a, b, ls):
        return infonce.clip_loss(a, b, ls, label_smoothing=smooth)[0]

    def f_fused(a, b, ls):
        return fused_clip_loss(a, b, ls, label_smoothing=smooth,
                               dot_dtype=dot, materialize_raw=mat)[0]

    ref_l, ref_g = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(a, b, ls)
    with pltpu.force_tpu_interpret_mode():
        got_l, got_g = jax.value_and_grad(f_fused, argnums=(0, 1, 2))(a, b, ls)
    tol = 2e-2 if dt == "bfloat16" else (5e-3 if mat else 1e-4)
    _close(got_l, ref_l, tol, tol, "loss", recipe)
    for g1, g2, n in zip(got_g, ref_g, ["da", "db", "dls"]):
        _close(g1, g2, tol, tol, n, recipe)
    return recipe


def fuzz_short_attention(rng: np.random.Generator, case: int) -> str:
    from clip_dplm_tpu.ops.short_attention import fused_short_attention

    B = int(rng.choice([1, 2, 5]))
    S = int(rng.choice([16, 40, 64, 96, 128]))
    H = int(rng.choice([1, 2, 4]))
    Dh = int(rng.choice([32, 64]))
    D = H * Dh
    recipe = f"attn B={B} S={S} H={H} Dh={Dh}"

    q = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    lens = rng.integers(1, S + 1, size=(B,))
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

    def heads(x):
        return x.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

    def ref(q, k, v):
        qh, kh, vh = heads(q), heads(k), heads(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(Dh)
        s = jnp.where(mask[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        return jnp.sum(jnp.where(mask[..., None], o, 0.0) ** 2)

    def fused(q, k, v):
        # save_probs=False: the bf16-saved-probs default backward is a
        # perf trade tested separately with loose tolerance
        o = fused_short_attention(q, k, v, H, mask=mask,
                                  save_probs=False)
        return jnp.sum(jnp.where(mask[..., None], o, 0.0) ** 2)

    ref_l, ref_g = jax.value_and_grad(ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got_l, got_g = jax.value_and_grad(fused, argnums=(0, 1, 2))(q, k, v)
    _close(got_l, ref_l, 1e-3, 1e-3, "out", recipe)
    for g1, g2, n in zip(got_g, ref_g, ["dq", "dk", "dv"]):
        _close(g1, g2, 1e-3, 1e-3, n, recipe)
    return recipe


def fuzz_qkv_proj(rng: np.random.Generator, case: int) -> str:
    """Packed-qkv attention with fused out-projection (and optional
    in-kernel RoPE) vs split + reference attention + XLA rotary/proj."""
    from clip_dplm_tpu.models.esm import rotary_embed_bsd
    from clip_dplm_tpu.ops.short_attention import (
        fused_short_attention_qkv_proj,
        short_attention_reference,
    )

    B = int(rng.choice([1, 2, 5]))
    S = int(rng.choice([16, 40, 64, 96, 128]))
    H = int(rng.choice([1, 2, 4]))
    Dh = int(rng.choice([32, 64]))  # even: in-kernel RoPE requirement
    rope = bool(rng.choice([True, False]))
    D = H * Dh
    recipe = f"qkv_proj B={B} S={S} H={H} Dh={Dh} rope={rope}"

    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)), jnp.float32)
    wo = jnp.asarray(rng.normal(size=(D, D)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    lens = rng.integers(1, S + 1, size=(B,))
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])
    w = mask[:, :, None].astype(jnp.float32)
    pos = jnp.arange(S) if rope else None

    def ref(qkv, wo, bo):
        q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
        if rope:
            q = rotary_embed_bsd(q, pos, H)
            k = rotary_embed_bsd(k, pos, H)
        o = short_attention_reference(q, k, v, H, mask=mask)
        return jnp.sum(jnp.sin((o @ wo + bo) * w))

    def fused(qkv, wo, bo):
        return jnp.sum(jnp.sin(fused_short_attention_qkv_proj(
            qkv, wo, bo, H, mask=mask, save_probs=False,
            rope_positions=pos) * w))

    ref_l, ref_g = jax.value_and_grad(ref, argnums=(0, 1, 2))(qkv, wo, bo)
    with pltpu.force_tpu_interpret_mode():
        got_l, got_g = jax.value_and_grad(
            fused, argnums=(0, 1, 2))(qkv, wo, bo)
    _close(got_l, ref_l, 1e-3, 1e-3, "out", recipe)
    for g1, g2, n in zip(got_g, ref_g, ["dqkv", "dwo", "dbo"]):
        _close(g1, g2, 1e-3, 1e-3, n, recipe)
    return recipe


def fuzz_cls_attention(rng: np.random.Generator, case: int) -> str:
    """CLS-query kernel vs full reference attention sliced to row 0."""
    from clip_dplm_tpu.ops.short_attention import (
        fused_cls_attention,
        short_attention_reference,
    )

    B = int(rng.choice([1, 2, 5, 9]))
    S = int(rng.choice([16, 40, 64, 96, 128]))
    H = int(rng.choice([1, 2, 4, 8]))
    Dh = int(rng.choice([32, 64]))
    D = H * Dh
    recipe = f"cls B={B} S={S} H={H} Dh={Dh}"

    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)), jnp.float32)
    lens = rng.integers(1, S + 1, size=(B,))  # row 0 always a real token
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

    def ref(qkv):
        q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
        o = short_attention_reference(q, k, v, H, mask=mask)[:, :1]
        return jnp.sum(jnp.sin(o))

    def fused(qkv):
        return jnp.sum(jnp.sin(fused_cls_attention(qkv, H, mask=mask)))

    ref_l, ref_g = jax.value_and_grad(ref)(qkv)
    with pltpu.force_tpu_interpret_mode():
        got_l, got_g = jax.value_and_grad(fused)(qkv)
    _close(got_l, ref_l, 1e-3, 1e-3, "out", recipe)
    _close(got_g, ref_g, 1e-3, 1e-3, "dqkv", recipe)
    return recipe


def fuzz_fused_dense(rng: np.random.Generator, case: int) -> str:
    from clip_dplm_tpu.ops.fused_dense import fused_dense_norm_act

    M = int(rng.choice([8, 24, 72, 128]))
    K = int(rng.choice([16, 64, 176]))
    N = int(rng.choice([128, 256]))
    act = rng.choice(["relu", "gelu", "tanh", "none"])
    order = rng.choice(["ln_act", "act_ln"])
    if order == "act_ln" and act in ("gelu", "silu"):
        act = "relu"
    recipe = f"dense M={M} K={K} N={N} act={act} order={order}"

    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) / np.sqrt(K), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(N,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(N,)) * 0.1, jnp.float32)

    def _act(u):
        return {"relu": jax.nn.relu, "gelu": jax.nn.gelu,
                "tanh": jnp.tanh, "none": lambda z: z}[act](u)

    def _ln(u):
        mu = u.mean(-1, keepdims=True)
        var = u.var(-1, keepdims=True)
        return (u - mu) / jnp.sqrt(var + 1e-6) * gamma + beta

    def ref(x, w, bias):
        u = x @ w + bias
        return jnp.sum(_act(_ln(u)) ** 2) if order == "ln_act" \
            else jnp.sum(_ln(_act(u)) ** 2)

    def fused(x, w, bias):
        y = fused_dense_norm_act(x, w, bias, gamma, beta, act=act,
                                 order=order, deterministic=True,
                                 compute_dtype=jnp.float32)
        return jnp.sum(y ** 2)

    ref_l, ref_g = jax.value_and_grad(ref, argnums=(0, 1, 2))(x, w, bias)
    with pltpu.force_tpu_interpret_mode():
        got_l, got_g = jax.value_and_grad(fused, argnums=(0, 1, 2))(x, w, bias)
    _close(got_l, ref_l, 1e-3, 1e-3, "y", recipe)
    for g1, g2, n in zip(got_g, ref_g, ["dx", "dw", "dbias"]):
        _close(g1, g2, 1e-3, 1e-3, n, recipe)
    return recipe


def fuzz_tiny_attention(rng: np.random.Generator, case: int) -> str:
    """Packed-diagonal tiny-S attention+proj vs split + reference + proj."""
    from clip_dplm_tpu.ops.short_attention import (
        fused_tiny_attention_proj,
        short_attention_reference,
    )

    B = int(rng.choice([1, 3, 8, 19, 33]))
    S = int(rng.choice([2, 5, 10, 16, 31, 48]))
    H = int(rng.choice([1, 2, 4, 8]))
    Dh = int(rng.choice([8, 32, 64]))
    D = H * Dh
    masked = bool(rng.choice([True, False]))
    recipe = f"tiny_attn B={B} S={S} H={H} Dh={Dh} masked={masked}"

    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)), jnp.float32)
    wo = jnp.asarray(rng.normal(size=(D, D)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    if masked:
        lens = rng.integers(1, S + 1, size=(B,))
        mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])
        w = mask[:, :, None].astype(jnp.float32)
    else:
        mask, w = None, jnp.ones((B, S, 1), jnp.float32)

    def ref(qkv, wo, bo):
        q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
        o = short_attention_reference(q, k, v, H, mask=mask)
        return jnp.sum(jnp.sin((o @ wo + bo) * w))

    def fused(qkv, wo, bo):
        return jnp.sum(jnp.sin(fused_tiny_attention_proj(
            qkv, wo, bo, H, mask=mask, interpret=True) * w))

    ref_l, ref_g = jax.value_and_grad(ref, argnums=(0, 1, 2))(qkv, wo, bo)
    with pltpu.force_tpu_interpret_mode():
        got_l, got_g = jax.value_and_grad(
            fused, argnums=(0, 1, 2))(qkv, wo, bo)
    _close(got_l, ref_l, 1e-3, 1e-3, "out", recipe)
    for g1, g2, n in zip(got_g, ref_g, ["dqkv", "dwo", "dbo"]):
        _close(g1, g2, 1e-3, 1e-3, n, recipe)
    return recipe


FUZZERS = {
    "loss": fuzz_fused_loss,
    "attn": fuzz_short_attention,
    "qkv_proj": fuzz_qkv_proj,
    "cls": fuzz_cls_attention,
    "tiny": fuzz_tiny_attention,
    "dense": fuzz_fused_dense,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cases", type=int, default=20)
    ap.add_argument("--op", default="all", choices=["all"] + list(FUZZERS))
    args = ap.parse_args()

    ops = list(FUZZERS) if args.op == "all" else [args.op]
    failures = 0
    for op in ops:
        for c in range(args.cases):
            rng = np.random.default_rng(args.seed * 10_000 + c)
            try:
                recipe = FUZZERS[op](rng, c)
                print(f"ok   {recipe}")
            except Exception:
                failures += 1
                print(f"FAIL {op} case={c} seed={args.seed}")
                traceback.print_exc()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
