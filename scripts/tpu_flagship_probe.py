"""Decompose the flagship RNA<->RBP token-transformer step on the real TPU:
full step vs deterministic forward vs dropout forward. Same honest scan
methodology as scripts/tpu_profile_step.py."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models.token_towers import RNARBPCLIP
    from clip_dplm_tpu.train import create_train_state, make_train_step

    B = int(os.environ.get("BENCH_B", 1024))
    sa = sb = 127
    extra = [o for o in os.environ.get("BENCH_OVERRIDES", "").split(",") if o]
    cfg = apply_overrides(
        Config(),
        [
            "experiment=rna_rbp",
            "rna_tower.input_dim=120", "rna_tower.d_model=512",
            "rna_tower.num_layers=3", "rna_tower.num_heads=8",
            f"rna_tower.max_len={sa + 1}",
            "rbp_tower.input_dim=1280", "rbp_tower.d_model=512",
            "rbp_tower.num_layers=3", "rbp_tower.num_heads=8",
            f"rbp_tower.max_len={sb + 1}",
            "train.optim.fused_update=true",
            "projection.dim=512",
            f"train.batch_size={B}",
            "train.optim.total_steps=1000",
            "train.optim.moment_dtype=bfloat16",
            "contrastive.use_fused_kernel=true",
            "train.rng_impl=unsafe_rbg",
            "projection.fused_dense=true",
        ] + extra,
    )
    model = RNARBPCLIP(cfg=cfg)
    rng = np.random.default_rng(0)
    la = rng.integers(sa // 2, sa, B)
    lb = rng.integers(sb // 2, sb, B)
    batch = {
        "rna_tokens": jnp.asarray(rng.normal(size=(B, sa, 120)).astype(np.float32)),
        "rna_mask": jnp.asarray(np.arange(sa)[None, :] < la[:, None]),
        "rbp_tokens": jnp.asarray(rng.normal(size=(B, sb, 1280)).astype(np.float32)),
        "rbp_mask": jnp.asarray(np.arange(sb)[None, :] < lb[:, None]),
    }
    state = create_train_state(model, cfg, batch)
    step = make_train_step(cfg)
    iters = int(os.environ.get("BENCH_ITERS", 20))

    @jax.jit
    def full(state, batch):
        def body(s, _):
            s, m = step(s, batch)
            return s, m["loss"]
        state, losses = jax.lax.scan(body, state, None, length=iters)
        return losses[-1]

    print("full:", round(timed(full, state, batch, iters=iters) * 1e3, 2),
          "ms", flush=True)

    # batch must be a jit ARGUMENT: closed-over arrays become inline
    # constants in the serialized program, and the 0.5 GB token batch then
    # overflows the remote-compile request (HTTP 413)
    def perturbed(b, c):
        return {
            "rna_tokens": b["rna_tokens"] + 1e-9 * c,
            "rna_mask": b["rna_mask"],
            "rbp_tokens": b["rbp_tokens"] + 1e-9 * c,
            "rbp_mask": b["rbp_mask"],
        }

    @jax.jit
    def fwd_det(params, b):
        def body(c, _):
            out = model.apply({"params": params}, perturbed(b, c),
                              deterministic=True)
            return (jnp.sum(out["emb_a"]) + jnp.sum(out["emb_b"])).astype(
                jnp.float32) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    print("fwd_det:", round(
        timed(fwd_det, state.params, batch, iters=iters) * 1e3, 2),
        "ms", flush=True)

    key = jax.random.key(0, impl="unsafe_rbg")

    @jax.jit
    def fwd_drop(params, b):
        def body(c, _):
            out = model.apply({"params": params}, perturbed(b, c),
                              deterministic=False, rngs={"dropout": key})
            return (jnp.sum(out["emb_a"]) + jnp.sum(out["emb_b"])).astype(
                jnp.float32) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    print("fwd_drop:", round(
        timed(fwd_drop, state.params, batch, iters=iters) * 1e3, 2),
        "ms", flush=True)


def probe_block():
    """Isolate one TransformerBlock's forward pieces at the flagship shape."""
    import functools

    import flax.linen as nn

    from clip_dplm_tpu.models.layers import TransformerBlock
    from clip_dplm_tpu.ops.attention import attention_reference

    B, S, D, H = 1024, 128, 512, 8
    iters = int(os.environ.get("BENCH_ITERS", 30))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32), jnp.bfloat16)
    qh = jnp.asarray(rng.normal(size=(B, H, S, D // H)).astype(np.float32),
                     jnp.bfloat16)
    mask = jnp.asarray(np.ones((B, S), bool))

    block = TransformerBlock(d_model=D, num_heads=H, dropout=0.0)
    params = block.init(jax.random.PRNGKey(0), x)["params"]

    def chain(body):
        @jax.jit
        def run(*args):
            def f(c, _):
                out = body(c, *args)
                return jnp.sum(out).astype(jnp.float32) * 1e-9, ()
            c, _ = jax.lax.scan(f, jnp.float32(0.0), None, length=iters)
            return c
        return run

    run_block = chain(lambda c, p, x: block.apply(
        {"params": p}, x + c.astype(x.dtype), mask=mask, deterministic=True))
    print("block fwd:", round(timed(run_block, params, x, iters=iters) * 1e3, 3),
          "ms", flush=True)

    run_attn = chain(lambda c, q: attention_reference(
        q + c.astype(q.dtype), q, q, mask=mask))
    print("attention fwd:", round(timed(run_attn, qh, iters=iters) * 1e3, 3),
          "ms", flush=True)

    dense_qkv = nn.Dense(3 * D, dtype=jnp.bfloat16)
    pq = dense_qkv.init(jax.random.PRNGKey(1), x)["params"]
    dense_f1 = nn.Dense(4 * D, dtype=jnp.bfloat16)
    pf1 = dense_f1.init(jax.random.PRNGKey(2), x)["params"]
    dense_f2 = nn.Dense(D, dtype=jnp.bfloat16)
    pf2 = dense_f2.init(jax.random.PRNGKey(3), jnp.zeros((1, 1, 4 * D)))["params"]
    dense_o = nn.Dense(D, dtype=jnp.bfloat16)
    po = dense_o.init(jax.random.PRNGKey(4), x)["params"]

    def mats(c, x):
        h = dense_qkv.apply({"params": pq}, x + c.astype(x.dtype))
        o = dense_o.apply({"params": po}, h[..., :D])
        f = dense_f2.apply({"params": pf2},
                           nn.gelu(dense_f1.apply({"params": pf1}, o)))
        return f
    run_mats = chain(mats)
    print("dense-only fwd:", round(timed(run_mats, x, iters=iters) * 1e3, 3),
          "ms", flush=True)

    ln = nn.LayerNorm(dtype=jnp.float32)
    pl_ = ln.init(jax.random.PRNGKey(5), x)["params"]
    run_ln = chain(lambda c, x: ln.apply({"params": pl_}, x + c.astype(x.dtype)))
    print("one LN fwd:", round(timed(run_ln, x, iters=iters) * 1e3, 3),
          "ms", flush=True)


if __name__ == "__main__":
    if os.environ.get("PROBE_BLOCK"):
        probe_block()
    else:
        main()
