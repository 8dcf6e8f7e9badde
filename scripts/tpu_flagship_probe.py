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

    def perturbed(c):
        return {
            "rna_tokens": batch["rna_tokens"] + 1e-9 * c,
            "rna_mask": batch["rna_mask"],
            "rbp_tokens": batch["rbp_tokens"] + 1e-9 * c,
            "rbp_mask": batch["rbp_mask"],
        }

    @jax.jit
    def fwd_det(params):
        def body(c, _):
            out = model.apply({"params": params}, perturbed(c),
                              deterministic=True)
            return (jnp.sum(out["emb_a"]) + jnp.sum(out["emb_b"])).astype(
                jnp.float32) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    print("fwd_det:", round(timed(fwd_det, state.params, iters=iters) * 1e3, 2),
          "ms", flush=True)

    key = jax.random.key(0, impl="unsafe_rbg")

    @jax.jit
    def fwd_drop(params):
        def body(c, _):
            out = model.apply({"params": params}, perturbed(c),
                              deterministic=False, rngs={"dropout": key})
            return (jnp.sum(out["emb_a"]) + jnp.sum(out["emb_b"])).astype(
                jnp.float32) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    print("fwd_drop:", round(timed(fwd_drop, state.params, iters=iters) * 1e3, 2),
          "ms", flush=True)


if __name__ == "__main__":
    main()
