"""Probe the remaining perf levers on the real TPU: materialized-raw fused
loss vs recompute, and optimizer variants (global-norm clip cost, bf16
moments). Chained-scan methodology per CLAUDE.md (carry-perturbed inputs,
host fetch).
"""

from __future__ import annotations

import json
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


def digest(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(x).astype(jnp.float32) for x in leaves if hasattr(x, "dtype"))


def main():
    iters = int(os.environ.get("ITERS", 50))
    B = int(os.environ.get("B", 8192))
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models import TwoTowerCLIP
    from clip_dplm_tpu.ops.fused_infonce import fused_symmetric_infonce
    from clip_dplm_tpu.ops.infonce import l2_normalize
    from clip_dplm_tpu.train import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    emb_a = l2_normalize(jnp.asarray(rng.normal(size=(B, 512)).astype(np.float32)))
    emb_b = l2_normalize(jnp.asarray(rng.normal(size=(B, 512)).astype(np.float32)))
    scale = jnp.float32(14.28)

    # --- loss fwd+bwd: materialized vs recompute ---
    for mat in (False, True):
        def loss_fn(a, b, s):
            return fused_symmetric_infonce(a, b, s, jnp.bfloat16, mat)

        @jax.jit
        def loss_grad():
            def body(c, _):
                a = emb_a + 1e-9 * c
                b = emb_b + 1e-9 * c
                l, g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(a, b, scale)
                return digest(g) + l, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        t = timed(loss_grad, iters=iters)
        print(json.dumps({"what": f"loss_mat={mat}", "ms": round(t * 1e3, 3)}),
              flush=True)

    # --- full train step variants ---
    base_over = [
        "tower_a.input_dim=256", "tower_a.hidden_size=1024",
        "tower_a.num_hidden_layers=3",
        "tower_b.input_dim=1280", "tower_b.hidden_size=1024",
        "tower_b.num_hidden_layers=3",
        "projection.dim=512", f"train.batch_size={B}",
        "train.optim.total_steps=1000",
        "contrastive.use_fused_kernel=true",
        "train.rng_impl=unsafe_rbg",
    ]
    variants = {
        "step_recompute": ["contrastive.fused_materialize_raw=never"],
        "step_mat": ["contrastive.fused_materialize_raw=always"],
        "step_mat_bf16mom": [
            "contrastive.fused_materialize_raw=always",
            "train.optim.moment_dtype=bfloat16",
        ],
        "step_mat_noclip": [
            "contrastive.fused_materialize_raw=always",
            "train.optim.grad_clip_norm=0.0",
        ],
    }
    batch = {
        "a": jnp.asarray(rng.normal(size=(B, 256)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(B, 1280)).astype(np.float32)),
    }
    for name, extra in variants.items():
        cfg = apply_overrides(Config(), base_over + extra)
        model = TwoTowerCLIP(cfg=cfg)
        state = create_train_state(model, cfg, batch)
        step = make_train_step(cfg)

        @jax.jit
        def multi(state, batch):
            def body(s, _):
                s, m = step(s, batch)
                return s, m["loss"]
            s, losses = jax.lax.scan(body, state, None, length=iters)
            return losses[-1]

        t = timed(multi, state, batch, iters=iters)
        print(json.dumps({"what": name, "ms": round(t * 1e3, 3),
                          "pairs_per_s": round(B / t)}), flush=True)


if __name__ == "__main__":
    main()
