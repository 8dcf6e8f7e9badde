"""Decompose the two-tower train step on the real TPU: forward, backward,
loss, optimizer, dropout cost, at several batch sizes — the evidence base for
the perf work (RESULTS.md perf decomposition).

Methodology (CLAUDE.md + verify skill): every timing chains K iterations
inside one jit via lax.scan; EVERY input is perturbed by a scalar digest of
the previous iteration's FULL output (so XLA can neither hoist loop-constant
subgraphs nor DCE unused gradient branches), and the result is host-fetched.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root on sys.path (NOT via PYTHONPATH env — that propagates to the TPU
# plugin's subprocess and breaks axon registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20):
    out = fn(*args)  # compile + warmup
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def digest(tree) -> jax.Array:
    """Scalar that depends on every leaf (anti-hoist / anti-DCE carry)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(x).astype(jnp.float32) for x in leaves if hasattr(x, "dtype"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8192, 16384, 32768])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fused", default="true")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional dotted config overrides")
    args = ap.parse_args()

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models import TwoTowerCLIP
    from clip_dplm_tpu.ops.fused_infonce import fused_clip_loss
    from clip_dplm_tpu.ops import infonce
    from clip_dplm_tpu.train import create_train_state, make_train_step

    iters = args.iters
    for B in args.batches:
        cfg = apply_overrides(
            Config(),
            [
                "tower_a.input_dim=256", "tower_a.hidden_size=1024",
                "tower_a.num_hidden_layers=3",
                "tower_b.input_dim=1280", "tower_b.hidden_size=1024",
                "tower_b.num_hidden_layers=3",
                "projection.dim=512",
                f"train.batch_size={B}",
                "train.optim.total_steps=1000",
                f"contrastive.use_fused_kernel={args.fused}",
                "train.rng_impl=unsafe_rbg",
            ] + args.extra,
        )
        model = TwoTowerCLIP(cfg=cfg)
        rng = np.random.default_rng(0)
        batch = {
            "a": jnp.asarray(rng.normal(size=(B, 256)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(B, 1280)).astype(np.float32)),
        }
        state = create_train_state(model, cfg, batch)
        step = make_train_step(cfg)

        def scan_timed(body):
            @jax.jit
            def run(*a):
                c, _ = jax.lax.scan(
                    lambda c, _: (body(c, *a), ()), jnp.float32(0.0), None,
                    length=iters)
                return c
            return timed(run, iters=iters) if False else run

        # --- full train step (ground truth) ---
        @jax.jit
        def full_step(state, batch):
            def body(s, _):
                s, m = step(s, batch)
                return s, m["loss"]
            s, losses = jax.lax.scan(body, state, None, length=iters)
            return losses[-1]

        t_full = timed(full_step, state, batch, iters=iters)
        print("full:", round(t_full*1e3, 3), "ms", flush=True)

        def perturbed(c):
            return {"a": batch["a"] + 1e-9 * c, "b": batch["b"] + 1e-9 * c}

        # --- forward only, deterministic ---
        @jax.jit
        def fwd_det(params):
            def body(c, _):
                out = model.apply({"params": params}, perturbed(c),
                                  deterministic=True)
                return digest(out), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        t_fwd = timed(fwd_det, state.params, iters=iters)
        print("fwd_det:", round(t_fwd*1e3, 3), "ms", flush=True)

        # --- forward only, WITH dropout ---
        @jax.jit
        def fwd_drop(params, key):
            def body(c, _):
                out = model.apply(
                    {"params": params}, perturbed(c), deterministic=False,
                    rngs={"dropout": key},
                )
                return digest(out), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        key = jax.random.key(0, impl="unsafe_rbg")
        t_fwd_drop = timed(fwd_drop, state.params, key, iters=iters)
        print("fwd_drop:", round(t_fwd_drop*1e3, 3), "ms", flush=True)

        def loss_of(params, b, key):
            out = model.apply({"params": params}, b, deterministic=False,
                              rngs={"dropout": key})
            if cfg.contrastive.use_fused_kernel:
                l, _ = fused_clip_loss(out["emb_a"], out["emb_b"],
                                       out["logit_scale"], dot_dtype=jnp.bfloat16)
            else:
                l, _ = infonce.clip_loss(out["emb_a"], out["emb_b"],
                                         out["logit_scale"])
            return l

        # --- fwd + FULL param gradient (dropout on; all grads in carry) ---
        @jax.jit
        def fwd_bwd(params, key):
            def body(c, _):
                l, g = jax.value_and_grad(loss_of)(params, perturbed(c), key)
                return digest(g) + l, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        t_fwd_bwd = timed(fwd_bwd, state.params, key, iters=iters)
        print("fwd_bwd:", round(t_fwd_bwd*1e3, 3), "ms", flush=True)

        # --- loss only: fwd+FULL grad of the loss on fixed embeddings ---
        emb_a = jnp.asarray(rng.normal(size=(B, 512)).astype(np.float32))
        emb_b = jnp.asarray(rng.normal(size=(B, 512)).astype(np.float32))
        ls = jnp.float32(2.6592)

        def loss_fn(a, b, s):
            if cfg.contrastive.use_fused_kernel:
                l, _ = fused_clip_loss(a, b, s, dot_dtype=jnp.bfloat16)
            else:
                l, _ = infonce.clip_loss(a, b, s)
            return l

        @jax.jit
        def loss_grad():
            def body(c, _):
                a = emb_a + 1e-9 * c
                b = emb_b + 1e-9 * c
                l, g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(a, b, ls)
                return digest(g) + l, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        t_loss = timed(loss_grad, iters=iters)
        print("loss:", round(t_loss*1e3, 3), "ms", flush=True)

        # --- optimizer only (grads perturbed by carry; params in carry) ---
        grads0 = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 1e-3), state.params)

        @jax.jit
        def opt_only(state):
            def body(s, _):
                g = jax.tree_util.tree_map(
                    lambda x: x * (1.0 + 1e-9 * jnp.float32(s.step)), grads0)
                return s.apply_gradients(g), ()
            s, _ = jax.lax.scan(body, state, None, length=iters)
            return s.params["logit_scale"]

        t_opt = timed(opt_only, state, iters=iters)
        print("opt:", round(t_opt*1e3, 3), "ms", flush=True)

        out = {
            "full_ms": t_full * 1e3,
            "fwd_det_ms": t_fwd * 1e3,
            "fwd_dropout_ms": t_fwd_drop * 1e3,
            "fwd_bwd_ms": t_fwd_bwd * 1e3,
            "loss_fwd_bwd_ms": t_loss * 1e3,
            "opt_ms": t_opt * 1e3,
            "unaccounted_ms": (t_full - t_fwd_bwd - t_opt) * 1e3,
            "pairs_per_s": B / t_full,
        }
        print(B, json.dumps({k: round(v, 3) for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
