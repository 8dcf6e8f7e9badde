"""TPU-hardware evidence for north-star configs 3 and 4 (VERDICT r3 item 2).

Neither family had ever executed on the real chip before round 4:

  * tf_clip — the 3-way cell/perturbation/protein contrastive model
    (tf nb cell 41) at real scale (B>=4096) through the fused multiway
    loss: full train step vs deterministic forward decomposition.
  * triple_flow — (a) the CFM-flow TripleFlowModel train step on a real
    padded-graph batch from the host pipeline, and (b) the ICNN transport
    step: grad-of-grad under jit (the training gradient THROUGH the
    Brenier map T = grad Psi, triple_flow/2_icnn_core.py:181-211 /
    4_transport_maps.py semantics) at reference scale.

Honest-timing rules from CLAUDE.md: all iterations chained inside one jit
via lax.scan with the carry perturbing an input (hoisting trap), and a host
fetch as the only sync point (the axon tunnel's block_until_ready lies).

Writes evidence/tf_clip_probe_r4.json and evidence/triple_flow_probe_r4.json.
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

from bench import _enable_compile_cache  # repo-local persistent XLA cache

_enable_compile_cache()

EVIDENCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "evidence")


def timed(fn, *args, iters):
    """Compile + one throwaway chained run, then one timed chained run."""
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters, compile_s


def tf_clip_fixture(B: int, overrides=()):
    """Model + train state + a realistic padded batch at scale B (shared by
    the probe below and scripts/tpu_flagship_trace.py's tf_clip builder)."""
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models.tf_clip import TFContrastiveModel
    from clip_dplm_tpu.train import create_train_state

    cfg = apply_overrides(
        Config(),
        [
            "experiment=tf_clip",
            f"train.batch_size={B}",
            "train.optim.fused_update=true",
            "train.optim.total_steps=1000",
            "train.rng_impl=unsafe_rbg",
            "contrastive.use_fused_kernel=true",
        ] + list(overrides),
    )
    enc = cfg.encoders
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, enc.gene_dim + 1)).astype(np.float32)
    # kNN connectivity via the gram identity (the naive (B,B,G) broadcast
    # of the host fixture does not scale to B=4k)
    sq = (x * x).sum(-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    kth = np.partition(d2, 8, axis=1)[:, 8]
    conn = (d2 <= kth[:, None]).astype(np.float32)
    np.fill_diagonal(conn, 0.0)
    conn = np.maximum(conn, conn.T)
    batch = {
        "cell_state": jnp.asarray(x),
        "connectivity": jnp.asarray(conn),
        "gene_esm": jnp.asarray(rng.normal(
            size=(B, enc.n_perturb_genes, enc.esm_dim)).astype(np.float32)),
        "gene_values": jnp.asarray(
            rng.uniform(-1, 1, (B, enc.n_perturb_genes)).astype(np.float32)),
        "protein_emb": jnp.asarray(
            rng.normal(size=(B, enc.esm_dim)).astype(np.float32)),
    }
    model = TFContrastiveModel(cfg=cfg)
    state = create_train_state(model, cfg, batch)
    return cfg, model, state, batch


def probe_tf_clip() -> dict:
    from clip_dplm_tpu.train import make_train_step

    B = int(os.environ.get("PROBE_TF_B", 4096))
    iters = int(os.environ.get("PROBE_ITERS", 10))
    overrides = [o for o in os.environ.get("BENCH_OVERRIDES", "").split(",")
                 if o]
    cfg, model, state, batch = tf_clip_fixture(B, overrides)
    step = make_train_step(cfg)

    @jax.jit
    def full(state, batch):
        def body(s, _):
            s, m = step(s, batch)
            return s, m["loss"]
        _, losses = jax.lax.scan(body, state, None, length=iters)
        return losses[-1]

    step_s, compile_s = timed(full, state, batch, iters=iters)

    def perturbed(b, c):
        return {**b, "cell_state": b["cell_state"] + 1e-9 * c}

    # FULL deterministic forward incl. the multiway loss — consuming the
    # loss keeps every tower alive. (The r4 probe summed only cell_embed,
    # which let XLA DCE the pert/protein towers AND the loss: the quoted
    # fwd 5.4 ms was the CELL TOWER alone, and "bwd+opt = 12x fwd" was a
    # probe artifact, not a backward pathology. VERDICT r4 weak #1 /
    # item 1 — the r5 probe decomposes honestly.)
    @jax.jit
    def fwd_det(params, b):
        def body(c, _):
            out = model.apply({"params": params}, perturbed(b, c),
                              deterministic=True)
            embs = {"cell": out["cell_embed"], "pert": out["pert_embed"],
                    "protein": out["protein_embed"]}
            from clip_dplm_tpu.ops.fused_infonce import (
                fused_multiway_clip_loss,
            )
            loss, _ = fused_multiway_clip_loss(
                embs, out["logit_scale"],
                max_scale=cfg.contrastive.logit_scale_max,
                dot_dtype=jnp.bfloat16)
            return loss.astype(jnp.float32) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    fwd_s, fwd_compile_s = timed(fwd_det, state.params, batch, iters=iters)
    return {
        "config": "tf_clip 3-way (tf nb cell 41), fused multiway loss",
        "overrides": overrides,
        "short_attn_min_seq": os.environ.get(
            "CLIP_DPLM_SHORT_ATTN_MIN_SEQ", "default"),
        "batch_size": B,
        "iters_chained": iters,
        "compile_s": round(compile_s, 1),
        "train_step_ms": round(step_s * 1e3, 2),
        "fwd_loss_det_ms": round(fwd_s * 1e3, 2),
        "bwd_plus_opt_ms": round((step_s - fwd_s) * 1e3, 2),
        "cells_per_s": round(B / step_s),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def probe_triple_flow() -> dict:
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.train import create_train_state, make_train_step

    B = int(os.environ.get("PROBE_FLOW_B", 256))
    iters = int(os.environ.get("PROBE_ITERS", 10))
    cfg = apply_overrides(
        Config(),
        [
            "experiment=triple_flow",
            f"train.batch_size={B}",
            "train.optim.total_steps=1000",
            "train.rng_impl=unsafe_rbg",
            # exact_ot pairs minibatches through a host pure_callback
            # (scipy Hungarian) which the axon TUNNEL cannot transport
            # (UNIMPLEMENTED: host send/recv); on a real TPU VM the callback
            # is local and works. The on-device log-domain Sinkhorn pairing
            # (flow_type=sb) is the TPU-native path — probe that.
            "flow.flow_type=sb",
        ],
    )
    train_fn, _ = build_data(cfg)
    batch = jax.tree_util.tree_map(
        jnp.asarray, next(iter(train_fn(0))))
    model = build_model(cfg)
    state = create_train_state(model, cfg, batch)
    step = make_train_step(cfg)

    @jax.jit
    def full(state, batch):
        def body(s, _):
            s, m = step(s, batch)
            return s, m["loss"]
        _, losses = jax.lax.scan(body, state, None, length=iters)
        return losses[-1]

    step_s, compile_s = timed(full, state, batch, iters=iters)
    return {
        "config": "triple_flow CFM (tong encoders + OT flows), real padded "
                  "graph batch from the host pipeline",
        "ot_pairing": "sb (on-device log-domain Sinkhorn); exact_ot's "
                      "Hungarian pure_callback is unsupported by the axon "
                      "TUNNEL only (works on a real TPU VM host)",
        "batch_cells": B,
        "iters_chained": iters,
        "compile_s": round(compile_s, 1),
        "train_step_ms": round(step_s * 1e3, 2),
        "platform": jax.devices()[0].platform,
    }


def probe_icnn() -> dict:
    """Grad-of-grad on the real chip: train TripleTransportMaps, whose loss
    contains T = grad(Psi) (triple_flow/2_icnn_core.py:181-211), so the
    training step differentiates THROUGH jax.grad — the second-order path
    that had never executed on TPU hardware."""
    import optax

    from clip_dplm_tpu.config import ICNNConfig
    from clip_dplm_tpu.models.icnn import (
        TripleTransportMaps, total_transport_loss,
    )

    B = int(os.environ.get("PROBE_ICNN_B", 1024))
    D = int(os.environ.get("PROBE_ICNN_D", 512))
    iters = int(os.environ.get("PROBE_ITERS", 10))
    cfg = ICNNConfig(input_dim=D)
    model = TripleTransportMaps(
        cfg=cfg, cell_dim=D, pert_dim=D, protein_dim=D)
    rng = np.random.default_rng(1)
    cell = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    pert = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    prot = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), cell, pert, prot, train=True)["params"]
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = tx.init(params)

    def loss_fn(params, cell, pert, prot):
        out = model.apply({"params": params}, cell, pert, prot, train=True)
        loss, _ = total_transport_loss(out, cfg.consistency_weight)
        return loss

    @jax.jit
    def full(params, opt_state, cell):
        def body(carry, _):
            params, opt_state, c = carry
            # chain the carry through an input (hoisting trap, CLAUDE.md)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, cell + 1e-9 * c, pert, prot)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, loss * 1e-9), loss
        (_, _, _), losses = jax.lax.scan(
            body, (params, opt_state, jnp.float32(0.0)), None, length=iters)
        return losses[-1]

    step_s, compile_s = timed(full, params, opt_state, cell, iters=iters)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return {
        "config": "ICNN TripleTransportMaps train step: grad THROUGH "
                  "T=grad(Psi) (second-order autodiff under jit)",
        "batch_size": B,
        "dim": D,
        "n_params": int(n_params),
        "iters_chained": iters,
        "compile_s": round(compile_s, 1),
        "train_step_ms": round(step_s * 1e3, 2),
        "remat": "not needed at this scale (fits without jax.checkpoint)",
        "platform": jax.devices()[0].platform,
    }


def main():
    which = os.environ.get("PROBE_WHICH", "tf_clip,triple_flow")
    results = {}
    if "tf_clip" in which:
        print("probing tf_clip ...", flush=True)
        results["tf_clip"] = probe_tf_clip()
        print(json.dumps(results["tf_clip"]), flush=True)
        with open(os.path.join(EVIDENCE, "tf_clip_probe_r5.json"), "w") as f:
            json.dump(results["tf_clip"], f, indent=1)
    if "triple_flow" in which:
        print("probing triple_flow CFM ...", flush=True)
        flow = probe_triple_flow()
        print(json.dumps(flow), flush=True)
        print("probing ICNN transport (grad-of-grad) ...", flush=True)
        icnn = probe_icnn()
        print(json.dumps(icnn), flush=True)
        results["triple_flow"] = {"cfm": flow, "icnn_transport": icnn}
        with open(os.path.join(EVIDENCE, "triple_flow_probe_r4.json"),
                  "w") as f:
            json.dump(results["triple_flow"], f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
