"""CLIP-guided DPLM generation at 650M scale on the real TPU — the full
north-star config-5 pipeline (BASELINE.json: "CLIP-guided DPLM
discrete-diffusion sampling with 650M-scale protein encoder and contrastive
score guidance") measured end to end.

Pipeline: the ESM-2-650M-geometry DPLM trunk (dplm.scan_layers — one
compiled block) runs best-of-K denoising chains; an ESM-8M CLIP protein
tower + projection scores every candidate against a conditioning embedding
and the per-slot argmax wins (models/dplm.py::clip_guided_sample).

Env: GUIDED_B (batch, default 8), GUIDED_K (candidates, 4), GUIDED_LEN
(126), GUIDED_STEPS (50), GUIDED_D/NL/NH (trunk geometry, 650M default).
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


def main():
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models.dplm import DPLM, clip_guided_sample
    from clip_dplm_tpu.models.esm import ESMTower, esm_config_from_name
    from clip_dplm_tpu.models.guided_generation import make_clip_scorer
    from clip_dplm_tpu.models.layers import OptimizedProjectionHead

    B = int(os.environ.get("GUIDED_B", 8))
    K = int(os.environ.get("GUIDED_K", 4))
    length = int(os.environ.get("GUIDED_LEN", 126))
    steps = int(os.environ.get("GUIDED_STEPS", 50))
    d = int(os.environ.get("GUIDED_D", 1280))
    nl = int(os.environ.get("GUIDED_NL", 33))
    nh = int(os.environ.get("GUIDED_NH", 20))

    cfg = apply_overrides(Config(), [
        f"dplm.d_model={d}", f"dplm.num_layers={nl}", f"dplm.num_heads={nh}",
        f"dplm.num_diffusion_steps={steps}", "dplm.scan_layers=true",
        f"dplm.num_candidates={K}",
        "projection.dim=128",
    ])
    model = DPLM(cfg=cfg.dplm)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8), jnp.int32))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    # scorer: ESM-8M tower + projection head (the protein side of
    # ESMProteinCLIP) — random weights; the probe measures THROUGHPUT of
    # the full guided pipeline, scorer quality is covered by
    # test_dplm::test_clip_guided_sample_picks_high_scores
    scfg = esm_config_from_name("esm2_t6_8M")
    tower = ESMTower(cfg=scfg)
    proj = OptimizedProjectionHead(cfg=cfg.projection)
    toks0 = jnp.zeros((2, 8), jnp.int32)
    tp = tower.init(jax.random.PRNGKey(1), toks0)["params"]
    emb0 = tower.apply({"params": tp}, toks0, pooling="mean_residues")
    pp = proj.init(jax.random.PRNGKey(2), emb0)["params"]

    def encode(tokens, mask):
        e = tower.apply({"params": tp}, tokens, mask,
                        pooling="mean_residues")
        return proj.apply({"params": pp}, e)

    cond = jax.random.normal(jax.random.PRNGKey(3), (cfg.projection.dim,))
    score_fn = make_clip_scorer(encode, cond)

    flatten = os.environ.get("GUIDED_FLATTEN", "1") == "1"
    # params/scorer weights as runtime args, NOT jit-closure constants —
    # closing over the 2.6GB 650M trunk bakes it into the lowered module
    # (minutes-slow lowering + constant upload through the tunnel)
    run = jax.jit(lambda k, p: clip_guided_sample(
        model, p, k, score_fn, B, length,
        num_candidates=K, num_steps=steps, flatten_chains=flatten))
    toks, scores = run(jax.random.PRNGKey(0), params)  # compile + warmup
    float(jnp.sum(scores))
    t0 = time.perf_counter()
    toks, scores = run(jax.random.PRNGKey(1), params)
    assert bool(jnp.all(toks[:, 0] == 0))
    s = float(jnp.mean(scores))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "clip_guided_dplm_650M",
        "flatten_chains": flatten,
        "trunk_params": n_params,
        "batch": B, "candidates": K, "length": length,
        "diffusion_steps": steps,
        "sec_per_batch": round(dt, 2),
        "guided_seqs_per_sec": round(B / dt, 3),
        "chain_seqs_per_sec": round(B * K / dt, 3),
        "mean_best_score": round(s, 4),
    }))


if __name__ == "__main__":
    main()
