"""ESM-2 tower: HF weight conversion, bundle round-trip, and serving
embeddings through the micro-batched EmbedService.

This example uses a tiny randomly-initialized tower so it runs anywhere.
With network access, `scripts/fetch_and_verify_pretrained.py` downloads the
published facebook/esm2 checkpoints, runs `convert_esm_torch_params`
(models/esm.py) through its HF parity gates, and writes a real bundle —
this exact code then serves real ESM-2 embeddings.

    python examples/05_convert_esm.py --platform cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, help="cpu | tpu (default: auto)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import Config, ESMConfig, apply_overrides
    from clip_dplm_tpu.data import protein
    from clip_dplm_tpu.models.esm import ESMTower
    from clip_dplm_tpu.serving import EmbedService
    from clip_dplm_tpu.utils.pretrained import load_pretrained, save_pretrained

    esm_cfg = ESMConfig(d_model=32, num_layers=2, num_heads=2, max_len=64)
    tower = ESMTower(cfg=esm_cfg, dtype=jnp.float32)
    toks = jnp.zeros((1, 8), jnp.int32)
    variables = tower.init(jax.random.PRNGKey(0), toks, jnp.ones((1, 8), bool))

    # Tokenize (ESM alphabet: [cls] residues [eos], pad + mask) and embed.
    toks, mask = protein.tokenize_batch(["MKTAYIAKQR", "GVSERTIDPK"])
    emb = tower.apply(variables, jnp.asarray(toks), jnp.asarray(mask),
                      pooling="mean_residues")
    print("direct embeddings:", emb.shape)

    with tempfile.TemporaryDirectory() as d:
        # Bundle round-trip: config + params in one directory. Real
        # checkpoints from the HF converters save/load the same way.
        import dataclasses

        cfg = dataclasses.replace(
            apply_overrides(Config(), ["experiment=esm_clip"]), esm=esm_cfg)
        save_pretrained(d, cfg, variables["params"])
        cfg2, _, params2 = load_pretrained(d)
        flat1 = jax.tree_util.tree_leaves(variables["params"])
        flat2 = jax.tree_util.tree_leaves(params2)
        assert all(np.allclose(a, b) for a, b in zip(flat1, flat2))
        print("bundle round-trip ok:", cfg2.esm.d_model, "dim,",
              cfg2.esm.num_layers, "layers")

    # Micro-batched serving: mixed lengths, bucketed to pre-compiled
    # shapes, results identical to solo forwards.
    svc = EmbedService(tower, variables, max_len=64, max_batch=4,
                       buckets=[16, 32, 64])
    try:
        got = svc.embed(["MKTAYIAKQR", "LA", "GVSERTIDPKQNFYMHWC"], timeout=60)
        print("served embeddings:", got.shape,
              "| stats:", svc.batcher.stats())
    finally:
        svc.close()


if __name__ == "__main__":
    main()
