"""DPLM discrete-diffusion protein sampling + CLIP-guided generation.

The sampler is one jitted lax.scan denoising chain (models/dplm.py);
guidance (models/guided_generation.py) scores candidate chains with a
protein encoder and returns the ones best aligned with a conditioning
embedding. Here the encoder is a random tiny ESM tower — with a trained
CLIP bundle the same call does real conditional design.

    python examples/03_dplm_generate.py --platform cpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, help="cpu | tpu (default: auto)")
    p.add_argument("--length", type=int, default=24)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import DPLMConfig
    from clip_dplm_tpu.data.protein import detokenize
    from clip_dplm_tpu.models.dplm import DPLM, sample
    from clip_dplm_tpu.models.guided_generation import (
        generate_proteins_for_condition,
    )

    cfg = DPLMConfig(d_model=64, num_layers=2, num_heads=4, max_len=64,
                     num_diffusion_steps=8)
    dplm = DPLM(cfg=cfg)
    key = jax.random.PRNGKey(0)
    L = args.length
    params = dplm.init(key, jnp.zeros((1, L + 2), jnp.int32),
                       jnp.ones((1, L + 2), bool))["params"]

    # Unconditional sampling: (B, L+2) token chains + per-residue logprobs.
    import numpy as np

    tokens, logprobs = sample(dplm, params, key, batch_size=4, length=L)
    for row in np.asarray(tokens):
        print("sampled:", detokenize(row))

    # CLIP-guided: embed every candidate chain, keep the best-aligned one.
    def encode_fn(tok, mask):
        # stand-in protein encoder: mean-pooled one-hot projection. A real
        # run passes the CLIP protein tower's apply here.
        onehot = jax.nn.one_hot(tok, cfg.vocab_size)
        pooled = (onehot * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)
        return pooled @ jax.random.normal(jax.random.PRNGKey(1),
                                          (cfg.vocab_size, 16))

    condition = jax.random.normal(jax.random.PRNGKey(2), (16,))
    best, scores = generate_proteins_for_condition(
        dplm, params, encode_fn, condition, key, length=L,
        num_candidates=4)
    print("guided best:", detokenize(np.asarray(best)[0]),
          "score:", float(np.asarray(scores).ravel()[0]))


if __name__ == "__main__":
    main()
