"""Protein generation CLI — `python -m clip_dplm_tpu.experiments.generate`.

The DPLM serving path (BASELINE.json config 5): sample proteins from a
(trained) discrete-diffusion LM, optionally CLIP-guided toward a conditioning
embedding (best-of-K reranking against a protein tower), write FASTA.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", required=True, help="FASTA output path")
    parser.add_argument("--length", type=int, default=100)
    parser.add_argument("--num", type=int, default=4, help="sequences to generate")
    parser.add_argument("--steps", type=int, default=None, help="denoising steps")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--dplm-bundle", default=None,
                        help="pretrained DPLM bundle (utils/pretrained)")
    parser.add_argument("--esm-init", default=None,
                        help="warm-start trunk from a converted ESM bundle")
    parser.add_argument("--condition", default=None,
                        help=".npz with `embedding` to CLIP-guide toward "
                             "(uses --scorer-bundle's protein tower)")
    parser.add_argument("--scorer-bundle", default=None,
                        help="pretrained bundle providing the protein scorer")
    parser.add_argument("--candidates", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from clip_dplm_tpu.config import Config
    from clip_dplm_tpu.data import protein
    from clip_dplm_tpu.models.dplm import DPLM, init_dplm_from_esm, sample

    cfg = Config()
    if args.dplm_bundle:
        from clip_dplm_tpu.utils.pretrained import load_pretrained

        bcfg, _, params = load_pretrained(args.dplm_bundle)
        dplm = DPLM(cfg=bcfg.dplm, dtype=jnp.bfloat16)
    else:
        dplm = DPLM(cfg=cfg.dplm, dtype=jnp.bfloat16)
        toks = jnp.full((1, 8), 32, jnp.int32)
        params = dplm.init(jax.random.PRNGKey(args.seed), toks)["params"]
        print("WARNING: no --dplm-bundle; sampling from RANDOM weights")
        if args.esm_init:
            from clip_dplm_tpu.utils.pretrained import load_pretrained

            _, _, esm_params = load_pretrained(args.esm_init)
            params = init_dplm_from_esm(esm_params, params)
            print(f"warm-started trunk from {args.esm_init}")

    key = jax.random.PRNGKey(args.seed)
    if bool(args.condition) != bool(args.scorer_bundle):
        import warnings

        warnings.warn(
            "--condition and --scorer-bundle must be given together; "
            "falling back to UNGUIDED sampling", stacklevel=1)
    if args.condition and args.scorer_bundle:
        from clip_dplm_tpu.models.esm import ESMTower
        from clip_dplm_tpu.models.guided_generation import (
            generate_proteins_for_condition,
        )
        from clip_dplm_tpu.utils.pretrained import load_pretrained

        scfg, _, sparams = load_pretrained(args.scorer_bundle)
        tower = ESMTower(cfg=scfg.esm, dtype=jnp.bfloat16)
        tower_params = sparams.get("esm_tower", sparams)
        encode = lambda t, m: tower.apply(
            {"params": tower_params}, t, m, pooling="mean_residues"
        )
        condition = jnp.asarray(np.load(args.condition)["embedding"])
        tokens, scores = generate_proteins_for_condition(
            dplm, params, encode, condition, key,
            length=args.length, batch_size=args.num,
            num_candidates=args.candidates, num_steps=args.steps,
            temperature=args.temperature,
        )
        scores = np.asarray(scores)
    else:
        tokens, conf = sample(
            dplm, params, key, args.num, args.length,
            num_steps=args.steps, temperature=args.temperature,
        )
        scores = np.asarray(
            jnp.where(jnp.isfinite(conf), conf, 0.0).sum(-1)
        )

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        for i, row in enumerate(np.asarray(tokens)):
            seq = "".join(protein.ESM_VOCAB[t] for t in row[1:-1])
            f.write(f">generated_{i} score={scores[i]:.4f}\n{seq}\n")
    print(f"wrote {args.num} sequences of length {args.length} -> {args.output}")
    return args.output


if __name__ == "__main__":
    main()
