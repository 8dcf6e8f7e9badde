"""Batch embedding CLI — `python -m clip_dplm_tpu.experiments.embed`.

The serving-path workflow of the reference's embedding pipelines
(tf nb cell 21, old/encoders.py, triple_flow/3_esm_integration.py): protein
sequences in (FASTA or one-per-line text) -> pooled embeddings out (.npz),
using the native C++ tokenizer when available and a fixed padded length so
XLA compiles one program for the whole stream.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List, Tuple

import jax
import numpy as np


def read_sequences(path: str) -> Tuple[List[str], List[str]]:
    """FASTA or plain one-sequence-per-line. Returns (names, sequences)."""
    names, seqs = [], []
    with open(path) as f:
        current_name, current = None, []
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if current_name is not None:
                    names.append(current_name)
                    seqs.append("".join(current))
                current_name, current = line[1:].split()[0], []
            elif current_name is not None:
                current.append(line)
            else:  # plain text mode
                names.append(f"seq{len(names)}")
                seqs.append(line)
        if current_name is not None:
            names.append(current_name)
            seqs.append("".join(current))
    return names, seqs


def main(argv=None) -> Dict[str, np.ndarray]:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="FASTA or text file")
    parser.add_argument("--output", required=True, help=".npz output")
    parser.add_argument("--bundle", default=None,
                        help="pretrained bundle dir (utils/pretrained); "
                             "default: a fresh ESM tower from --esm")
    parser.add_argument("--esm", default="esm2_t6_8M",
                        help="ESM family name when no bundle is given")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--max-len", type=int, default=1024)
    parser.add_argument("--pooling", default="mean_residues",
                        choices=["mean_residues", "cls"])
    parser.add_argument("--pipeline-stages", type=int, default=0,
                        help="pipeline the ESM trunk over this many devices "
                             "(GPipe; for the 3B/15B presets that do not fit "
                             "one chip). 0 = single-device forward.")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from clip_dplm_tpu.models.esm import ESMTower, esm_config_from_name
    from clip_dplm_tpu.native import tokenize_batch_native

    names, seqs = read_sequences(args.input)
    if not seqs:
        raise SystemExit(f"no sequences found in {args.input}")

    if args.bundle:
        from clip_dplm_tpu.utils.pretrained import load_pretrained

        cfg, model, params = load_pretrained(args.bundle)
        tower = ESMTower(cfg=cfg.esm, dtype=jnp.bfloat16)
        variables = {"params": params["esm_tower"]} if "esm_tower" in params \
            else {"params": params}
    else:
        esm_cfg = esm_config_from_name(args.esm, max_len=args.max_len)
        tower = ESMTower(cfg=esm_cfg, dtype=jnp.bfloat16)
        toks0, mask0 = tokenize_batch_native(seqs[:1], max_len=8)
        variables = tower.init(
            jax.random.PRNGKey(0), jnp.asarray(toks0), jnp.asarray(mask0)
        )
        print("WARNING: no --bundle given; embedding with RANDOM weights "
              "(convert a checkpoint with models.esm.convert_esm_torch_params)")

    # fixed padded length -> one compiled program
    S = args.max_len
    if args.pipeline_stages > 1:
        from jax.sharding import Mesh

        from clip_dplm_tpu.models.esm import PipelinedESMTower

        devs = jax.devices()
        if len(devs) < args.pipeline_stages:
            raise SystemExit(
                f"--pipeline-stages {args.pipeline_stages} needs that many "
                f"devices; found {len(devs)}")
        if args.batch_size % args.pipeline_stages:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by "
                f"--pipeline-stages {args.pipeline_stages} (microbatching)")
        mesh = Mesh(np.asarray(devs[: args.pipeline_stages]), ("pipe",))
        ptower = PipelinedESMTower(
            tower.cfg, mesh=mesh, pipe_axis="pipe", dtype=jnp.bfloat16)
        embed = lambda t, m: ptower.apply(variables, t, m,
                                          pooling=args.pooling)
    else:
        embed = jax.jit(
            lambda t, m: tower.apply(variables, t, m, pooling=args.pooling)
        )
    out_chunks = []
    t0 = time.time()
    B = args.batch_size
    for start in range(0, len(seqs), B):
        chunk = seqs[start : start + B]
        pad = B - len(chunk)
        toks, mask = tokenize_batch_native(chunk + ["L"] * pad, max_len=S)
        if toks.shape[1] < S:
            toks = np.pad(toks, ((0, 0), (0, S - toks.shape[1])),
                          constant_values=1)
            mask = np.pad(mask, ((0, 0), (0, S - mask.shape[1])))
        emb = np.asarray(embed(jnp.asarray(toks), jnp.asarray(mask)),
                         np.float32)
        out_chunks.append(emb[: len(chunk)])
    embeddings = np.concatenate(out_chunks)
    elapsed = time.time() - t0

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    np.savez_compressed(args.output, names=np.asarray(names),
                        embeddings=embeddings)
    print(f"embedded {len(seqs)} sequences -> {args.output} "
          f"({embeddings.shape[1]}-d, {len(seqs)/max(elapsed,1e-9):.1f} seq/s)")
    return {"names": np.asarray(names), "embeddings": embeddings}


if __name__ == "__main__":
    main()
