"""Evaluation CLI — `python -m clip_dplm_tpu.experiments.evaluate`.

Capability match for tong/experiments/evaluate.py:9-80: load a checkpoint,
run the eval set through the model, compute retrieval + biological metrics
(mean/std across batches), write CSVs, optionally dump embeddings.
"""

from __future__ import annotations

import argparse
import csv
import os

import jax
import numpy as np


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None)
    parser.add_argument("--override", "-o", action="append", default=[])
    parser.add_argument("--checkpoint", required=True, help="checkpoint dir")
    parser.add_argument("--output", default=None, help="metrics CSV path")
    parser.add_argument("--save-embeddings", default=None,
                        help=".npz path for eval embeddings")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import load_config
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.train import create_train_state
    from clip_dplm_tpu.train.checkpoint import CheckpointManager
    from clip_dplm_tpu.train.metrics import BiologicalMetrics, retrieval_metrics

    cfg = load_config(args.config, args.override)
    model = build_model(cfg)
    _, val_batches = build_data(cfg)
    example = next(iter(val_batches()))
    state = create_train_state(model, cfg, example)
    state = CheckpointManager(args.checkpoint).restore(state)

    all_a, all_b = [], []
    per_batch = []
    for batch in val_batches():
        out = model.apply({"params": state.params}, batch, deterministic=True)
        a = np.asarray(out["emb_a"], np.float32)
        b = np.asarray(out["emb_b"], np.float32)
        all_a.append(a)
        all_b.append(b)
        per_batch.append({
            k: float(v)
            for k, v in retrieval_metrics(out["emb_a"], out["emb_b"]).items()
        })
    emb_a = np.concatenate(all_a)
    emb_b = np.concatenate(all_b)

    keys = sorted(per_batch[0])
    summary = {}
    for k in keys:
        vals = [m[k] for m in per_batch]
        summary[f"{k}_mean"] = float(np.mean(vals))
        summary[f"{k}_std"] = float(np.std(vals))
    full = BiologicalMetrics().compute_all_metrics(emb_a, emb_b)
    summary.update({f"full_{k}": v for k, v in full.items()})

    out_path = args.output or os.path.join(cfg.logging.log_dir, "eval_metrics.csv")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric", "value"])
        for k, v in sorted(summary.items()):
            w.writerow([k, v])
    if args.save_embeddings:
        np.savez(args.save_embeddings, emb_a=emb_a, emb_b=emb_b)
    print({k: round(v, 4) for k, v in summary.items() if k.startswith("full_R@")})
    return summary


if __name__ == "__main__":
    main()
