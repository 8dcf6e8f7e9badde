"""Visualization CLI — `python -m clip_dplm_tpu.experiments.visualize`.

Capability match for tong/experiments/visualize.py:10-60: load a checkpoint,
produce embedding t-SNE panels, similarity heatmap, and training-curve
figures into an output directory.
"""

from __future__ import annotations

import argparse
import csv
import os

import jax
import numpy as np


def main(argv=None) -> list:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None)
    parser.add_argument("--override", "-o", action="append", default=[])
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import load_config
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.ops.infonce import l2_normalize
    from clip_dplm_tpu.train import create_train_state
    from clip_dplm_tpu.train.checkpoint import CheckpointManager
    from clip_dplm_tpu.utils.visualization import Visualizer

    cfg = load_config(args.config, args.override)
    out_dir = args.out_dir or os.path.join(cfg.logging.log_dir, "figures")
    viz = Visualizer(out_dir)
    model = build_model(cfg)
    _, val_batches = build_data(cfg)
    example = next(iter(val_batches()))
    state = create_train_state(model, cfg, example)
    state = CheckpointManager(args.checkpoint).restore(state)

    out = model.apply({"params": state.params}, example, deterministic=True)
    emb_a = np.asarray(out["emb_a"], np.float32)
    emb_b = np.asarray(out["emb_b"], np.float32)
    figures = [
        viz.plot_embeddings({"tower_a": emb_a, "tower_b": emb_b}),
        viz.plot_similarity_matrix(
            np.asarray(
                l2_normalize(out["emb_a"]) @ l2_normalize(out["emb_b"]).T
            )
        ),
    ]
    metrics_csv = os.path.join(cfg.logging.log_dir, "metrics.csv")
    if os.path.exists(metrics_csv):
        with open(metrics_csv) as f:
            rows = list(csv.DictReader(f))
        if rows:
            history = {
                k: [float(r[k]) for r in rows if r.get(k)]
                for k in rows[0]
                if k not in ("step", "time")
            }
            figures.append(viz.plot_training_progress(history))
    print("\n".join(figures))
    return figures


if __name__ == "__main__":
    main()
