"""Analysis CLI — `python -m clip_dplm_tpu.experiments.analyze`.

Capability match for run1/full.py's comprehensive-analysis entry points
(detailed_evaluation :316-330, run_exhaustive_experiments :340-356,
run_comprehensive_experiments :462-484): from a checkpoint, produce the full
analysis report — retrieval, class confusion + per-pair rates, embedding
collapse, embedding distributions (PCA spectrum), failure cases, marker-space
correlation — as JSON + figures.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None)
    parser.add_argument("--override", "-o", action="append", default=[])
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", default=None, help="JSON report path")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import load_config
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.train import create_train_state
    from clip_dplm_tpu.train.analysis import (
        analyze_cell_type_confusion,
        analyze_embedding_collapse,
        analyze_embedding_distributions,
        analyze_failure_cases,
        compute_confusion_matrix,
        marker_space_analysis,
    )
    from clip_dplm_tpu.train.checkpoint import CheckpointManager
    from clip_dplm_tpu.train.metrics import retrieval_metrics
    from clip_dplm_tpu.utils.visualization import Visualizer

    cfg = load_config(args.config, args.override)
    model = build_model(cfg)
    _, val_batches = build_data(cfg)
    example = next(iter(val_batches()))
    state = create_train_state(model, cfg, example)
    state = CheckpointManager(args.checkpoint).restore(state)

    all_a, all_b, all_raw_a, all_labels = [], [], [], []
    for batch in val_batches():
        out = model.apply({"params": state.params}, batch, deterministic=True)
        all_a.append(np.asarray(out["emb_a"], np.float32))
        all_b.append(np.asarray(out["emb_b"], np.float32))
        if "a" in batch:
            all_raw_a.append(np.asarray(batch["a"], np.float32))
    emb_a = np.concatenate(all_a)
    emb_b = np.concatenate(all_b)

    report: dict = {
        "retrieval": {
            k: float(v)
            for k, v in retrieval_metrics(emb_a, emb_b).items()
        },
    }
    # hard-negative cache stats when the checkpoint carries a filled cache
    # (proposal.MD:21-23 hit-rate analysis; the ring buffer rides TrainState)
    cache_len = int(np.asarray(state.cache_len))
    if cfg.contrastive.use_cache and cache_len > 0:
        from clip_dplm_tpu.train.analysis import hard_negative_cache_stats

        report["cache_stats"] = hard_negative_cache_stats(
            emb_a, emb_b, np.asarray(state.cache, np.float32), cache_len)
    report |= {
        "distributions": analyze_embedding_distributions(
            {"tower_a": emb_a, "tower_b": emb_b}
        ),
        "failure_cases": analyze_failure_cases(emb_a, emb_b, top_k=10),
    }
    if all_raw_a:
        raw_a = np.concatenate(all_raw_a)
        report["marker_space"] = marker_space_analysis(raw_a, emb_a)
        # pseudo-labels from marker-space clustering for confusion/collapse
        from sklearn.cluster import KMeans

        k = min(8, max(2, raw_a.shape[0] // 32))
        labels = KMeans(n_clusters=k, n_init=4, random_state=0).fit_predict(raw_a)
        cm = compute_confusion_matrix(emb_a, emb_b, labels, k)
        report["class_confusion"] = {
            "matrix": cm.tolist(),
            "worst_pairs": analyze_cell_type_confusion(cm)[:10],
        }
        report["embedding_collapse"] = analyze_embedding_collapse(
            {"tower_a": emb_a, "tower_b": emb_b}, labels
        )

    out_path = args.out or os.path.join(cfg.logging.log_dir, "analysis.json")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, default=float)

    viz = Visualizer(os.path.join(cfg.logging.log_dir, "figures"))
    viz.plot_embeddings({"tower_a": emb_a, "tower_b": emb_b}, name="analysis_embeddings")

    print(json.dumps({
        "R@1": report["retrieval"]["R@1"],
        "effective_rank_a": report["distributions"]["tower_a"]["effective_rank"],
        "n_failure_cases": len(report["failure_cases"]),
        "report": out_path,
    }))
    return report


if __name__ == "__main__":
    main()
