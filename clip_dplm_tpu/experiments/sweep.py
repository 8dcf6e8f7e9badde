"""Sweep CLI — `python -m clip_dplm_tpu.experiments.sweep`.

Capability match for run1/full.py run_all_experiments (:188-214) and
HybridCLIPConfig.create_experiment_config (:195-218): run the named sweep
grid (embedding_sweep / architecture_search / training_sweep /
temperature_sweep), one short training per variant, report a CSV grid of
best-val metrics.
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
    parser.add_argument("--sweep", required=True,
                        choices=["embedding_sweep", "architecture_search",
                                 "training_sweep", "temperature_sweep"])
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import create_experiment_configs, load_config
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.train import Trainer, create_train_state

    base = load_config(args.config, args.override)
    results = {}
    for name, cfg in create_experiment_configs(base, args.sweep):
        model = build_model(cfg)
        train_batches, val_batches = build_data(cfg)
        example = next(iter(train_batches()))
        state = create_train_state(model, cfg, example)
        trainer = Trainer(cfg, state)
        history = trainer.train(
            lambda: train_batches(seed=0), val_batches, num_epochs=args.epochs
        )
        best_val = min(history["val_loss"]) if history["val_loss"] else float("nan")
        results[name] = {
            "best_val_loss": best_val,
            "final_train_loss": history["train_loss"][-1],
        }
        print(f"{name}: best_val_loss={best_val:.4f}")

    out_path = os.path.join(base.logging.log_dir, f"sweep_{args.sweep}.csv")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["variant", "best_val_loss", "final_train_loss"])
        for name, r in results.items():
            w.writerow([name, r["best_val_loss"], r["final_train_loss"]])
    return results


if __name__ == "__main__":
    main()
