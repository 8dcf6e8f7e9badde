"""Sweep CLI — `python -m clip_dplm_tpu.experiments.sweep`.

Capability match for run1/full.py run_all_experiments (:188-214) and
HybridCLIPConfig.create_experiment_config (:195-218): run the named sweep
grid (embedding_sweep / architecture_search / training_sweep /
temperature_sweep), one short training per variant, report a CSV grid of
best-val metrics.

`--parallel` spreads the variants across the devices of the local mesh:
each variant trains on its own chip (round-robin placement via
jax.default_device, one driver thread per device), so an 8-chip host runs
an 8-variant grid in roughly the wall time of one variant. The reference
runs its grids strictly serially on one GPU (run1/full.py:188-214).
"""

from __future__ import annotations

import argparse
import csv
import os

import jax
import numpy as np


def _train_variant(name, cfg, epochs, device=None):
    """Train one sweep variant (optionally pinned to `device`) and return its
    summary row. Self-contained so driver threads stay independent."""
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.train import Trainer, create_train_state

    import contextlib

    ctx = jax.default_device(device) if device is not None else contextlib.nullcontext()
    with ctx:
        model = build_model(cfg)
        train_batches, val_batches = build_data(cfg)
        example = next(iter(train_batches()))
        state = create_train_state(model, cfg, example)
        trainer = Trainer(cfg, state)
        history = trainer.train(
            lambda: train_batches(seed=0), val_batches, num_epochs=epochs
        )
    best_val = min(history["val_loss"]) if history["val_loss"] else float("nan")
    row = {
        "best_val_loss": best_val,
        "final_train_loss": history["train_loss"][-1],
    }
    print(f"{name}: best_val_loss={best_val:.4f}", flush=True)
    return name, row


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None)
    parser.add_argument("--override", "-o", action="append", default=[])
    parser.add_argument("--sweep", required=True,
                        choices=["embedding_sweep", "architecture_search",
                                 "training_sweep", "temperature_sweep"])
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--parallel", action="store_true",
                        help="train one variant per local device concurrently")
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import create_experiment_configs, load_config

    base = load_config(args.config, args.override)
    variants = list(create_experiment_configs(base, args.sweep))

    devices = jax.devices()
    results = {}
    if args.parallel and len(devices) > 1:
        # one driver thread per device; JAX dispatch is async, so each
        # device's queue stays full while the others train their variants
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(devices)) as pool:
            futures = [
                pool.submit(_train_variant, name, cfg, args.epochs,
                            devices[i % len(devices)])
                for i, (name, cfg) in enumerate(variants)
            ]
            for fut in futures:
                name, row = fut.result()
                results[name] = row
    else:
        for name, cfg in variants:
            name, row = _train_variant(name, cfg, args.epochs)
            results[name] = row

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
