"""Training CLI — `python -m clip_dplm_tpu.experiments.train`.

Capability match for tong/experiments/train.py:10-59 + run1/full.py main():
YAML config -> mesh -> data -> model -> Trainer -> checkpoints, with dotted
`--override a.b=c` flags replacing the reference's argparse/env sprawl, and
the NCCL init replaced by the jax mesh (created automatically over all
visible devices).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument(
        "--override", "-o", action="append", default=[],
        help="dotted config override, e.g. -o train.batch_size=64",
    )
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in the dir")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--platform", default=None,
                        help="force jax platform (cpu for local runs)")
    parser.add_argument(
        "--save-adapters", default=None, metavar="PATH",
        help="after training, save only the LoRA adapter leaves to an .npz "
             "(models/lora.py; requires esm.lora_rank/dplm.lora_rank > 0)")
    args = parser.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import load_config, save_config
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.parallel import create_mesh
    from clip_dplm_tpu.train import Trainer, create_train_state
    from clip_dplm_tpu.utils.logging import MetricLogger

    cfg = load_config(args.config, args.override)
    log = MetricLogger(cfg.logging.log_dir, use_wandb=cfg.logging.use_wandb)
    os.makedirs(cfg.logging.log_dir, exist_ok=True)
    save_config(cfg, os.path.join(cfg.logging.log_dir, "config.yaml"))

    ctx = create_mesh(model_parallel=cfg.mesh.model_parallel)
    log.logger.info(
        "experiment=%s devices=%s mesh=%s", cfg.experiment, jax.devices(),
        dict(ctx.mesh.shape),
    )

    model = build_model(cfg)
    train_batches, val_batches = build_data(cfg)
    example = next(iter(train_batches()))
    state = create_train_state(model, cfg, example)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    log.logger.info("parameters: %s", f"{n_params:,}")

    ckpt_dir = args.checkpoint_dir or os.path.join(cfg.logging.log_dir, "ckpt")
    if args.resume:
        from clip_dplm_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir, keep=cfg.train.keep_checkpoints)
        step = mgr.latest_step()
        if step is not None:
            state = mgr.restore(state, step)
            log.logger.info("resumed from step %d in %s", step, ckpt_dir)
        else:
            log.logger.info("no checkpoint to resume in %s; training fresh", ckpt_dir)
    trainer = Trainer(
        cfg, state, ctx=ctx, checkpoint_dir=ckpt_dir,
        log_fn=lambda epoch, m: log.log(epoch, m),
    )
    history = trainer.train(
        lambda: train_batches(seed=np.random.randint(1 << 31)),
        val_batches,
        num_epochs=args.epochs,
    )
    log.logger.info(
        "done: final train_loss=%.4f val_loss=%.4f",
        history["train_loss"][-1],
        history["val_loss"][-1] if history["val_loss"] else float("nan"),
    )
    if args.save_adapters:
        from clip_dplm_tpu.models.lora import save_adapters_npz

        n = save_adapters_npz(args.save_adapters, trainer.state.params)
        log.logger.info("saved %d adapter leaves to %s", n,
                        args.save_adapters)
    log.close()
    return history


if __name__ == "__main__":
    main()
