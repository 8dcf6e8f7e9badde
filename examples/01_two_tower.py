"""Train the two-tower CLIP on synthetic data, evaluate retrieval, and
round-trip a checkpoint.

This is the reference's v0 model class (old/clip.py) at a tiny geometry:
MLP towers over precomputed embeddings, learned-temperature InfoNCE.

    python examples/01_two_tower.py --platform cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

# run from a source checkout without `pip install -e .`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, help="cpu | tpu (default: auto)")
    p.add_argument("--epochs", type=int, default=2)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.train import Trainer, create_train_state
    from clip_dplm_tpu.train.checkpoint import CheckpointManager
    from clip_dplm_tpu.train.metrics import retrieval_metrics

    cfg = apply_overrides(Config(), [
        "experiment=two_tower",
        "tower_a.hidden_size=64", "tower_b.hidden_size=64",
        "projection.dim=32",
        "train.batch_size=128", "train.optim.total_steps=100",
        "train.optim.warmup_steps=10",
    ])

    model = build_model(cfg)
    train_batches, val_batches = build_data(cfg)
    state = create_train_state(model, cfg, next(iter(train_batches())))

    trainer = Trainer(cfg, state, ctx=None)
    history = trainer.train(train_batches, val_batches, num_epochs=args.epochs)
    print(f"train_loss: {history['train_loss'][0]:.3f} -> "
          f"{history['train_loss'][-1]:.3f}")

    # Retrieval on the val set: embed both sides, R@k over cosine sims.
    batch = next(iter(val_batches()))
    out = trainer.state.apply_fn(
        {"params": trainer.state.params}, batch, deterministic=True)
    m = retrieval_metrics(out["emb_a"], out["emb_b"])
    print({k: round(float(v), 3) for k, v in m.items()})

    # Checkpoint round-trip.
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, keep=2)
        mgr.save(trainer.state, step=int(trainer.state.step))
        mgr.wait()
        restored = mgr.restore(trainer.state)
        assert int(restored.step) == int(trainer.state.step)
        print(f"checkpoint round-trip ok at step {int(restored.step)}")

    assert history["train_loss"][-1] < history["train_loss"][0], "loss fell"


if __name__ == "__main__":
    main()
