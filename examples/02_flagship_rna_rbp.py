"""The flagship token-transformer CLIP (RNA tokens <-> RBP embeddings) at a
tiny geometry: padded token batches with explicit masks, plus the TPU
performance switches.

The reference class is the 71.6M-param model of the rna notebook; scale the
overrides up (d_model=512, num_layers=3, max_len=128) to reproduce it.

    python examples/02_flagship_rna_rbp.py --platform cpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, help="cpu | tpu (default: auto)")
    p.add_argument("--fused", action="store_true",
                   help="enable the fused Pallas loss + dense paths (TPU)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.train import Trainer, create_train_state

    overrides = [
        "experiment=rna_rbp",
        # tiny geometry for the example; the real class is d=512 x 3 layers
        "rna_tower.d_model=64", "rna_tower.num_layers=1",
        "rna_tower.num_heads=4", "rna_tower.max_len=64",
        "rbp_tower.d_model=64", "rbp_tower.num_layers=1",
        "rbp_tower.num_heads=4", "rbp_tower.max_len=128",
        "projection.dim=32",
        "train.batch_size=64", "train.optim.total_steps=60",
        "train.optim.warmup_steps=5",
    ]
    if args.fused:
        overrides += [
            "contrastive.use_fused_kernel=true",
            "projection.fused_dense=true",
            "train.rng_impl=unsafe_rbg",
        ]
    cfg = apply_overrides(Config(), overrides)

    model = build_model(cfg)
    train_batches, val_batches = build_data(cfg)
    example = next(iter(train_batches()))
    # Ragged sequences arrive PADDED to static shapes with boolean masks —
    # the collate layer did this on the host (data/collate.py). Static
    # shapes mean one compile, whatever the length mix.
    print({k: tuple(v.shape) for k, v in example.items()})

    state = create_train_state(model, cfg, example)
    trainer = Trainer(cfg, state, ctx=None)
    history = trainer.train(train_batches, val_batches, num_epochs=2)
    print(f"train_loss: {history['train_loss'][0]:.3f} -> "
          f"{history['train_loss'][-1]:.3f}")
    assert history["train_loss"][-1] < history["train_loss"][0]


if __name__ == "__main__":
    main()
