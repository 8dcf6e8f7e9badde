"""Multi-chip training on a VIRTUAL 8-device CPU mesh — no TPU pod needed.

The exact pattern that scales to real hardware: a (data=4, model=2) mesh,
batches sharded on the data axis, shape-based tensor-parallel param
shardings, and the global-batch contrastive loss all-gathered over the
mesh. On a pod slice, drop the XLA_FLAGS line and the same code runs over
the real ICI fabric.

    python examples/04_multichip.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 8 virtual CPU devices; must be set before the first backend use.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 8, jax.devices()

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.experiments.registry import build_data, build_model
    from clip_dplm_tpu.parallel import create_mesh
    from clip_dplm_tpu.parallel.mesh import apply_tp_sharding
    from clip_dplm_tpu.train import Trainer, create_train_state

    cfg = apply_overrides(Config(), [
        "experiment=two_tower",
        "tower_a.hidden_size=128", "tower_b.hidden_size=128",
        "projection.dim=64",
        "train.batch_size=256",                  # global batch: 32 per device
        "train.optim.total_steps=50", "train.optim.warmup_steps=5",
        "mesh.model_parallel=2",                 # (data=4, model=2) mesh
        "contrastive.gather_global_batch=true",  # loss over the GLOBAL batch
    ])

    ctx = create_mesh(model_parallel=cfg.mesh.model_parallel)
    print("mesh:", dict(ctx.mesh.shape))

    model = build_model(cfg)
    train_batches, val_batches = build_data(cfg)
    state = create_train_state(model, cfg, next(iter(train_batches())))
    state = apply_tp_sharding(state, ctx)  # big weights sharded on 'model'

    trainer = Trainer(cfg, state, ctx=ctx)  # pjit'ed step with real shardings
    history = trainer.train(train_batches, val_batches, num_epochs=2)
    print(f"train_loss: {history['train_loss'][0]:.3f} -> "
          f"{history['train_loss'][-1]:.3f}")
    assert history["train_loss"][-1] < history["train_loss"][0]

    # Inspect how the big weights actually landed on the mesh (small leaves
    # stay replicated; large ones shard along the 'model' axis).
    sharded = [l for l in jax.tree_util.tree_leaves(trainer.state.params)
               if any(s is not None for s in l.sharding.spec)]
    print(f"{len(sharded)} tensor-parallel leaves; e.g. shape "
          f"{sharded[0].shape} -> {sharded[0].sharding.spec}")


if __name__ == "__main__":
    main()
