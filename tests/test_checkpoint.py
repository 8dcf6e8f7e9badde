import jax
import numpy as np
import pytest

from clip_dplm_tpu.config import Config, apply_overrides
from clip_dplm_tpu.data import PairedEmbeddingDataset
from clip_dplm_tpu.models import TwoTowerCLIP
from clip_dplm_tpu.train import create_train_state, make_train_step
from clip_dplm_tpu.train.checkpoint import CheckpointManager


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    cfg = apply_overrides(
        Config(),
        [
            "tower_a.input_dim=16", "tower_a.hidden_size=32",
            "tower_b.input_dim=16", "tower_b.hidden_size=32",
            "projection.dim=16", "train.optim.total_steps=50",
        ],
    )
    model = TwoTowerCLIP(cfg=cfg)
    ds = PairedEmbeddingDataset.synthetic(32, 16, 16)
    batch = {k: v for k, v in next(ds.batches(16, shuffle=False)).items() if k != "labels"}
    state = create_train_state(model, cfg, batch)
    step = jax.jit(make_train_step(cfg))
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(state, int(state.step))

    fresh = create_train_state(model, cfg, batch)
    restored = mgr.restore(fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too -> next step identical
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
