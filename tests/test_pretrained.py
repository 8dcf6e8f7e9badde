import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import Config, apply_overrides
from clip_dplm_tpu.data.cells import one_hot_labels
from clip_dplm_tpu.models import TwoTowerCLIP
from clip_dplm_tpu.train import create_train_state
from clip_dplm_tpu.utils.pretrained import load_pretrained, save_pretrained


@pytest.mark.slow
def test_pretrained_roundtrip(tmp_path, rng):
    cfg = apply_overrides(Config(), [
        "tower_a.input_dim=16", "tower_a.hidden_size=32",
        "tower_b.input_dim=16", "tower_b.hidden_size=32", "projection.dim=16",
    ])
    model = TwoTowerCLIP(cfg=cfg)
    batch = {"a": jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32)),
             "b": jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))}
    state = create_train_state(model, cfg, batch)
    out1 = model.apply({"params": state.params}, batch, deterministic=True)

    save_pretrained(str(tmp_path / "bundle"), cfg, state.params)
    cfg2, model2, params2 = load_pretrained(str(tmp_path / "bundle"))
    assert cfg2 == cfg
    out2 = model2.apply({"params": params2}, batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out1["emb_a"]), np.asarray(out2["emb_a"]), atol=1e-6
    )


def test_one_hot_labels():
    oh = one_hot_labels(np.array([0, 2, 1]))
    assert oh.shape == (3, 3)
    np.testing.assert_array_equal(oh.argmax(1), [0, 2, 1])
    assert one_hot_labels(np.array([0, 1]), n_classes=5).shape == (2, 5)
