"""End-to-end ESM protein CLIP (BASELINE config 2): trainable small tower,
frozen stop-gradient mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import Config, apply_overrides
from clip_dplm_tpu.data import protein
from clip_dplm_tpu.models.protein_clip import ESMProteinCLIP
from clip_dplm_tpu.train import create_train_state, make_train_step


def tiny_cfg(frozen=False):
    return apply_overrides(
        Config(),
        [
            "rna_tower.input_dim=16", "rna_tower.d_model=32",
            "rna_tower.num_layers=1", "rna_tower.num_heads=2",
            "rna_tower.max_len=32",
            "esm.d_model=32", "esm.num_layers=1", "esm.num_heads=2",
            f"esm.frozen={'true' if frozen else 'false'}",
            "projection.dim=16",
            "train.optim.total_steps=50", "train.optim.warmup_steps=1",
            "train.optim.learning_rate=1e-3",
        ],
    )


def make_batch(rng, B=8):
    seqs = [protein.random_protein(rng, int(rng.integers(8, 20))) for _ in range(B)]
    toks, mask = protein.tokenize_batch(seqs, pad_multiple=8)
    S = toks.shape[1]
    return {
        "rna_tokens": rng.normal(size=(B, 12, 16)).astype(np.float32),
        "rna_mask": np.ones((B, 12), bool),
        "protein_tokens": toks,
        "protein_mask": mask,
    }


@pytest.mark.slow
def test_forward_and_train_step(rng):
    cfg = tiny_cfg()
    model = ESMProteinCLIP(cfg=cfg)
    batch = make_batch(rng)
    state = create_train_state(model, cfg, batch)
    out = model.apply({"params": state.params}, batch, deterministic=True)
    assert out["emb_a"].shape == (8, 16) and out["emb_b"].shape == (8, 16)
    step = jax.jit(make_train_step(cfg))
    state2, m = step(state, batch)
    state2, m = step(state2, batch)  # step 1 has lr=0 (warmup ramp from 0)
    assert np.isfinite(float(m["loss"]))
    # esm params updated when not frozen
    p0 = state.params["esm_tower"]["layer_0"]["q"]["kernel"]
    p1 = state2.params["esm_tower"]["layer_0"]["q"]["kernel"]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
def test_frozen_esm_gets_no_grads(rng):
    cfg = tiny_cfg(frozen=True)
    model = ESMProteinCLIP(cfg=cfg)
    batch = make_batch(rng)
    state = create_train_state(model, cfg, batch)
    step = jax.jit(make_train_step(cfg))
    state2, m = step(state, batch)
    state2, m = step(state2, batch)
    p0 = state.params["esm_tower"]["layer_0"]["q"]["kernel"]
    p1 = state2.params["esm_tower"]["layer_0"]["q"]["kernel"]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    # but the projection heads still learn
    r0 = state.params["rna_proj"]["skip"]["kernel"]
    r1 = state2.params["rna_proj"]["skip"]["kernel"]
    assert not np.allclose(np.asarray(r0), np.asarray(r1))
