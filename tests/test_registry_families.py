"""Every experiment family in the registry wires model + data + Trainer loss:
one real train step end-to-end per family (VERDICT round-1 gap: esm_clip,
tf_clip, triple_flow, dplm trained only via the library API)."""

import jax
import numpy as np
import pytest

from clip_dplm_tpu.config import Config, apply_overrides
from clip_dplm_tpu.experiments.registry import build_data, build_model
from clip_dplm_tpu.train import create_train_state, make_train_step
from clip_dplm_tpu.train.trainer import make_eval_step

FAMILY_OVERRIDES = {
    "two_tower": [
        "tower_a.input_dim=32", "tower_b.input_dim=48",
        "tower_a.hidden_size=32", "tower_b.hidden_size=32",
        "projection.dim=16",
    ],
    "rna_rbp": [
        "rna_tower.input_dim=24", "rna_tower.d_model=32",
        "rna_tower.num_layers=1", "rna_tower.num_heads=2",
        "rbp_tower.input_dim=48", "rbp_tower.d_model=32",
        "rbp_tower.num_layers=1", "rbp_tower.num_heads=2",
        "projection.dim=16",
    ],
    "esm_clip": [
        "esm.d_model=32", "esm.num_layers=1", "esm.num_heads=2",
        "esm.frozen=false", "esm.max_len=64",
        "rna_tower.input_dim=24", "rna_tower.d_model=32",
        "rna_tower.num_layers=1", "rna_tower.num_heads=2",
        "projection.dim=16",
    ],
    "tf_clip": [
        "encoders.gene_dim=20", "encoders.esm_dim=24",
        "encoders.n_perturb_genes=4", "projection.dim=16",
    ],
    "triple_flow": [
        "encoders.gene_dim=20", "encoders.esm_dim=24",
        "encoders.latent_dim=16", "encoders.protein_hidden_dims=[16]",
        "encoders.gnn.num_layers=1", "encoders.gnn.num_heads=2",
        "encoders.n_perturb_genes=4",
        "flow.latent_dim=16", "flow.hidden_dim=16", "flow.n_layers=1",
        "flow.flow_type=independent",
    ],
    "dplm": [
        "dplm.d_model=32", "dplm.num_layers=1", "dplm.num_heads=2",
        "dplm.max_len=32",
    ],
}


@pytest.mark.slow
@pytest.mark.parametrize("family", sorted(FAMILY_OVERRIDES))
def test_family_trains_one_step(family):
    cfg = apply_overrides(
        Config(),
        [f"experiment={family}", "train.batch_size=16",
         # warmup_cosine gives lr=0 at step 0 -> params would not move
         "train.optim.schedule=constant"]
        + FAMILY_OVERRIDES[family],
    )
    model = build_model(cfg)
    train_batches, val_batches = build_data(cfg)
    batch = next(iter(train_batches()))
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    state = create_train_state(model, cfg, batch)
    step = jax.jit(make_train_step(cfg))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"])), family
    # parameters actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(state2.params),
        )
    )
    assert moved, family
    # eval path works too
    ev = make_eval_step(cfg)
    vbatch = next(iter(val_batches()))
    vbatch = {k: jax.numpy.asarray(v) for k, v in vbatch.items()}
    m = jax.jit(ev)(state2, vbatch)
    assert np.isfinite(float(m["loss"])), family
