"""Segment ops, PiGNN, tong encoders, 3-way TF CLIP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import Config, EncoderConfig, GNNConfig, apply_overrides
from clip_dplm_tpu.models.gnn import MultiLayerPiGNN
from clip_dplm_tpu.models.tf_clip import TFContrastiveModel
from clip_dplm_tpu.models.tong_encoders import (
    CellStateEncoder,
    PerturbationEncoder,
    ProteinEncoder,
)
from clip_dplm_tpu.ops.infonce import clip_loss, multiway_clip_loss
from clip_dplm_tpu.ops.segment import segment_mean, segment_softmax, segment_sum


def test_segment_ops_basic():
    data = jnp.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]])
    seg = jnp.array([0, 0, 1, 1])
    np.testing.assert_allclose(
        np.asarray(segment_mean(data, seg, 2)), [[2.0, 3.0], [6.0, 7.0]]
    )
    mask = jnp.array([True, False, True, True])
    np.testing.assert_allclose(
        np.asarray(segment_mean(data, seg, 2, mask=mask)), [[1.0, 2.0], [6.0, 7.0]]
    )


def test_segment_softmax_sums_to_one():
    scores = jnp.array([1.0, 2.0, 3.0, -1.0, 5.0])
    seg = jnp.array([0, 0, 0, 1, 1])
    p = segment_softmax(scores, seg, 2)
    np.testing.assert_allclose(float(p[:3].sum()), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(p[3:].sum()), 1.0, rtol=1e-6)
    # masked entries get zero probability
    mask = jnp.array([True, True, False, True, True])
    p = segment_softmax(scores, seg, 2, mask=mask)
    assert float(p[2]) == 0.0
    np.testing.assert_allclose(float(p[:3].sum()), 1.0, rtol=1e-6)


def _graph(rng, n_nodes=12, n_edges=24, pad_edges=8, num_graphs=2, d=32):
    h = rng.normal(size=(n_nodes, d)).astype(np.float32)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    # padding edges (masked out) point at node 0
    edge_index = np.stack([
        np.concatenate([src, np.zeros(pad_edges, np.int64)]),
        np.concatenate([dst, np.zeros(pad_edges, np.int64)]),
    ])
    edge_mask = np.concatenate([np.ones(n_edges, bool), np.zeros(pad_edges, bool)])
    batch_idx = np.sort(rng.integers(0, num_graphs, n_nodes))
    return h, edge_index, edge_mask, batch_idx


@pytest.mark.slow
def test_pignn_padded_edge_invariance(rng):
    """Changing where masked padding edges point must not change outputs."""
    h, edge_index, edge_mask, batch_idx = _graph(rng)
    gnn = MultiLayerPiGNN(cfg=GNNConfig(num_layers=2, num_heads=4), latent_dim=32)
    params = gnn.init(
        jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(edge_index),
        jnp.asarray(batch_idx), jnp.asarray(edge_mask), None, 2,
    )
    out1 = gnn.apply(params, jnp.asarray(h), jnp.asarray(edge_index),
                     jnp.asarray(batch_idx), jnp.asarray(edge_mask), None, 2)
    # repoint padded edges somewhere else
    ei2 = edge_index.copy()
    ei2[:, -8:] = 5
    out2 = gnn.apply(params, jnp.asarray(h), jnp.asarray(ei2),
                     jnp.asarray(batch_idx), jnp.asarray(edge_mask), None, 2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-5)


@pytest.mark.slow
def test_cell_state_encoder(rng):
    cfg = EncoderConfig(latent_dim=32, gene_dim=50,
                        gnn=GNNConfig(num_layers=2, num_heads=4))
    h, edge_index, edge_mask, batch_idx = _graph(rng, d=50)
    enc = CellStateEncoder(cfg=cfg)
    dpt = rng.random(12).astype(np.float32)
    params = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(dpt),
        jnp.asarray(edge_index), jnp.asarray(batch_idx),
        jnp.asarray(edge_mask), None, 2,
    )
    out = enc.apply(params, jnp.asarray(h), jnp.asarray(dpt),
                    jnp.asarray(edge_index), jnp.asarray(batch_idx),
                    jnp.asarray(edge_mask), None, 2)
    assert out.shape == (12, 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_perturbation_and_protein_encoders(rng):
    cfg = EncoderConfig(latent_dim=32, esm_dim=64, n_perturb_genes=10,
                        protein_hidden_dims=(48, 40),
                        gnn=GNNConfig(num_heads=4))
    pe = PerturbationEncoder(cfg=cfg)
    esm = jnp.asarray(rng.normal(size=(6, 64)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(6, 10)).astype(np.float32))
    params = pe.init(jax.random.PRNGKey(0), esm, vals)
    out = pe.apply(params, esm, vals)
    assert out.shape == (6, 32)

    pr = ProteinEncoder(cfg=cfg)
    x = jnp.asarray(rng.normal(size=(6, 64)).astype(np.float32))
    params = pr.init(jax.random.PRNGKey(0), x)
    assert pr.apply(params, x).shape == (6, 32)

    # residual path when protein_dim == latent_dim
    x32 = jnp.asarray(rng.normal(size=(6, 32)).astype(np.float32))
    pr2 = ProteinEncoder(cfg=cfg)
    params2 = pr2.init(jax.random.PRNGKey(0), x32)
    assert pr2.apply(params2, x32).shape == (6, 32)


def test_multiway_loss_matches_sum_of_pairwise(rng):
    embs = {
        "cell": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
        "pert": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
        "protein": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
    }
    ls = jnp.asarray(np.float32(2.0))
    total, metrics = multiway_clip_loss(embs, ls)
    expected = sum(
        float(clip_loss(embs[a], embs[b], ls)[0])
        for a, b in [("cell", "pert"), ("cell", "protein"), ("pert", "protein")]
    )
    np.testing.assert_allclose(float(total), expected, rtol=1e-6)
    assert len([k for k in metrics if k.startswith("loss_")]) == 3


def test_multiway_loss_skips_missing_modalities(rng):
    embs = {
        "cell": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
        "protein": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
    }
    total, metrics = multiway_clip_loss(embs, jnp.asarray(np.float32(2.0)))
    assert set(k for k in metrics if k.startswith("loss_")) == {"loss_cell_protein"}


@pytest.mark.slow
def test_tf_contrastive_model_trains(rng):
    cfg = apply_overrides(
        Config(),
        ["projection.dim=32", "encoders.latent_dim=32", "encoders.esm_dim=48"],
    )
    model = TFContrastiveModel(cfg=cfg)
    B, G, T = 8, 20, 5
    conn = (rng.random((B, B)) < 0.4).astype(np.float32)
    conn[0, :] = 0  # cell 0 has no neighbors -> masked from attention
    batch = {
        "cell_state": jnp.asarray(rng.normal(size=(B, G + 1)).astype(np.float32)),
        "connectivity": jnp.asarray(conn),
        "gene_esm": jnp.asarray(rng.normal(size=(B, T, 48)).astype(np.float32)),
        "gene_values": jnp.asarray(rng.normal(size=(B, T)).astype(np.float32)),
        "protein_emb": jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True,
    )["params"]
    out = model.apply({"params": params}, batch, deterministic=True)
    assert out["cell_embed"].shape == (B, 32)

    import optax

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            o = model.apply({"params": p}, batch, deterministic=True)
            embs = {k: o[k] for k in ("cell_embed", "pert_embed", "protein_embed")}
            loss, _ = multiway_clip_loss(embs, o["logit_scale"])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))
