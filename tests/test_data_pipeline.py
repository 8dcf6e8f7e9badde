"""Host data pipeline: CellData, kNN/diffmap/DPT, DEG selection, multi-modal
collation, augmentation, memory queue."""

import numpy as np
import pytest

from clip_dplm_tpu.config import AugmentConfig
from clip_dplm_tpu.data.cells import (
    CellData,
    cluster_graph,
    compute_trajectory_info,
    diffusion_map,
    diffusion_pseudotime,
    knn_graph,
    select_hvg,
    top_degs,
)
from clip_dplm_tpu.data.multimodal import (
    DataAugmentation,
    MemoryQueue,
    MultiModalBatch,
    TripleFlowDataset,
    get_dataloader,
)


@pytest.fixture(scope="module")
def cells():
    return compute_trajectory_info(CellData.synthetic(n_cells=80, n_genes=30))


def test_synthetic_celldata():
    c = CellData.synthetic(n_cells=50, n_genes=20)
    assert c.X.shape == (50, 20)
    assert "X_pert" in c.layers and "mixscape_class" in c.obs


def test_save_load_roundtrip(tmp_path):
    c = CellData.synthetic(n_cells=20, n_genes=10)
    p = str(tmp_path / "cells.npz")
    c.save(p)
    c2 = CellData.load(p)
    np.testing.assert_array_equal(c.X, c2.X)
    np.testing.assert_array_equal(c.obs["cell_type"], c2.obs["cell_type"])
    np.testing.assert_array_equal(c.layers["X_pert"], c2.layers["X_pert"])


def test_knn_graph_symmetric(cells):
    edge_index, conn = knn_graph(cells.X, n_neighbors=5)
    np.testing.assert_allclose(conn, conn.T)
    assert edge_index.shape[0] == 2
    # no self loops
    assert (edge_index[0] != edge_index[1]).all()


def test_diffusion_pseudotime_tracks_progression(cells):
    """DPT from a root must correlate with the synthetic progression coord."""
    conn = cells.uns["connectivities"]
    prog = cells.obs["progression"]
    root = int(np.argmin(prog))
    dpt = diffusion_pseudotime(conn, root)
    corr = np.corrcoef(dpt, prog)[0, 1]
    assert corr > 0.4, corr
    assert dpt[root] == 0.0
    assert 0 <= dpt.min() and dpt.max() <= 1.0


def test_diffusion_map_shapes(cells):
    comps, vals = diffusion_map(cells.uns["connectivities"], n_comps=6)
    assert comps.shape == (80, 6)
    assert np.isfinite(comps).all()


def test_cluster_graph(cells):
    labels = cells.obs["cell_type"]
    g = cluster_graph(cells.uns["connectivities"], labels)
    assert g.shape[0] == g.shape[1] == labels.max() + 1
    assert (g >= 0).all()


def test_top_degs():
    layer = np.zeros((3, 10), np.float32)
    layer[0, 2] = 5.0
    layer[0, 7] = -4.0
    idx, vals = top_degs(layer, k_up=2, k_down=2)
    assert idx.shape == (3, 4) and vals.shape == (3, 4)
    assert 2 in idx[0, :2] and 7 in idx[0, 2:]
    assert vals.max() <= 1.0 and vals.min() >= -1.0
    np.testing.assert_allclose(vals[0].max(), 1.0)


def test_select_hvg():
    X = np.random.default_rng(0).normal(size=(50, 20)).astype(np.float32)
    X[:, 3] *= 10
    hvg = select_hvg(X, n_top_genes=5)
    assert 3 == hvg[0]
    assert len(hvg) == 5


def test_triple_flow_dataset_batch(cells):
    rngv = np.random.default_rng(0)
    gene_to_esm = {g: rngv.normal(size=16).astype(np.float32) for g in range(30)}
    prot = rngv.normal(size=(80, 24)).astype(np.float32)
    ds = TripleFlowDataset(cells, gene_to_esm=gene_to_esm, protein_embeddings=prot)
    batch = ds.batch(np.arange(16))
    assert batch["gene_expr"].shape == (16, 30)
    assert batch["edge_index"].shape[1] == batch["edge_mask"].shape[0]
    assert batch["pert_esm"].shape == (16, 16)
    assert batch["pert_values"].shape == (16, 10)
    assert batch["protein_emb_raw"].shape == (16, 24)
    # masked edges padded with zeros point inside the subgraph
    assert batch["edge_index"].max() < 16


def test_multimodal_collator_offsets(cells):
    ds = TripleFlowDataset(cells)
    s1 = ds.batch(np.arange(8))
    s2 = ds.batch(np.arange(8, 20))
    merged = MultiModalBatch()([s1, s2])
    assert merged["gene_expr"].shape[0] == 20
    assert merged["batch_idx"].max() == 1
    assert int(merged["num_graphs"]) == 2
    # second graph's edges offset by 8
    e2 = merged["edge_index"][:, s1["edge_index"].shape[1]:]
    m2 = merged["edge_mask"][s1["edge_mask"].shape[0]:]
    assert (e2[:, m2] >= 8).all()


def test_augmentation():
    aug = DataAugmentation(AugmentConfig(gene_dropout=0.5, edge_dropout=0.5,
                                         perturbation_noise=0.1), seed=0)
    batch = {
        "gene_expr": np.ones((10, 20), np.float32),
        "edge_mask": np.ones(50, bool),
        "pert_values": np.zeros((10, 5), np.float32),
    }
    out = aug(batch)
    assert (out["gene_expr"] == 0).mean() > 0.3
    assert out["edge_mask"].sum() < 50
    assert np.abs(out["pert_values"]).max() > 0
    # original untouched
    assert (batch["gene_expr"] == 1).all()


def test_memory_queue_wraparound():
    q = MemoryQueue(size=10, dim=4)
    q.enqueue_dequeue(np.ones((4, 4), np.float32))
    assert q.filled == 4
    q.enqueue_dequeue(2 * np.ones((4, 4), np.float32))
    q.enqueue_dequeue(3 * np.ones((4, 4), np.float32))  # wraps
    assert q.filled == 10
    assert q.get().shape == (10, 4)
    # the wrap wrote rows 8,9 then 0,1
    np.testing.assert_allclose(q.queue[0], 3.0)
    np.testing.assert_allclose(q.queue[4], 2.0)


@pytest.mark.slow
def test_dataloader_end_to_end_with_model(cells):
    """Batches from the pipeline feed TripleFlowModel directly."""
    import jax
    import jax.numpy as jnp

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models.triple_flow_model import TripleFlowModel

    rngv = np.random.default_rng(0)
    gene_to_esm = {g: rngv.normal(size=48).astype(np.float32) for g in range(30)}
    prot = rngv.normal(size=(80, 64)).astype(np.float32)
    ds = TripleFlowDataset(cells, gene_to_esm=gene_to_esm, protein_embeddings=prot)
    aug = DataAugmentation(AugmentConfig(), seed=1)
    batch = next(get_dataloader(ds, batch_size=16, augment=aug, seed=2))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    cfg = apply_overrides(
        Config(),
        ["encoders.latent_dim=16", "encoders.gene_dim=30", "encoders.esm_dim=48",
         "encoders.protein_hidden_dims=[32]", "encoders.gnn.num_layers=1",
         "encoders.gnn.num_heads=2", "flow.latent_dim=16", "flow.hidden_dim=32",
         "flow.n_layers=1", "flow.flow_type=independent"],
    )
    model = TripleFlowModel(cfg=cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1), batch)
    out = model.apply(variables, jax.random.PRNGKey(2), batch)
    assert set(out["embeddings"]) == {"cell_emb", "pert_emb", "protein_emb"}
    assert np.isfinite(np.asarray(out["embeddings"]["cell_emb"])).all()


def test_leiden_recovers_planted_communities():
    """Three well-separated blobs -> leiden finds >= 3 clusters that refine
    the planted partition, with modularity far above random labelings."""
    from clip_dplm_tpu.data.cells import leiden_clusters, modularity

    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    planted = np.repeat(np.arange(3), 40)
    X = centers[planted] + 0.5 * rng.normal(size=(120, 2))
    _, conn = knn_graph(X, n_neighbors=8)
    labels = leiden_clusters(conn, seed=0)
    # every found cluster lives inside one planted blob (refinement)
    for c in np.unique(labels):
        assert len(np.unique(planted[labels == c])) == 1
    q = modularity(conn, labels)
    q_rand = modularity(conn, rng.integers(0, labels.max() + 1, 120))
    assert q > 0.5 and q > q_rand + 0.2


def test_paga_connectivity_tracks_branch_topology():
    """Linear chain of blobs A-B-C: PAGA connects adjacent blobs strongly and
    the non-adjacent pair (A, C) weakly; disconnected components get 0."""
    from clip_dplm_tpu.data.cells import paga_connectivities

    rng = np.random.default_rng(1)
    # chain: blobs at x = 0, 4, 8 (adjacent blobs touch; A-C never)
    planted = np.repeat(np.arange(3), 50)
    X = np.stack([4.0 * planted + 0.9 * rng.normal(size=150),
                  0.4 * rng.normal(size=150)], axis=1)
    _, conn = knn_graph(X.astype(np.float32), n_neighbors=10)
    c = paga_connectivities(conn, planted.astype(np.int32))
    assert c[0, 1] > c[0, 2] and c[1, 2] > c[0, 2]
    np.testing.assert_allclose(np.diag(c), 0.0)
    # two disconnected components -> zero cross connectivity
    conn2 = np.zeros((20, 20), np.float32)
    conn2[:10, :10] = 1.0
    conn2[10:, 10:] = 1.0
    np.fill_diagonal(conn2, 0.0)
    c2 = paga_connectivities(conn2, np.repeat(np.arange(2), 10).astype(np.int32))
    assert c2[0, 1] == 0.0


def test_trajectory_info_includes_leiden_paga(cells):
    assert "leiden" in cells.obs
    paga = cells.uns["paga"]
    k = int(cells.obs["leiden"].max()) + 1
    assert paga["connectivities"].shape == (k, k)
    assert (paga["connectivities"] >= 0).all() and (paga["connectivities"] <= 1).all()
