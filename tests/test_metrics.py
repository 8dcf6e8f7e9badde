import jax.numpy as jnp
import numpy as np

from clip_dplm_tpu.train.metrics import (
    BiologicalMetrics,
    FlowEvaluator,
    confusion_matrix,
    embedding_collapse,
    frechet_distance,
    mmd_rbf,
    retrieval_metrics,
    sliced_wasserstein,
    wasserstein2_gaussian,
)


def test_retrieval_perfect():
    emb = jnp.eye(16, 32)
    r = retrieval_metrics(emb, emb)
    assert float(r["R@1"]) == 1.0
    assert float(r["accuracy"]) == 1.0


def test_retrieval_chance(rng):
    a = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))
    r = retrieval_metrics(a, b)
    assert float(r["R@1"]) < 0.1


def test_w2_gaussian_zero_same(rng):
    x = jnp.asarray(rng.normal(size=(500, 4)).astype(np.float32))
    assert abs(float(wasserstein2_gaussian(x, x))) < 1e-3


def test_w2_gaussian_mean_shift(rng):
    x = rng.normal(size=(2000, 4)).astype(np.float32)
    y = x + np.array([2.0, 0, 0, 0], np.float32)
    w2 = float(wasserstein2_gaussian(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(w2, 4.0, rtol=0.05)


def test_mmd_properties(rng):
    x = jnp.asarray(rng.normal(size=(200, 4)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(200, 4)).astype(np.float32) + 1.5)
    same = float(mmd_rbf(x, x[::-1]))
    diff = float(mmd_rbf(x, y))
    assert diff > same
    assert diff > 0.01


def test_sliced_wasserstein(rng):
    x = jnp.asarray(rng.normal(size=(256, 8)).astype(np.float32))
    y = x + 3.0
    assert float(sliced_wasserstein(x, y)) > float(sliced_wasserstein(x, x))


def test_flow_evaluator(rng):
    ev = FlowEvaluator()
    out = ev.compute_all_metrics(
        jnp.asarray(rng.normal(size=(128, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(128, 8)).astype(np.float32)),
    )
    assert set(out) == {"wasserstein", "mmd", "fid"}
    assert all(np.isfinite(v) for v in out.values())


def test_biological_metrics(rng):
    bm = BiologicalMetrics()
    emb = rng.normal(size=(64, 16)).astype(np.float32)
    labels = rng.integers(0, 4, size=64)
    out = bm.compute_all_metrics(emb, emb, labels)
    assert out["R@1"] == 1.0
    assert "embedding_collapse_a" in out


def test_embedding_collapse_extremes():
    # identical embeddings within group -> collapse == 1
    emb = jnp.concatenate([jnp.ones((4, 8)), -jnp.ones((4, 8))])
    labels = jnp.array([0, 0, 0, 0, 1, 1, 1, 1])
    assert abs(float(embedding_collapse(emb, labels)) - 1.0) < 1e-6


def test_confusion_matrix():
    pred = jnp.array([0, 1, 1, 2])
    true = jnp.array([0, 1, 2, 2])
    cm = np.asarray(confusion_matrix(pred, true, 3))
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[2, 1] == 1 and cm[2, 2] == 1
    assert cm.sum() == 4
