"""Analysis suite, probe classifiers, visualization, logging."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.models.classifiers import (
    PROBES,
    ablation_study,
    evaluate_probe,
    train_probe,
)
from clip_dplm_tpu.train.analysis import (
    TrainingDynamicsTracker,
    analyze_cell_type_confusion,
    analyze_embedding_collapse,
    analyze_embedding_distributions,
    analyze_failure_cases,
    compute_confusion_matrix,
    cross_dataset_analysis,
    hard_negative_cache_stats,
    marker_space_analysis,
)
from clip_dplm_tpu.utils.logging import MetricLogger, StepTimer
from clip_dplm_tpu.utils.visualization import Visualizer


def _clustered_embeddings(rng, n=60, d=16, k=3):
    centers = rng.normal(size=(k, d)).astype(np.float32) * 3
    labels = rng.integers(0, k, n)
    emb = centers[labels] + 0.3 * rng.normal(size=(n, d)).astype(np.float32)
    return emb, labels


def test_confusion_pipeline(rng):
    emb, labels = _clustered_embeddings(rng)
    cm = compute_confusion_matrix(emb, emb, labels, 3)
    assert cm.sum() == 60
    # identical spaces -> diagonal dominant
    assert np.trace(cm) > 0.8 * cm.sum()
    pairs = analyze_cell_type_confusion(cm, ["a", "b", "c"])
    assert all("rate" in p for p in pairs)


def test_embedding_collapse_and_distributions(rng):
    emb, labels = _clustered_embeddings(rng)
    collapse = analyze_embedding_collapse({"x": emb}, labels)
    assert 0 < collapse["x"] <= 1
    dist = analyze_embedding_distributions({"x": emb})
    assert dist["x"]["effective_rank"] > 1
    assert 0 < dist["x"]["top1_explained_variance"] <= 1


def test_marker_space_analysis(rng):
    markers = rng.normal(size=(30, 8)).astype(np.float32)
    out = marker_space_analysis(markers, markers @ rng.normal(size=(8, 4)).astype(np.float32))
    assert -1 <= out["marker_embedding_similarity_corr"] <= 1


def test_failure_cases(rng):
    emb, _ = _clustered_embeddings(rng, n=20)
    bad = emb.copy()
    bad[0] = -emb[0]  # make sample 0 a guaranteed failure
    fails = analyze_failure_cases(bad, emb, top_k=5)
    assert fails and fails[0]["index"] == 0
    assert fails[0]["margin"] > 0


def test_cross_dataset_analysis(rng):
    def encode(a, b):
        return a, b

    datasets = {
        "immgen": (rng.normal(size=(20, 8)).astype(np.float32),) * 2,
        "k562": (rng.normal(size=(20, 8)).astype(np.float32),) * 2,
    }
    out = cross_dataset_analysis(encode, datasets)
    assert out["immgen"]["R@1"] == 1.0  # identical towers retrieve perfectly


def test_cache_stats(rng):
    a = rng.normal(size=(10, 8)).astype(np.float32)
    b = rng.normal(size=(10, 8)).astype(np.float32)
    cache = np.concatenate([a, rng.normal(size=(6, 8)).astype(np.float32)])
    out = hard_negative_cache_stats(a, b, cache, cache_len=16)
    assert out["cache_hit_rate"] == 1.0  # cache contains a itself -> sim 1


def test_training_dynamics_tracker():
    tr = TrainingDynamicsTracker(window=3)
    for v in (3.0, 2.0, 1.0, 1.5):
        sm = tr.update({"loss": v})
    assert abs(sm["loss"] - np.mean([2.0, 1.0, 1.5])) < 1e-9
    assert tr.best["loss"] == 1.0
    assert not tr.improved("loss")


@pytest.mark.slow
def test_probe_grid(rng):
    emb, labels = _clustered_embeddings(rng, n=120, d=24, k=3)
    for name in ("linear", "mlp"):
        probe = PROBES[name](num_classes=3)
        params = train_probe(probe, emb, labels, num_steps=100)
        acc = evaluate_probe(probe, params, emb, labels)
        assert acc > 0.8, (name, acc)


def test_ablation_study(rng):
    emb, labels = _clustered_embeddings(rng, n=80, d=16, k=2)

    def variant():
        return {"train_x": emb[:60], "train_y": labels[:60],
                "test_x": emb[60:], "test_y": labels[60:]}

    grid = ablation_study({"base": variant}, num_classes=2,
                          probe_names=("linear",), num_steps=80)
    assert grid["base"]["linear"] > 0.7


def test_visualizer_produces_figures(tmp_path, rng):
    viz = Visualizer(str(tmp_path))
    emb, labels = _clustered_embeddings(rng, n=40)
    paths = [
        viz.plot_embeddings({"a": emb}, labels, method="pca"),
        viz.plot_attention_weights(rng.random((6, 8))),
        viz.plot_training_progress({"train": [3, 2, 1], "val": [3.2, 2.5, 1.6]}),
        viz.plot_similarity_matrix(np.corrcoef(emb)),
        viz.plot_trajectory(rng.normal(size=(20, 5)).astype(np.float32)),
        viz.plot_flow_field(lambda x, t: -x),
    ]
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_metric_logger_csv(tmp_path):
    log = MetricLogger(str(tmp_path), use_wandb=False)
    log.log(0, {"loss": 1.0})
    log.log(1, {"loss": 0.5})
    log.close()
    text = open(log.csv_path).read()
    assert "loss" in text and "0.5" in text


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        t.tick()
    assert t.mean > 0 and len(t.times) == 2
