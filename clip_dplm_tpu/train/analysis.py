"""Evaluation-time analysis suite.

Capability match for the run1/full.py analyzers (SURVEY.md section 2.2 #22):
confusion matrices + per-pair cell-type confusion rates, embedding-collapse
(mean intra-group cosine), marker-space similarity, failure-case mining,
cross-dataset analysis, hard-negative cache stats, training-dynamics tracking,
and PCA distribution analysis — all vectorized jax/numpy, no per-sample
python loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from clip_dplm_tpu.ops.infonce import l2_normalize
from clip_dplm_tpu.train.metrics import (
    confusion_matrix,
    cosine_similarity_matrix,
    embedding_collapse,
    retrieval_metrics,
)


def compute_confusion_matrix(
    emb_a: np.ndarray, emb_b: np.ndarray, labels: np.ndarray, n_classes: int
) -> np.ndarray:
    """Class-level retrieval confusion: row = true class of the query, col =
    class of its top-1 retrieved item (run1/full.py:257-268 semantics)."""
    sim = np.asarray(cosine_similarity_matrix(jnp.asarray(emb_a), jnp.asarray(emb_b)))
    top1 = sim.argmax(axis=1)
    pred = labels[top1]
    return np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(labels), n_classes))


def analyze_cell_type_confusion(
    cm: np.ndarray, class_names: Optional[Sequence[str]] = None
) -> List[Dict[str, float]]:
    """Per-pair confusion rates, sorted (run1/full.py:297-306): rate of class
    i retrieved as class j, off-diagonal."""
    norm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1)
    pairs = []
    k = cm.shape[0]
    for i in range(k):
        for j in range(k):
            if i != j and norm[i, j] > 0:
                pairs.append({
                    "true": class_names[i] if class_names else i,
                    "predicted": class_names[j] if class_names else j,
                    "rate": float(norm[i, j]),
                })
    return sorted(pairs, key=lambda p: -p["rate"])


def analyze_embedding_collapse(
    embeddings: Dict[str, np.ndarray], labels: np.ndarray
) -> Dict[str, float]:
    """Mean intra-group cosine per embedding space (run1/full.py:307-315;
    higher = more collapsed; proposal.MD:29 reports 0.92->0.87 etc.)."""
    return {
        name: float(embedding_collapse(jnp.asarray(e), jnp.asarray(labels)))
        for name, e in embeddings.items()
    }


def marker_space_analysis(
    markers: np.ndarray, emb: np.ndarray
) -> Dict[str, float]:
    """Correlation between raw marker-space and learned-embedding-space
    similarity structures (run1/full.py:357-363)."""
    sm = np.asarray(cosine_similarity_matrix(jnp.asarray(markers), jnp.asarray(markers)))
    se = np.asarray(cosine_similarity_matrix(jnp.asarray(emb), jnp.asarray(emb)))
    iu = np.triu_indices(sm.shape[0], k=1)
    corr = np.corrcoef(sm[iu], se[iu])[0, 1]
    return {"marker_embedding_similarity_corr": float(corr)}


def analyze_failure_cases(
    emb_a: np.ndarray, emb_b: np.ndarray, top_k: int = 10
) -> List[Dict[str, float]]:
    """Mine the worst retrieval failures: pairs whose positive similarity
    trails the best negative by the largest margin (run1/full.py:415-430)."""
    sim = np.asarray(cosine_similarity_matrix(jnp.asarray(emb_a), jnp.asarray(emb_b)))
    n = sim.shape[0]
    pos = sim[np.arange(n), np.arange(n)]
    masked = sim.copy()
    masked[np.arange(n), np.arange(n)] = -np.inf
    hardest = masked.argmax(axis=1)
    margin = masked.max(axis=1) - pos
    order = np.argsort(-margin)[:top_k]
    return [
        {
            "index": int(i),
            "positive_sim": float(pos[i]),
            "hardest_negative": int(hardest[i]),
            "hardest_negative_sim": float(masked[i, hardest[i]]),
            "margin": float(margin[i]),
        }
        for i in order
        if margin[i] > 0
    ]


def cross_dataset_analysis(
    encode_fn, datasets: Dict[str, Tuple[np.ndarray, np.ndarray]]
) -> Dict[str, Dict[str, float]]:
    """Evaluate retrieval per held-out dataset (run1/full.py:431-440 — the
    ImmGen / HCA / CITE-seq / K562 grid)."""
    out = {}
    for name, (a, b) in datasets.items():
        emb_a, emb_b = encode_fn(a, b)
        out[name] = {
            k: float(v)
            for k, v in retrieval_metrics(jnp.asarray(emb_a), jnp.asarray(emb_b)).items()
        }
    return out


def hard_negative_cache_stats(
    emb_a: np.ndarray, emb_b: np.ndarray, cache: np.ndarray, cache_len: int
) -> Dict[str, float]:
    """Cache hit rate: how often a cache entry outscores the in-batch best
    negative (run1/full.py:449-461; proposal.MD:21 reports 76.4%)."""
    if cache_len == 0:
        return {"cache_hit_rate": 0.0, "cache_mean_sim": 0.0}
    a = np.asarray(l2_normalize(jnp.asarray(emb_a)))
    b = np.asarray(l2_normalize(jnp.asarray(emb_b)))
    c = cache[:cache_len]
    sim_batch = a @ b.T
    np.fill_diagonal(sim_batch, -np.inf)
    best_batch = sim_batch.max(axis=1)
    sim_cache = a @ c.T
    best_cache = sim_cache.max(axis=1)
    return {
        "cache_hit_rate": float((best_cache > best_batch).mean()),
        "cache_mean_sim": float(sim_cache.mean()),
    }


def analyze_embedding_distributions(
    embeddings: Dict[str, np.ndarray], n_components: int = 10
) -> Dict[str, Dict[str, float]]:
    """PCA spectrum stats per space (run1/full.py:391-400): effective rank,
    explained-variance concentration, feature-norm stats."""
    out = {}
    for name, e in embeddings.items():
        e = np.asarray(e, np.float64)
        e = e - e.mean(axis=0)
        cov_eigs = np.linalg.eigvalsh(np.cov(e, rowvar=False))[::-1]
        cov_eigs = np.maximum(cov_eigs, 0)
        p = cov_eigs / max(cov_eigs.sum(), 1e-12)
        eff_rank = float(np.exp(-(p * np.log(np.maximum(p, 1e-12))).sum()))
        out[name] = {
            "effective_rank": eff_rank,
            "top1_explained_variance": float(p[0]),
            f"top{n_components}_explained_variance": float(p[:n_components].sum()),
            "mean_norm": float(np.linalg.norm(e, axis=1).mean()),
        }
    return out


class TrainingDynamicsTracker:
    """Accumulates per-step scalars, exposes moving averages + history
    (run1/full.py:401-414 + MetricTracker moving averages,
    triple_flow/1_config.py:385-432)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.history: Dict[str, List[float]] = {}
        self.best: Dict[str, float] = {}
        self.steps_since_best: Dict[str, int] = {}

    def update(self, metrics: Dict[str, float]) -> Dict[str, float]:
        smoothed = {}
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(float(v))
            window = self.history[k][-self.window:]
            smoothed[k] = float(np.mean(window))
            if k not in self.best or v < self.best[k]:
                self.best[k] = float(v)
                self.steps_since_best[k] = 0
            else:
                self.steps_since_best[k] += 1
        return smoothed

    def improved(self, key: str) -> bool:
        return self.steps_since_best.get(key, 0) == 0
