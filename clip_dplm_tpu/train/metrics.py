"""Evaluation metrics: retrieval, matching accuracy, flow/biological metrics.

Fills the reference's missing `tong/utils/metrics.py` (imported by
tong/utils/__init__.py:3, tong/utils/training.py:4 and
tong/experiments/evaluate.py:5 but absent). `FlowEvaluator` /
`BiologicalMetrics` are designed from their call sites
(tong/utils/training.py:53, tong/experiments/evaluate.py:40-45) with the
metrics named in tong/configs/default.yaml:74 (wasserstein / mmd / fid).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clip_dplm_tpu.ops.infonce import l2_normalize


# ---------------------------------------------------------------------------
# retrieval (the BASELINE.json headline: R@1 / R@10)
# ---------------------------------------------------------------------------


def cosine_similarity_matrix(emb_a: jax.Array, emb_b: jax.Array) -> jax.Array:
    return l2_normalize(emb_a) @ l2_normalize(emb_b).T


@jax.jit
def retrieval_metrics(emb_a: jax.Array, emb_b: jax.Array) -> Dict[str, jax.Array]:
    """Bidirectional retrieval R@1/R@5/R@10 + matching accuracy over a paired
    eval set (positives on the diagonal, as in run1/full.py:142-160)."""
    sim = cosine_similarity_matrix(emb_a, emb_b)
    n = sim.shape[0]
    labels = jnp.arange(n)

    def ranks(s):
        order = jnp.argsort(-s, axis=-1)
        return jnp.argmax(order == labels[:, None], axis=-1)

    r_ab = ranks(sim)
    r_ba = ranks(sim.T)
    out = {}
    for k in (1, 5, 10):
        out[f"R@{k}_ab"] = (r_ab < k).mean()
        out[f"R@{k}_ba"] = (r_ba < k).mean()
        out[f"R@{k}"] = 0.5 * ((r_ab < k).mean() + (r_ba < k).mean())
    out["accuracy"] = 0.5 * (
        (jnp.argmax(sim, -1) == labels).mean() + (jnp.argmax(sim.T, -1) == labels).mean()
    )
    out["mean_rank"] = 0.5 * (r_ab.mean() + r_ba.mean())
    return out


# ---------------------------------------------------------------------------
# distribution metrics for flows (wasserstein / mmd / fid)
# ---------------------------------------------------------------------------


def wasserstein2_gaussian(x: jax.Array, y: jax.Array) -> jax.Array:
    """Gaussian (Bures) W2^2 between sample sets: |mu_x-mu_y|^2 +
    Tr(Cx + Cy - 2(Cx^1/2 Cy Cx^1/2)^1/2). Computed via eigh — jittable."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mx, my = x.mean(0), y.mean(0)
    cx = jnp.cov(x, rowvar=False) + 1e-6 * jnp.eye(x.shape[1])
    cy = jnp.cov(y, rowvar=False) + 1e-6 * jnp.eye(y.shape[1])
    sqrt_cx = _sqrtm_psd(cx)
    cross = _sqrtm_psd(sqrt_cx @ cy @ sqrt_cx)
    return jnp.sum((mx - my) ** 2) + jnp.trace(cx + cy - 2.0 * cross)


def _sqrtm_psd(m: jax.Array) -> jax.Array:
    w, v = jnp.linalg.eigh(m)
    w = jnp.maximum(w, 0.0)
    return (v * jnp.sqrt(w)[None, :]) @ v.T


def frechet_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """FID-style Frechet distance == Gaussian W2^2 in embedding space."""
    return wasserstein2_gaussian(x, y)


def mmd_rbf(
    x: jax.Array, y: jax.Array, bandwidths: Sequence[float] = (1.0, 2.0, 4.0, 8.0)
) -> jax.Array:
    """Multi-bandwidth RBF MMD^2 (unbiased off-diagonal estimator)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    def pdist2(u, v):
        uu = jnp.sum(u * u, 1)[:, None]
        vv = jnp.sum(v * v, 1)[None, :]
        return uu + vv - 2.0 * (u @ v.T)

    dxx, dyy, dxy = pdist2(x, x), pdist2(y, y), pdist2(x, y)
    n, m = x.shape[0], y.shape[0]
    total = jnp.zeros(())
    for bw in bandwidths:
        kxx = jnp.exp(-dxx / (2 * bw * bw))
        kyy = jnp.exp(-dyy / (2 * bw * bw))
        kxy = jnp.exp(-dxy / (2 * bw * bw))
        exx = (kxx.sum() - jnp.trace(kxx)) / (n * (n - 1))
        eyy = (kyy.sum() - jnp.trace(kyy)) / (m * (m - 1))
        total = total + exx + eyy - 2.0 * kxy.mean()
    return total / len(bandwidths)


def sliced_wasserstein(
    x: jax.Array, y: jax.Array, n_proj: int = 64, key: Optional[jax.Array] = None
) -> jax.Array:
    """Sample-based sliced-W2: random 1D projections + sorted L2. Cheap and
    unbiased alternative to the Gaussian approximation."""
    key = key if key is not None else jax.random.PRNGKey(0)
    d = x.shape[1]
    proj = jax.random.normal(key, (d, n_proj))
    proj = proj / jnp.linalg.norm(proj, axis=0, keepdims=True)
    px = jnp.sort(x.astype(jnp.float32) @ proj, axis=0)
    py = jnp.sort(y.astype(jnp.float32) @ proj, axis=0)
    return jnp.mean((px - py) ** 2)


class FlowEvaluator:
    """Flow-quality metrics over (generated, target) sample pairs — the
    interface consumed at tong/utils/training.py:53 and
    tong/experiments/evaluate.py:40-45."""

    def __init__(self, metrics: Sequence[str] = ("wasserstein", "mmd", "fid")):
        self.metrics = tuple(metrics)

    def compute_all_metrics(
        self, generated: jax.Array, target: jax.Array
    ) -> Dict[str, float]:
        out: Dict[str, float] = {}
        if "wasserstein" in self.metrics:
            out["wasserstein"] = float(sliced_wasserstein(generated, target))
        if "mmd" in self.metrics:
            out["mmd"] = float(mmd_rbf(generated, target))
        if "fid" in self.metrics:
            out["fid"] = float(frechet_distance(generated, target))
        return out


class BiologicalMetrics:
    """Embedding-space biology metrics (interface of
    tong/experiments/evaluate.py:43-45): per-class alignment quality."""

    def compute_all_metrics(
        self,
        emb_a: np.ndarray,
        emb_b: np.ndarray,
        labels: Optional[np.ndarray] = None,
    ) -> Dict[str, float]:
        out = {k: float(v) for k, v in retrieval_metrics(
            jnp.asarray(emb_a), jnp.asarray(emb_b)).items()}
        if labels is not None:
            out["embedding_collapse_a"] = float(
                embedding_collapse(jnp.asarray(emb_a), jnp.asarray(labels))
            )
            out["embedding_collapse_b"] = float(
                embedding_collapse(jnp.asarray(emb_b), jnp.asarray(labels))
            )
        return out


def embedding_collapse(emb: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean intra-group cosine similarity (run1/full.py:307-315 semantics:
    higher = more collapsed). Vectorized over groups via segment means."""
    z = l2_normalize(emb)
    sim = z @ z.T
    same = labels[:, None] == labels[None, :]
    off_diag = ~jnp.eye(sim.shape[0], dtype=bool)
    mask = same & off_diag
    return jnp.sum(sim * mask) / jnp.maximum(jnp.sum(mask), 1)


def confusion_matrix(pred: jax.Array, true: jax.Array, n_classes: int) -> jax.Array:
    """run1/full.py:257-268 semantics, as one scatter-add."""
    idx = true * n_classes + pred
    flat = jnp.zeros(n_classes * n_classes, jnp.int32).at[idx].add(1)
    return flat.reshape(n_classes, n_classes)
