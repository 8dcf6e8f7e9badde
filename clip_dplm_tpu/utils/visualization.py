"""Visualization suite (matplotlib, headless Agg backend).

Capability match for tong/utils/visualization.py:8-91 (t-SNE embedding
scatter per space, flow vector-field quiver/stream, attention heatmap,
train/val metric curves) plus run1/full.py:331-339 result plots.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


class Visualizer:
    def __init__(self, out_dir: str = "runs/figures"):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def _save(self, fig, name: str) -> str:
        path = os.path.join(self.out_dir, f"{name}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path

    def plot_embeddings(
        self,
        embeddings: Dict[str, np.ndarray],
        labels: Optional[np.ndarray] = None,
        name: str = "embeddings",
        method: str = "tsne",
    ) -> str:
        """2-D t-SNE/PCA scatter per embedding space (visualization.py:12-39)."""
        spaces = list(embeddings)
        fig, axes = plt.subplots(1, len(spaces), figsize=(5 * len(spaces), 4.2),
                                 squeeze=False)
        for ax, space in zip(axes[0], spaces):
            e = np.asarray(embeddings[space], np.float64)
            if method == "tsne" and e.shape[0] > 5:
                from sklearn.manifold import TSNE

                xy = TSNE(
                    n_components=2, init="pca",
                    perplexity=min(30, max(2, e.shape[0] // 4)),
                ).fit_transform(e)
            else:
                e = e - e.mean(0)
                _, _, vt = np.linalg.svd(e, full_matrices=False)
                xy = e @ vt[:2].T
            sc = ax.scatter(xy[:, 0], xy[:, 1], c=labels, cmap="tab10", s=12)
            ax.set_title(space)
            if labels is not None:
                fig.colorbar(sc, ax=ax, shrink=0.8)
        return self._save(fig, name)

    def plot_flow_field(
        self,
        velocity_fn,
        bounds: Sequence[float] = (-3, 3, -3, 3),
        grid: int = 20,
        t: float = 0.5,
        name: str = "flow_field",
    ) -> str:
        """2-D vector-field quiver of a learned flow (visualization.py:41-60);
        velocity_fn maps (N, 2) points + (N,) times -> (N, 2) velocities."""
        xs = np.linspace(bounds[0], bounds[1], grid)
        ys = np.linspace(bounds[2], bounds[3], grid)
        xx, yy = np.meshgrid(xs, ys)
        pts = np.stack([xx.ravel(), yy.ravel()], axis=1).astype(np.float32)
        v = np.asarray(velocity_fn(pts, np.full(pts.shape[0], t, np.float32)))
        fig, ax = plt.subplots(figsize=(5.5, 5))
        ax.quiver(pts[:, 0], pts[:, 1], v[:, 0], v[:, 1],
                  np.linalg.norm(v, axis=1), cmap="viridis")
        ax.set_title(f"flow field (t={t})")
        return self._save(fig, name)

    def plot_attention_weights(
        self, weights: np.ndarray, name: str = "attention",
        x_labels: Optional[Sequence[str]] = None,
        y_labels: Optional[Sequence[str]] = None,
    ) -> str:
        """Attention heatmap (visualization.py:62-74)."""
        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.imshow(np.asarray(weights), aspect="auto", cmap="magma")
        fig.colorbar(im, ax=ax)
        if x_labels is not None:
            ax.set_xticks(range(len(x_labels)), x_labels, rotation=90, fontsize=6)
        if y_labels is not None:
            ax.set_yticks(range(len(y_labels)), y_labels, fontsize=6)
        return self._save(fig, name)

    def plot_training_progress(
        self, history: Dict[str, Sequence[float]], name: str = "training",
    ) -> str:
        """Train/val metric curves (visualization.py:76-90)."""
        fig, ax = plt.subplots(figsize=(6.5, 4))
        for key, values in history.items():
            if len(values):
                ax.plot(values, label=key)
        ax.set_xlabel("epoch")
        ax.legend()
        ax.grid(alpha=0.3)
        return self._save(fig, name)

    def plot_similarity_matrix(
        self, sim: np.ndarray, name: str = "similarity",
    ) -> str:
        """Cosine-similarity heatmap (the eval-time matrices of
        run1/full.py:142-160)."""
        fig, ax = plt.subplots(figsize=(5.5, 5))
        im = ax.imshow(np.asarray(sim), cmap="coolwarm", vmin=-1, vmax=1)
        fig.colorbar(im, ax=ax)
        ax.set_title("cosine similarity")
        return self._save(fig, name)

    def plot_trajectory(
        self, trajectory: np.ndarray, name: str = "trajectory",
    ) -> str:
        """Latent trajectory + feature-evolution panels (the
        visualize_trajectory intent of tong/tests/integration/test_generation.py)."""
        traj = np.asarray(trajectory)
        if traj.ndim == 3:  # (steps, batch, dim) -> first element
            traj = traj[:, 0]
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].plot(traj[:, 0], traj[:, 1], ".-")
        axes[0].set_title("Latent Space Trajectory")
        im = axes[1].imshow(traj.T, aspect="auto", cmap="viridis")
        axes[1].set_title("Feature Evolution")
        fig.colorbar(im, ax=axes[1])
        return self._save(fig, name)
