"""Probe classifiers over concatenated CLIP embeddings + the ablation harness.

Capability match for old/classifier.py:5-54 (MLP / Transformer / Linear /
SimpleNonLinear heads over cat([rna_embeds, protein_embeds])) and
old/ablation.py:9-83 (train each CLIP variant, train each probe on the frozen
embeddings, report the accuracy grid).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class LinearProbe(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        return nn.Dense(self.num_classes)(x)


class SimpleNonLinearProbe(nn.Module):
    num_classes: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.num_classes)(h)


class MLPProbe(nn.Module):
    num_classes: int
    hidden: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for dim in (self.hidden, self.hidden // 2):
            x = nn.Dense(dim)(x)
            x = nn.LayerNorm()(x)
            x = nn.gelu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes)(x)


class TransformerProbe(nn.Module):
    """Chunk the concatenated embedding into tokens, self-attend, pool."""

    num_classes: int
    d_model: int = 128
    num_tokens: int = 8
    num_layers: int = 2
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from clip_dplm_tpu.models.layers import TransformerBlock

        B = x.shape[0]
        h = nn.Dense(self.num_tokens * self.d_model)(x)
        h = h.reshape(B, self.num_tokens, self.d_model)
        for i in range(self.num_layers):
            h = TransformerBlock(
                d_model=self.d_model, num_heads=self.num_heads,
                dtype=jnp.float32, name=f"block_{i}",
            )(h, deterministic=deterministic)
        return nn.Dense(self.num_classes)(h.mean(axis=1))


PROBES: Dict[str, Any] = {
    "linear": LinearProbe,
    "simple_nonlinear": SimpleNonLinearProbe,
    "mlp": MLPProbe,
    "transformer": TransformerProbe,
}


def train_probe(
    probe: nn.Module,
    features: np.ndarray,
    labels: np.ndarray,
    num_steps: int = 200,
    lr: float = 1e-3,
    batch_size: int = 64,
    seed: int = 0,
):
    """Fit a probe on frozen features (old/ablation.py train_classifier)."""
    x = jnp.asarray(features)
    y = jnp.asarray(labels)
    params = probe.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed)},
        x[:2],
    )["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, opt, xb, yb, key):
        def lf(p):
            logits = probe.apply(
                {"params": p}, xb, deterministic=False, rngs={"dropout": key}
            )
            return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

        l, g = jax.value_and_grad(lf)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, l

    n = x.shape[0]
    key = jax.random.PRNGKey(seed)
    for i in range(num_steps):
        sel = rng.integers(0, n, min(batch_size, n))
        key, sub = jax.random.split(key)
        params, opt, _ = step(params, opt, x[sel], y[sel], sub)
    return params


def evaluate_probe(probe: nn.Module, params, features: np.ndarray,
                   labels: np.ndarray) -> float:
    logits = probe.apply({"params": params}, jnp.asarray(features),
                         deterministic=True)
    return float((jnp.argmax(logits, -1) == jnp.asarray(labels)).mean())


def ablation_study(
    embedding_fns: Dict[str, Callable[[], Dict[str, np.ndarray]]],
    num_classes: int,
    probe_names: Sequence[str] = ("linear", "simple_nonlinear", "mlp", "transformer"),
    num_steps: int = 200,
) -> Dict[str, Dict[str, float]]:
    """For each CLIP variant (an embedding_fn returning
    {train_x, train_y, test_x, test_y} over frozen concatenated embeddings),
    train every probe and report the accuracy grid (old/ablation.py:51-83)."""
    results: Dict[str, Dict[str, float]] = {}
    for variant, fn in embedding_fns.items():
        data = fn()
        row = {}
        for name in probe_names:
            probe = PROBES[name](num_classes=num_classes)
            params = train_probe(
                probe, data["train_x"], data["train_y"], num_steps=num_steps
            )
            row[name] = evaluate_probe(probe, params, data["test_x"], data["test_y"])
        results[variant] = row
    return results
