"""Gene embedding pipeline + ESM projection heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import ESMConfig
from clip_dplm_tpu.data.gene_embeddings import (
    EmbeddingCache,
    build_gene_embedding_dict,
    make_esm_embed_fn,
)
from clip_dplm_tpu.data.protein import random_protein
from clip_dplm_tpu.models.esm import ESMTower
from clip_dplm_tpu.models.esm_projections import GeneProjection, ProteinProjection


def test_build_dict_with_cache(tmp_path, rng):
    calls = []

    def embed_fn(seqs):
        calls.append(len(seqs))
        return np.stack([np.full(8, float(len(s))) for s in seqs])

    genes = {f"G{i}": random_protein(rng, 10 + i) for i in range(5)}
    genes["TOO_LONG"] = "L" * 20000  # skipped (>10k aa, tf nb cell 21)
    cache = EmbeddingCache(str(tmp_path / "cache.npz"))
    d1 = build_gene_embedding_dict(genes, embed_fn, batch_size=2, cache=cache)
    assert set(d1) == {f"G{i}" for i in range(5)}
    assert sum(calls) == 5

    # second run: all cache hits, embed_fn never called
    calls.clear()
    cache2 = EmbeddingCache(str(tmp_path / "cache.npz"))
    d2 = build_gene_embedding_dict(genes, embed_fn, batch_size=2, cache=cache2)
    assert sum(calls) == 0
    for g in d1:
        np.testing.assert_allclose(d1[g], d2[g])


@pytest.mark.slow
def test_esm_embed_fn(rng):
    cfg = ESMConfig(name="tiny", vocab_size=33, d_model=32, num_layers=1,
                    num_heads=2, max_len=64)
    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    toks = jnp.zeros((1, 8), jnp.int32)
    variables = tower.init(jax.random.PRNGKey(0), toks)
    embed = make_esm_embed_fn(tower, variables)
    genes = {"A": random_protein(rng, 12), "B": random_protein(rng, 20)}
    d = build_gene_embedding_dict(genes, embed, batch_size=8)
    assert d["A"].shape == (32,) and np.isfinite(d["A"]).all()


def test_projection_heads(rng):
    x = jnp.asarray(rng.normal(size=(6, 48)).astype(np.float32))
    for cls in (ProteinProjection, GeneProjection):
        head = cls(out_dim=16)
        params = head.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, deterministic=True,
        )
        out = head.apply(params, x, deterministic=True)
        assert out.shape == (6, 16)
        assert np.isfinite(np.asarray(out)).all()
