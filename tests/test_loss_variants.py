"""SupCon / FlatNCE / SigLIP loss variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.ops.infonce import clip_loss
from clip_dplm_tpu.ops.loss_variants import (
    flatnce_loss,
    siglip_loss,
    supcon_loss,
    supcon_pair_loss,
)


def _pair(rng, B=16, D=8):
    return (
        jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
    )


def test_supcon_lower_for_clustered(rng):
    labels = jnp.asarray(np.repeat(np.arange(4), 8))
    centers = rng.normal(size=(4, 8)).astype(np.float32) * 4
    clustered = jnp.asarray(centers[np.asarray(labels)] + 0.1 * rng.normal(size=(32, 8)).astype(np.float32))
    random = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    assert float(supcon_loss(clustered, labels)) < float(supcon_loss(random, labels))


def test_supcon_pair_runs_and_differentiable(rng):
    a, b = _pair(rng)
    labels = jnp.asarray(rng.integers(0, 4, 16))
    ls = jnp.asarray(np.float32(2.0))
    loss, _ = supcon_pair_loss(a, b, labels, ls)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda a: supcon_pair_loss(a, b, labels, ls)[0])(a)
    assert np.isfinite(np.asarray(g)).all()


def test_flatnce_value_one_gradient_matches_direction(rng):
    """Value is ~1 by construction; its gradient is parallel to InfoNCE's
    (rescaled), so a gradient step must decrease the InfoNCE monitor."""
    a, b = _pair(rng, B=32, D=16)
    ls = jnp.asarray(np.float32(2.0))
    loss, m = flatnce_loss(a, b, ls)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-5)

    g_flat = jax.grad(lambda a: flatnce_loss(a, b, ls)[0])(a)
    g_info = jax.grad(lambda a: clip_loss(a, b, ls)[0])(a)
    # cosine similarity of the two gradient directions is positive and high
    cf = np.asarray(g_flat).ravel()
    ci = np.asarray(g_info).ravel()
    cos = cf @ ci / (np.linalg.norm(cf) * np.linalg.norm(ci))
    assert cos > 0.5, cos


def test_siglip_perfect_alignment_low_loss(rng):
    a = jnp.asarray(np.eye(8, 16).astype(np.float32))
    ls = jnp.asarray(np.float32(2.0))
    aligned, m1 = siglip_loss(a, a, ls, logit_bias=jnp.asarray(np.float32(-5.0)))
    b = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    random, m2 = siglip_loss(a, b, ls, logit_bias=jnp.asarray(np.float32(-5.0)))
    assert float(aligned) < float(random)
    assert float(m1["accuracy"]) == 1.0


@pytest.mark.slow
def test_loss_kind_selector_in_trainer(rng):
    """contrastive.loss_kind routes the train step to each variant."""
    import jax

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models import TwoTowerCLIP
    from clip_dplm_tpu.train import create_train_state, make_train_step

    base = [
        "tower_a.input_dim=16", "tower_a.hidden_size=32",
        "tower_b.input_dim=16", "tower_b.hidden_size=32", "projection.dim=16",
        "train.optim.total_steps=50",
    ]
    batch = {
        "a": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
    }
    for kind in ("infonce", "flatnce", "siglip"):
        cfg = apply_overrides(Config(), base + [f"contrastive.loss_kind={kind}"])
        model = TwoTowerCLIP(cfg=cfg)
        state = create_train_state(model, cfg, batch)
        state, m = jax.jit(make_train_step(cfg))(state, batch)
        assert np.isfinite(float(m["loss"])), kind
    # supcon needs labels
    cfg = apply_overrides(Config(), base + ["contrastive.loss_kind=supcon"])
    model = TwoTowerCLIP(cfg=cfg)
    lbatch = dict(batch, labels=jnp.asarray(rng.integers(0, 3, 8)))
    state = create_train_state(model, cfg, lbatch)
    state, m = jax.jit(make_train_step(cfg))(state, lbatch)
    assert np.isfinite(float(m["loss"]))
