"""SupCon / FlatNCE / SigLIP loss variants."""

import jax
import jax.numpy as jnp
import numpy as np

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
