"""Flash-attention kernel vs the XLA reference: forward, masking, gradients.
Runs in Pallas interpret mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from clip_dplm_tpu.ops.attention import attention_reference
from clip_dplm_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, B, H, S, D, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32), dtype)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32), dtype)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32), dtype)
    return q, k, v


@pytest.mark.parametrize("S,D", [(128, 128), (256, 128), (128, 64), (200, 64)])
def test_forward_matches_reference(rng, S, D):
    q, k, v = _rand_qkv(rng, 2, 2, S, D)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_forward_with_padding_mask(rng):
    B, H, S, D = 2, 2, 128, 64
    q, k, v = _rand_qkv(rng, B, H, S, D)
    lengths = np.array([100, 37])
    mask = jnp.asarray(np.arange(S)[None, :] < lengths[:, None])
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, mask=mask)
    ref = attention_reference(q, k, v, mask=mask)
    # only compare valid query rows (padded-query outputs are unused downstream)
    for b in range(B):
        L = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out[b, :, :L]), np.asarray(ref[b, :, :L]), atol=2e-5, rtol=2e-5
        )


@pytest.mark.slow
def test_gradients_match_reference(rng):
    B, H, S, D = 1, 2, 128, 64
    q, k, v = _rand_qkv(rng, B, H, S, D)
    mask = jnp.asarray(np.arange(S)[None, :] < 90)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask=mask)
        return jnp.sum(jnp.where(mask[:, None, :, None], out, 0.0) ** 2)

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, mask=mask)
        return jnp.sum(jnp.where(mask[:, None, :, None], out, 0.0) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=5e-4,
            err_msg=f"grad d{name} mismatch",
        )


def test_bf16_forward_close(rng):
    q, k, v = _rand_qkv(rng, 1, 2, 128, 64, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_multihead_dispatch_fallback(rng):
    """multihead_attention uses the reference path off-TPU and stays correct."""
    from clip_dplm_tpu.ops.attention import multihead_attention

    B, S, Dm, H = 2, 64, 128, 4
    x = jnp.asarray(rng.normal(size=(B, S, Dm)).astype(np.float32))
    mask = jnp.asarray(np.arange(S)[None, :] < np.array([50, 64])[:, None])
    out = multihead_attention(x, x, x, H, mask=mask)
    assert out.shape == (B, S, Dm)
    assert np.all(np.isfinite(np.asarray(out)))
