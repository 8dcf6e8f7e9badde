"""Ring flash attention == full-sequence attention (fwd + full gradients),
sequence sharded over the mesh; XLA ring core on CPU, plus a tiny
interpret-mode check of the Pallas ring VJP on a 2-device submesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from clip_dplm_tpu.ops.attention import attention_reference
from clip_dplm_tpu.ops.ring_attention import ring_flash_attention


def _qkv(rng, B=2, H=2, S=256, Dh=32):
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, S, Dh)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("masked", [False, True])
def test_ring_matches_reference_fwd(mesh8, rng, masked):
    B, H, S, Dh = 2, 2, 256, 32
    q, k, v = _qkv(rng, B, H, S, Dh)
    mask = None
    if masked:
        lens = np.array([200, 136])
        mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

    want = attention_reference(q, k, v, mask=mask)

    def inner(q_l, k_l, v_l, m_l):
        return ring_flash_attention(q_l, k_l, v_l, "data", mask=m_l)

    m_in = mask if mask is not None else jnp.ones((B, S), bool)
    got = jax.shard_map(
        inner, mesh=mesh8.mesh,
        in_specs=(P(None, None, "data"), P(None, None, "data"),
                  P(None, None, "data"), P(None, "data")),
        out_specs=P(None, None, "data"), check_vma=False,
    )(q, k, v, m_in)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_ring_matches_reference_grads(mesh8, rng):
    B, H, S, Dh = 1, 2, 128, 16
    q, k, v = _qkv(rng, B, H, S, Dh)

    def ref_loss(q, k, v):
        o = attention_reference(q, k, v)
        return jnp.sum(o * o)

    def ring_loss(q, k, v):
        def inner(q_l, k_l, v_l):
            o = ring_flash_attention(q_l, k_l, v_l, "data")
            return jax.lax.psum(jnp.sum(o * o), "data")
        return jax.shard_map(
            inner, mesh=mesh8.mesh,
            in_specs=(P(None, None, "data"),) * 3,
            out_specs=P(), check_vma=False,
        )(q, k, v)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    for gr, gg, name in zip(g_ref, g_ring, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gr), atol=5e-5, rtol=1e-3,
            err_msg=f"{name} ring mismatch",
        )


@pytest.mark.slow
def test_pallas_ring_vjp_tiny_interpret(rng):
    """The Pallas ring core's custom VJP (dK/dV travelling with their shard)
    against the XLA ring, on a 2-device submesh at interpret-friendly sizes."""
    devs = jax.devices()[:2]
    mesh = Mesh(np.array(devs), ("seq",))
    B, H, S, Dh = 1, 1, 256, 16
    q, k, v = _qkv(rng, B, H, S, Dh)

    def loss(q, k, v, use_flash):
        def inner(q_l, k_l, v_l):
            o = ring_flash_attention(
                q_l, k_l, v_l, "seq", use_flash=use_flash,
                block_q=128, block_k=128)
            return jax.lax.psum(jnp.sum(o * o), "seq")
        return jax.shard_map(
            inner, mesh=mesh, in_specs=(P(None, None, "seq"),) * 3,
            out_specs=P(), check_vma=False,
        )(q, k, v)

    g_xla = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, False)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, True)
    for gx, gp, name in zip(g_xla, g_pl, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=5e-5, rtol=1e-3,
            err_msg=f"{name} pallas-ring vs xla-ring mismatch",
        )


@pytest.mark.slow
def test_esm_tower_sequence_parallel_matches_single(mesh8, rng):
    """ESMTower(seq_axis=...) under shard_map over the sequence == the plain
    single-device tower: ring attention, global rotary positions, psum'd
    token-dropout stats and mean pooling."""
    from clip_dplm_tpu.config import ESMConfig
    from clip_dplm_tpu.data import protein
    from clip_dplm_tpu.models.esm import ESMTower

    cfg = ESMConfig(name="tiny", vocab_size=33, d_model=64, num_layers=2,
                    num_heads=4, max_len=64, token_dropout=True)
    seqs = [protein.random_protein(rng, 40), protein.random_protein(rng, 25)]
    toks, mask = protein.tokenize_batch(seqs, pad_multiple=64)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)

    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    params = tower.init(jax.random.key(0), toks, mask)["params"]
    want = tower.apply({"params": params}, toks, mask, pooling="mean_residues")

    sp_tower = ESMTower(cfg=cfg, dtype=jnp.float32, seq_axis="data")

    def inner(toks_l, mask_l):
        return sp_tower.apply(
            {"params": params}, toks_l, mask_l, pooling="mean_residues")

    got = jax.shard_map(
        inner, mesh=mesh8.mesh,
        in_specs=(P(None, "data"), P(None, "data")),
        out_specs=P(), check_vma=False,
    )(toks, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
