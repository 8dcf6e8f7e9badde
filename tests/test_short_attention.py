"""Fused short-S multi-head attention (ops/short_attention.py) == reference
(values + gradients), incl. padding masks and non-aligned shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from clip_dplm_tpu.ops.short_attention import (
    fused_short_attention,
    short_attention_reference,
)


def _inputs(rng, B=4, S=128, D=128, masked=True):
    q = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    if masked:
        lens = rng.integers(S // 2, S + 1, B)
        mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])
    else:
        mask = None
    return q, k, v, mask


@pytest.mark.parametrize("heads", [2, 4])
@pytest.mark.parametrize("layout", ["bhsd", "bsd"])
def test_forward_matches_reference(rng, heads, layout):
    q, k, v, mask = _inputs(rng)
    want = short_attention_reference(q, k, v, heads, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = fused_short_attention(q, k, v, heads, mask=mask, block_b=2,
                                    layout=layout, interpret=True)
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(want) * valid,
        atol=1e-5, rtol=1e-4,
    )


@pytest.mark.parametrize("layout", ["bhsd", "bsd"])
def test_tiny_s_forward_and_grads_match_reference(rng, layout):
    """S=10 (the tf_clip perturbation tower's top-DEG tokens): pads to the
    16-row sublane tile (_seq_pad) instead of 128, with G scaled up."""
    q, k, v, mask = _inputs(rng, B=24, S=10, D=64)
    heads = 4
    want = short_attention_reference(q, k, v, heads, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = fused_short_attention(q, k, v, heads, mask=mask, block_b=8,
                                    layout=layout, interpret=True)
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(want) * valid,
        atol=1e-5, rtol=1e-4)

    w = jnp.asarray(rng.normal(size=got.shape).astype(np.float32))
    w = w * valid

    def loss_ref(q, k, v):
        return jnp.sum(short_attention_reference(q, k, v, heads, mask=mask) * w)

    def loss_fused(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_short_attention(
                q, k, v, heads, mask=mask, block_b=8, layout=layout,
                save_probs=False, interpret=True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-5, rtol=1e-3)


def test_tiny_s_packed_proj_matches_reference(rng):
    """Packed qkv+proj path at S=10 — the TransformerBlock route the tf_clip
    pert tower takes once the dispatch gate admits tiny S."""
    from clip_dplm_tpu.ops.short_attention import (
        fused_short_attention_qkv_proj,
    )

    B, S, D, heads = 16, 10, 64, 4
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    wo = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) / 8.0
    bo = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    want = short_attention_reference(q, k, v, heads) @ wo + bo
    with pltpu.force_tpu_interpret_mode():
        got = fused_short_attention_qkv_proj(qkv, wo, bo, heads, block_b=8,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-3)


def test_tiny_s33_block_geometry_and_parity(rng):
    """S=33 -> sp=48: R must land on lcm(48,128)=384 so the (1,R) bias
    block's lane dim stays a 128-multiple (the graft entry() geometry that
    exposed the R=144 Mosaic lowering rejection, r5)."""
    from clip_dplm_tpu.ops.short_attention import fused_tiny_attention_proj

    B, S, D, heads = 16, 33, 64, 4
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    wo = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) / 8.0
    bo = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    lens = rng.integers(5, S + 1, B)
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    want = short_attention_reference(q, k, v, heads, mask=mask) @ wo + bo
    with pltpu.force_tpu_interpret_mode():
        got = fused_tiny_attention_proj(qkv, wo, bo, heads, mask=mask,
                                        interpret=True)
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(np.asarray(got) * valid,
                               np.asarray(want) * valid,
                               atol=2e-5, rtol=1e-3)


@pytest.mark.parametrize("masked", [True, False])
def test_tiny_packed_diag_matches_reference(rng, masked):
    """fused_tiny_attention_proj (packed-diagonal, P samples per score dot):
    values + gradients vs reference at the tf_clip pert-tower shape class
    (S=10), including padded samples (B not a multiple of P)."""
    from clip_dplm_tpu.ops.short_attention import fused_tiny_attention_proj

    B, S, D, heads = 19, 10, 64, 4  # B=19: exercises sample padding
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    wo = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) / 8.0
    bo = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    if masked:
        lens = rng.integers(3, S + 1, B)
        mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])
    else:
        mask = None

    def ref(qkv, wo, bo):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return short_attention_reference(q, k, v, heads, mask=mask) @ wo + bo

    def fused(qkv, wo, bo):
        with pltpu.force_tpu_interpret_mode():
            return fused_tiny_attention_proj(qkv, wo, bo, heads, mask=mask,
                                             interpret=True)

    want = ref(qkv, wo, bo)
    got = fused(qkv, wo, bo)
    valid = (np.ones((B, S, 1)) if mask is None
             else np.asarray(mask)[:, :, None])
    np.testing.assert_allclose(np.asarray(got) * valid,
                               np.asarray(want) * valid,
                               atol=2e-5, rtol=1e-3)

    w = jnp.asarray(rng.normal(size=want.shape).astype(np.float32)) * valid
    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) * w), argnums=(0, 1, 2))(
        qkv, wo, bo)
    g_fus = jax.grad(lambda *a: jnp.sum(fused(*a) * w), argnums=(0, 1, 2))(
        qkv, wo, bo)
    for gr, gf, name in zip(g_ref, g_fus, ("dqkv", "dwo", "dbo")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-5, rtol=2e-3, err_msg=name)


def test_forward_no_mask(rng):
    q, k, v, _ = _inputs(rng, masked=False)
    want = short_attention_reference(q, k, v, 4)
    with pltpu.force_tpu_interpret_mode():
        got = fused_short_attention(q, k, v, 4, block_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("layout", ["bhsd", "bsd"])
def test_gradients_match_reference(rng, layout):
    q, k, v, mask = _inputs(rng, B=2, S=64, D=64)
    heads = 2

    # padded positions are zeroed downstream in the towers; restrict the
    # cotangent to valid rows so both formulations see the same objective
    w = mask[:, :, None].astype(jnp.float32)

    def ref(q, k, v):
        return jnp.sum(jnp.sin(
            short_attention_reference(q, k, v, heads, mask=mask) * w))

    def fused(q, k, v):
        return jnp.sum(jnp.sin(fused_short_attention(
            q, k, v, heads, mask=mask, block_b=2, layout=layout,
            save_probs=False, interpret=True) * w))

    g_ref = jax.jit(jax.grad(ref, argnums=(0, 1, 2)))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(fused, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ref, g_fused, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-5, rtol=1e-3,
            err_msg=f"{name} mismatch",
        )

    # save_probs=True: the backward reads bf16 probabilities instead of
    # recomputing the softmax — gradients match to bf16 rounding
    def fused_p(q, k, v):
        return jnp.sum(jnp.sin(fused_short_attention(
            q, k, v, heads, mask=mask, block_b=2, layout=layout,
            save_probs=True, interpret=True) * w))

    with pltpu.force_tpu_interpret_mode():
        g_probs = jax.grad(fused_p, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ref, g_probs, ["dq", "dk", "dv"]):
        gr, gf = np.asarray(gr), np.asarray(gf)
        denom = max(float(np.linalg.norm(gr)), 1e-12)
        rel = float(np.linalg.norm(gf - gr)) / denom
        assert rel < 2e-2, f"{name} rel L2 err {rel:.2e} with saved probs"


def test_packed_qkv_matches_reference(rng):
    """fused_short_attention_qkv on unsplit (B, S, 3D) == split + reference
    (values + gradients through the packed dqkv)."""
    from clip_dplm_tpu.ops.short_attention import fused_short_attention_qkv

    q, k, v, mask = _inputs(rng, B=2, S=64, D=64)
    heads = 2
    qkv = jnp.concatenate([q, k, v], axis=-1)
    w = mask[:, :, None].astype(jnp.float32)

    def ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return jnp.sum(jnp.sin(
            short_attention_reference(q, k, v, heads, mask=mask) * w))

    def fused(qkv):
        return jnp.sum(jnp.sin(fused_short_attention_qkv(
            qkv, heads, mask=mask, block_b=2, save_probs=False,
            interpret=True) * w))

    l_ref, g_ref = jax.value_and_grad(ref)(qkv)
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(fused)(qkv)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_ref), atol=2e-5, rtol=1e-3)

    # saved-probs packed backward: rel-L2 gate
    def fused_p(qkv):
        return jnp.sum(jnp.sin(fused_short_attention_qkv(
            qkv, heads, mask=mask, block_b=2, save_probs=True,
            interpret=True) * w))

    with pltpu.force_tpu_interpret_mode():
        _, g_p = jax.value_and_grad(fused_p)(qkv)
    gr, gf = np.asarray(g_ref), np.asarray(g_p)
    rel = float(np.linalg.norm(gf - gr)) / max(float(np.linalg.norm(gr)), 1e-12)
    assert rel < 2e-2, f"packed saved-probs rel L2 err {rel:.2e}"


def test_packed_qkv_proj_matches_reference(rng):
    """fused_short_attention_qkv_proj == attention + out-projection
    (values + gradients incl. dWo/dbo)."""
    from clip_dplm_tpu.ops.short_attention import fused_short_attention_qkv_proj

    q, k, v, mask = _inputs(rng, B=2, S=64, D=64)
    heads = 2
    qkv = jnp.concatenate([q, k, v], axis=-1)
    wo = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32) * 0.1)
    bo = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    w = mask[:, :, None].astype(jnp.float32)

    def ref(qkv, wo, bo):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = short_attention_reference(q, k, v, heads, mask=mask)
        return jnp.sum(jnp.sin((o @ wo + bo) * w))

    def fused(qkv, wo, bo):
        return jnp.sum(jnp.sin(fused_short_attention_qkv_proj(
            qkv, wo, bo, heads, mask=mask, block_b=2, save_probs=False,
            interpret=True) * w))

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref, argnums=(0, 1, 2)))(qkv, wo, bo)
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(fused, argnums=(0, 1, 2))(qkv, wo, bo)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for gr, gf, name in zip(g_ref, g_f, ["dqkv", "dwo", "dbo"]):
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(gr, np.float32),
            atol=5e-5, rtol=2e-3, err_msg=name)

    # saved-probs variant: rel-L2 gate
    def fused_p(qkv, wo, bo):
        return jnp.sum(jnp.sin(fused_short_attention_qkv_proj(
            qkv, wo, bo, heads, mask=mask, block_b=2, save_probs=True,
            interpret=True) * w))

    with pltpu.force_tpu_interpret_mode():
        _, g_p = jax.value_and_grad(fused_p, argnums=(0, 1, 2))(qkv, wo, bo)
    for gr, gf, name in zip(g_ref, g_p, ["dqkv", "dwo", "dbo"]):
        gr, gf = np.asarray(gr, np.float32), np.asarray(gf, np.float32)
        rel = float(np.linalg.norm(gf - gr)) / max(float(np.linalg.norm(gr)), 1e-12)
        assert rel < 2e-2, f"{name} rel L2 err {rel:.2e} with saved probs"


def test_packed_qkv_proj_rope_matches_xla_rotary(rng):
    """In-kernel RoPE (rope_positions) == rotate q/k with rotary_embed_bsd
    then attend — values and gradients w.r.t. the UNROTATED qkv (the
    backward kernel applies the transpose rotation to dq/dk)."""
    from clip_dplm_tpu.models.esm import rotary_embed_bsd
    from clip_dplm_tpu.ops.short_attention import (
        fused_short_attention_qkv_proj,
    )

    q, k, v, mask = _inputs(rng, B=2, S=64, D=64)
    heads = 2  # Dh = 32 (even — rope requirement)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    pos = jnp.arange(64)
    wo = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32) * 0.1)
    bo = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    w = mask[:, :, None].astype(jnp.float32)

    def ref(qkv, wo, bo):
        qr = rotary_embed_bsd(qkv[..., :64], pos, heads)
        kr = rotary_embed_bsd(qkv[..., 64:128], pos, heads)
        o = short_attention_reference(qr, kr, qkv[..., 128:], heads,
                                      mask=mask)
        return jnp.sum(jnp.sin((o @ wo + bo) * w))

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref, argnums=(0, 1, 2)))(qkv, wo, bo)

    # primal (inference) path with rope: emit_o=False — o lives in a VMEM
    # scratch, probs never exists; this path only runs OUTSIDE of grad
    qr = rotary_embed_bsd(qkv[..., :64], pos, heads)
    kr = rotary_embed_bsd(qkv[..., 64:128], pos, heads)
    o_ref = short_attention_reference(qr, kr, qkv[..., 128:], heads,
                                      mask=mask)
    with pltpu.force_tpu_interpret_mode():
        y_primal = fused_short_attention_qkv_proj(
            qkv, wo, bo, heads, mask=mask, block_b=2, rope_positions=pos,
            interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_primal), np.asarray(o_ref @ wo + bo),
        atol=2e-3, rtol=2e-3)

    for save_probs in (False, True):
        def fused(qkv, wo, bo):
            return jnp.sum(jnp.sin(fused_short_attention_qkv_proj(
                qkv, wo, bo, heads, mask=mask, block_b=2,
                save_probs=save_probs, rope_positions=pos,
                interpret=True) * w))

        with pltpu.force_tpu_interpret_mode():
            l_f, g_f = jax.value_and_grad(
                fused, argnums=(0, 1, 2))(qkv, wo, bo)
        np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
        for gr, gf, name in zip(g_ref, g_f, ["dqkv", "dwo", "dbo"]):
            gr = np.asarray(gr, np.float32)
            gf = np.asarray(gf, np.float32)
            if save_probs:  # bf16 saved-probs error budget: rel-L2 gate
                rel = (float(np.linalg.norm(gf - gr))
                       / max(float(np.linalg.norm(gr)), 1e-12))
                assert rel < 2e-2, f"{name} rel {rel:.2e} (saved probs)"
            else:
                np.testing.assert_allclose(gf, gr, atol=5e-5, rtol=2e-3,
                                           err_msg=name)

    # the packed NON-proj variant with rope (fused_short_attention_qkv):
    # values + grads through the packed dqkv
    from clip_dplm_tpu.ops.short_attention import fused_short_attention_qkv

    def ref_noproj(qkv):
        qr = rotary_embed_bsd(qkv[..., :64], pos, heads)
        kr = rotary_embed_bsd(qkv[..., 64:128], pos, heads)
        o = short_attention_reference(qr, kr, qkv[..., 128:], heads,
                                      mask=mask)
        return jnp.sum(jnp.sin(o * w))

    def fused_noproj(qkv):
        return jnp.sum(jnp.sin(fused_short_attention_qkv(
            qkv, heads, mask=mask, block_b=2, save_probs=False,
            rope_positions=pos, interpret=True) * w))

    l_r2, g_r2 = jax.value_and_grad(ref_noproj)(qkv)
    with pltpu.force_tpu_interpret_mode():
        l_f2, g_f2 = jax.value_and_grad(fused_noproj)(qkv)
    np.testing.assert_allclose(float(l_f2), float(l_r2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f2), np.asarray(g_r2),
                               atol=5e-5, rtol=2e-3)


def test_unaligned_shapes_padded(rng):
    """S and B not multiples of the block sizes: wrapper pads, results match
    on the real rows."""
    q, k, v, mask = _inputs(rng, B=3, S=100, D=64)
    want = short_attention_reference(q, k, v, 2, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = fused_short_attention(q, k, v, 2, mask=mask, block_b=2,
                                    interpret=True)
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(want) * valid,
        atol=1e-5, rtol=1e-4,
    )


def test_heads_entry_matches_reference(rng):
    """fused_short_attention_heads on (B, H, S, Dh) == reference."""
    from clip_dplm_tpu.ops.attention import _merge_heads, _split_heads
    from clip_dplm_tpu.ops.short_attention import fused_short_attention_heads

    q, k, v, mask = _inputs(rng, B=3, S=100, D=64)
    heads = 2
    want = short_attention_reference(q, k, v, heads, mask=mask)
    qh, kh, vh = (_split_heads(t, heads) for t in (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        oh = fused_short_attention_heads(qh, kh, vh, mask=mask, block_b=2,
                                         interpret=True)
    got = _merge_heads(oh)
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(want) * valid,
        atol=1e-5, rtol=1e-4,
    )


def test_rejects_bad_shapes(rng):
    q, k, v, _ = _inputs(rng, B=2, S=32, D=64, masked=False)
    with pytest.raises(ValueError):
        fused_short_attention(q, k[:, :16], v, 2, interpret=True)
    with pytest.raises(ValueError):
        fused_short_attention(q, k, v, 3, interpret=True)


def test_bf16_close_to_f32(rng):
    q, k, v, mask = _inputs(rng)
    want = short_attention_reference(q, k, v, 4, mask=mask)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        got = fused_short_attention(qb, kb, vb, 4, mask=mask, block_b=2,
                                    interpret=True)
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(got, np.float32) * valid, np.asarray(want) * valid,
        atol=0.05, rtol=0.05,
    )


def test_dispatch_routes_short_heads(rng, monkeypatch):
    """attention_dispatch must route rotary-tower shapes (S below the flash
    crossover, head-level layout) to the fused short-S kernel when the
    caller leaves use_flash unset — regression for the dead `use_flash is
    None` check that silently fell back to the XLA reference."""
    from clip_dplm_tpu.ops import attention, short_attention

    q, k, v, mask = _inputs(rng, B=2, S=100, D=64)
    heads = 2
    qh, kh, vh = (attention._split_heads(t, heads) for t in (q, k, v))

    calls = []

    def spy(qh, kh, vh, mask=None, scale=None, block_b=8):
        calls.append(qh.shape)
        return attention.attention_reference(qh, kh, vh, mask=mask,
                                             scale=scale)

    monkeypatch.setattr(attention, "_on_tpu", lambda: True)
    monkeypatch.setattr(short_attention, "fused_short_attention_heads", spy)
    out = attention.attention_dispatch(qh, kh, vh, mask=mask)
    assert calls == [qh.shape]
    want = attention.attention_reference(qh, kh, vh, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want))

    # an explicit use_flash=False must NOT reroute (caller opted out of
    # kernel dispatch entirely)
    calls.clear()
    attention.attention_dispatch(qh, kh, vh, mask=mask, use_flash=False)
    assert calls == []


def test_cls_attention_matches_reference(rng):
    """fused_cls_attention == multihead_attention(...)[:, :1]: values and
    the full dqkv gradient, masked and unmasked (the TransformerBlock
    out_rows==1 path)."""
    from clip_dplm_tpu.ops.attention import cls_query_attention
    from clip_dplm_tpu.ops.short_attention import fused_cls_attention

    B, S, D, heads = 4, 128, 64, 4
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    lens = rng.integers(S // 2, S + 1, B)
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])
    ct = jnp.asarray(rng.normal(size=(B, 1, D)).astype(np.float32))

    for m in (None, mask):
        want = jax.jit(lambda x: cls_query_attention(
            x, heads, mask=m))(qkv)  # XLA formulation
        with pltpu.force_tpu_interpret_mode():
            got = fused_cls_attention(qkv, heads, mask=m, block_b=2,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-4)

        g_ref = jax.jit(jax.grad(lambda x: jnp.sum(
            cls_query_attention(x, heads, mask=m) * ct)))(qkv)
        with pltpu.force_tpu_interpret_mode():
            g_got = jax.grad(lambda x: jnp.sum(fused_cls_attention(
                x, heads, mask=m, block_b=2, interpret=True) * ct))(qkv)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)


def test_cls_attention_unaligned_batch(rng):
    """B not divisible by block_b pads and slices correctly."""
    from clip_dplm_tpu.ops.attention import cls_query_attention
    from clip_dplm_tpu.ops.short_attention import fused_cls_attention

    B, S, D, heads = 3, 64, 32, 2
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32))
    want = cls_query_attention(qkv, heads)
    with pltpu.force_tpu_interpret_mode():
        got = fused_cls_attention(qkv, heads, block_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_single_row_batch_clamps_block(rng):
    """B=1 callers (e.g. single-sequence scoring through attention_dispatch)
    clamp rows-per-program to the batch instead of padding to block_b and
    computing 8x dead work; values still match the reference."""
    from clip_dplm_tpu.ops.attention import _merge_heads, _split_heads
    from clip_dplm_tpu.ops.short_attention import (
        fused_short_attention,
        fused_short_attention_heads,
    )

    q, k, v, mask = _inputs(rng, B=1, S=96, D=64)
    heads = 2
    want = short_attention_reference(q, k, v, heads, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = fused_short_attention(q, k, v, heads, mask=mask, block_b=8,
                                    layout="bsd", interpret=True)
        qh, kh, vh = (_split_heads(t, heads) for t in (q, k, v))
        got_h = _merge_heads(fused_short_attention_heads(
            qh, kh, vh, mask=mask, block_b=8, interpret=True))
    valid = np.asarray(mask)[:, :, None]
    for g in (got, got_h):
        np.testing.assert_allclose(
            np.asarray(g) * valid, np.asarray(want) * valid,
            atol=1e-5, rtol=1e-4,
        )
