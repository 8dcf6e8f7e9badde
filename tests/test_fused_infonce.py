"""Fused InfoNCE kernel == pure-JAX reference (loss + gradients), single-device
and global-batch shard_map, incl. the hard-negative cache path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from clip_dplm_tpu.ops import infonce
from clip_dplm_tpu.ops.fused_infonce import fused_clip_loss, fused_row_ce


def _pair(rng, B=64, D=32):
    a = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    return a, b


def test_loss_matches_reference(rng):
    a, b = _pair(rng)
    ls = jnp.asarray(np.float32(2.6592))
    ref_loss, _ = infonce.clip_loss(a, b, ls)
    with pltpu.force_tpu_interpret_mode():
        loss, metrics = fused_clip_loss(a, b, ls)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics["logit_scale"]), float(np.exp(2.6592)), rtol=1e-5
    )


@pytest.mark.slow
def test_gradients_match_reference(rng):
    a, b = _pair(rng, B=48, D=24)
    ls = jnp.asarray(np.float32(2.0))

    def ref(a, b, ls):
        loss, _ = infonce.clip_loss(a, b, ls)
        return loss

    def fused(a, b, ls):
        loss, _ = fused_clip_loss(a, b, ls)
        return loss

    g_ref = jax.jit(jax.grad(ref, argnums=(0, 1, 2)))(a, b, ls)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(fused, argnums=(0, 1, 2))(a, b, ls)
    for gr, gf, name in zip(g_ref, g_fused, ["da", "db", "dls"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-5, rtol=1e-4,
            err_msg=f"{name} mismatch",
        )


@pytest.mark.parametrize("merged", ["0", "1"])
def test_gradients_match_reference_merged_modes(rng, monkeypatch, merged):
    """Single-pass merged backward == two-pass backward == XLA reference.
    CLIP_DPLM_LOSS_MERGED selects the backward formulation at trace time."""
    monkeypatch.setenv("CLIP_DPLM_LOSS_MERGED", merged)
    a, b = _pair(rng, B=48, D=24)
    ls = jnp.asarray(np.float32(2.0))

    def ref(a, b, ls):
        loss, _ = infonce.clip_loss(a, b, ls)
        return loss

    def fused(a, b, ls):
        loss, _ = fused_clip_loss(a, b, ls)
        return loss

    g_ref = jax.jit(jax.grad(ref, argnums=(0, 1, 2)))(a, b, ls)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(fused, argnums=(0, 1, 2))(a, b, ls)
    for gr, gf, name in zip(g_ref, g_fused, ["da", "db", "dls"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-5, rtol=1e-4,
            err_msg=f"{name} mismatch (merged={merged})",
        )


@pytest.mark.slow
def test_cache_matches_reference(rng):
    a, b = _pair(rng, B=32, D=16)
    cache = jnp.asarray(rng.normal(size=(48, 16)).astype(np.float32))
    cache = infonce.l2_normalize(cache)
    cache_len = jnp.int32(20)  # partially filled ring buffer
    ls = jnp.asarray(np.float32(2.0))

    ref_loss, _ = infonce.clip_loss(a, b, ls, cache=cache, cache_len=cache_len)
    with pltpu.force_tpu_interpret_mode():
        loss, _ = fused_clip_loss(a, b, ls, cache=cache, cache_len=cache_len)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_global_shard_map_matches_local(mesh8, rng):
    a, b = _pair(rng, B=64, D=32)
    ls = jnp.asarray(np.float32(2.0))
    ref_loss, _ = infonce.clip_loss(a, b, ls)

    def f(a_l, b_l):
        loss, _ = fused_clip_loss(a_l, b_l, ls, axis_name="data")
        return loss

    with pltpu.force_tpu_interpret_mode():
        loss = jax.shard_map(
            f, mesh=mesh8.mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_vma=False,  # pallas_call outputs carry no vma info yet
        )(a, b)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


@pytest.mark.slow
def test_global_shard_map_gradients(mesh8, rng):
    a, b = _pair(rng, B=64, D=32)
    ls = jnp.asarray(np.float32(1.5))

    def ref(a, b):
        loss, _ = infonce.clip_loss(a, b, ls)
        return loss

    def fused_global(a, b):
        def inner(a_l, b_l):
            loss, _ = fused_clip_loss(a_l, b_l, ls, axis_name="data")
            return loss

        return jax.shard_map(
            inner, mesh=mesh8.mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_vma=False,
        )(a, b)

    g_ref = jax.jit(jax.grad(ref, argnums=(0, 1)))(a, b)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(fused_global, argnums=(0, 1))(a, b)
    for gr, gf in zip(g_ref, g_f):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-5, rtol=1e-4)


def test_non_square_and_offset_labels(rng):
    """fused_row_ce with m != n and arbitrary labels (the sharded-row case)."""
    m, n, d = 16, 48, 8
    x = infonce.l2_normalize(jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)))
    y = infonce.l2_normalize(jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)))
    labels = jnp.asarray(rng.integers(0, n, size=m).astype(np.int32))
    scale = jnp.asarray(np.float32(10.0))

    logits = scale * (x @ y.T)
    ref = float(infonce._cross_entropy(logits, labels).mean())
    with pltpu.force_tpu_interpret_mode():
        got = float(fused_row_ce(x, y, scale, labels))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.slow
def test_label_smoothing_matches_reference(rng):
    """Fused smoothing adjustment == the XLA smoothed CE, loss and grads."""
    a, b = _pair(rng, B=48, D=24)
    ls = jnp.asarray(np.float32(2.0))
    s = 0.1

    def ref(a, b, ls):
        loss, _ = infonce.clip_loss(a, b, ls, label_smoothing=s)
        return loss

    def fused(a, b, ls):
        loss, _ = fused_clip_loss(a, b, ls, label_smoothing=s)
        return loss

    with pltpu.force_tpu_interpret_mode():
        np.testing.assert_allclose(
            float(fused(a, b, ls)), float(ref(a, b, ls)), rtol=1e-5
        )
        g_f = jax.grad(fused, argnums=(0, 1, 2))(a, b, ls)
    g_r = jax.jit(jax.grad(ref, argnums=(0, 1, 2)))(a, b, ls)
    for gr, gf, name in zip(g_r, g_f, ["da", "db", "dls"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-5, rtol=1e-4,
            err_msg=f"{name} mismatch",
        )


def test_label_smoothing_with_cache_matches_reference(rng):
    """Smoothing mass spreads over the VALID cache columns only, identically
    in the fused and XLA formulations."""
    a, b = _pair(rng, B=32, D=16)
    cache = infonce.l2_normalize(
        jnp.asarray(rng.normal(size=(48, 16)).astype(np.float32)))
    cache_len = jnp.int32(20)
    ls = jnp.asarray(np.float32(2.0))
    s = 0.1

    ref_loss, _ = infonce.clip_loss(
        a, b, ls, cache=cache, cache_len=cache_len, label_smoothing=s)
    with pltpu.force_tpu_interpret_mode():
        loss, _ = fused_clip_loss(
            a, b, ls, cache=cache, cache_len=cache_len, label_smoothing=s)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


@pytest.mark.slow
def test_ring_fused_matches_local(mesh8, rng):
    """Ring-scheduled global loss (column shards + stats on a ppermute ring,
    no gathered B_g x d buffer) == full-batch local loss, value and grads."""
    from clip_dplm_tpu.ops.fused_infonce import ring_fused_clip_loss

    a, b = _pair(rng, B=64, D=32)
    ls = jnp.asarray(np.float32(1.7))

    def ref(a, b, ls):
        loss, _ = infonce.clip_loss(a, b, ls)
        return loss

    def ring(a, b, ls):
        def inner(a_l, b_l, s):
            loss, _ = ring_fused_clip_loss(a_l, b_l, s, axis_name="data")
            return loss

        return jax.shard_map(
            inner, mesh=mesh8.mesh, in_specs=(P("data"), P("data"), P()),
            out_specs=P(), check_vma=False,
        )(a, b, ls)

    with pltpu.force_tpu_interpret_mode():
        got = float(ring(a, b, ls))
        g_ring = jax.grad(ring, argnums=(0, 1, 2))(a, b, ls)
    np.testing.assert_allclose(got, float(ref(a, b, ls)), rtol=1e-5)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(a, b, ls)
    for gr, gf, name in zip(g_ref, g_ring, ["da", "db", "dls"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-5, rtol=1e-4,
            err_msg=f"{name} mismatch",
        )


@pytest.mark.slow
def test_ring_fused_label_smoothing_matches_reference(mesh8, rng):
    from clip_dplm_tpu.ops.fused_infonce import ring_fused_clip_loss

    a, b = _pair(rng, B=32, D=16)
    ls = jnp.asarray(np.float32(2.0))
    ref_loss, _ = infonce.clip_loss(a, b, ls, label_smoothing=0.1)

    def inner(a_l, b_l):
        loss, _ = ring_fused_clip_loss(
            a_l, b_l, ls, axis_name="data", label_smoothing=0.1)
        return loss

    with pltpu.force_tpu_interpret_mode():
        got = jax.shard_map(
            inner, mesh=mesh8.mesh, in_specs=(P("data"), P("data")),
            out_specs=P(), check_vma=False,
        )(a, b)
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=1e-5)


@pytest.mark.slow
def test_materialized_raw_matches_recompute(rng):
    """The int16 materialized-raw backward (skips both recompute matmuls)
    must agree with the recompute backward to fixed-point precision
    (RAW_QSCALE abs error ~1.5e-5 on cosines -> ~1e-4 on gradients)."""
    from clip_dplm_tpu.ops.fused_infonce import fused_symmetric_infonce

    # non-multiple of the block sizes to exercise the padded raw tiles
    a, b = _pair(rng, B=136, D=48)  # 2 row-tiles incl. padding; was 200 (same coverage, less interpret work)
    a, b = infonce.l2_normalize(a), infonce.l2_normalize(b)
    scale = jnp.float32(np.exp(2.6592))

    def f(mat):
        def loss(a, b, s):
            return fused_symmetric_infonce(a, b, s, None, mat)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(a, b, scale)

    with pltpu.force_tpu_interpret_mode():
        (l0, g0) = f(False)
        (l1, g1) = f(True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for x0, x1, name in zip(g0, g1, ["da", "db", "dscale"]):
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(x0), atol=2e-4, rtol=1e-3,
            err_msg=f"{name} materialized mismatch",
        )


@pytest.mark.slow
def test_fused_multiway_matches_reference(rng):
    """fused_multiway_clip_loss == infonce.multiway_clip_loss (loss + grads)
    for the 3-way tf_clip shape (tf nb cell 41)."""
    from clip_dplm_tpu.ops.fused_infonce import fused_multiway_clip_loss

    B, D = 48, 24
    embs = {
        "cell": jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
        "pert": jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
        "protein": jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
    }
    ls = jnp.asarray(np.float32(2.0))

    def ref(c, p, pr, ls):
        loss, _ = infonce.multiway_clip_loss(
            {"cell": c, "pert": p, "protein": pr}, ls, label_smoothing=0.1)
        return loss

    def fused(c, p, pr, ls):
        loss, _ = fused_multiway_clip_loss(
            {"cell": c, "pert": p, "protein": pr}, ls, label_smoothing=0.1)
        return loss

    args = (embs["cell"], embs["pert"], embs["protein"], ls)
    l_ref, g_ref = jax.jit(jax.value_and_grad(ref, argnums=(0, 1, 2, 3)))(*args)
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for gr, gf, name in zip(g_ref, g_f, ["dcell", "dpert", "dprot", "dls"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-5, rtol=1e-4,
            err_msg=f"{name} mismatch",
        )

    # per-pair loss metrics match the XLA formulation too
    _, m_ref = infonce.multiway_clip_loss(embs, ls)
    with pltpu.force_tpu_interpret_mode():
        _, m_f = fused_multiway_clip_loss(embs, ls)
    for k in ("loss_cell_pert", "loss_cell_protein", "loss_pert_protein"):
        np.testing.assert_allclose(float(m_f[k]), float(m_ref[k]), rtol=1e-5)


@pytest.mark.slow
def test_fused_multiway_ring_matches_reference(mesh8, rng):
    """Sharded 3-way loss through the ring kernels == full-batch XLA."""
    from clip_dplm_tpu.ops.fused_infonce import fused_multiway_clip_loss

    B, D = 32, 16
    embs = {
        "cell": jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
        "pert": jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
        "protein": jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
    }
    ls = jnp.asarray(np.float32(2.0))
    ref_loss, _ = infonce.multiway_clip_loss(embs, ls)

    def inner(c, p, pr):
        loss, _ = fused_multiway_clip_loss(
            {"cell": c, "pert": p, "protein": pr}, ls, axis_name="data")
        return loss

    with pltpu.force_tpu_interpret_mode():
        got = jax.shard_map(
            inner, mesh=mesh8.mesh,
            in_specs=(P("data"), P("data"), P("data")), out_specs=P(),
            check_vma=False,
        )(embs["cell"], embs["pert"], embs["protein"])
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=1e-5)


def test_materialized_raw_at_max_scale(rng):
    """Int16 raw error enters the backward as err * effective_scale; the
    'auto' mode must stay within useful gradient parity even when the learned
    temperature has grown to the logit_scale_max clamp (scale = 100)."""
    from clip_dplm_tpu.ops.fused_infonce import fused_symmetric_infonce

    a, b = _pair(rng, B=136, D=48)  # 2 row-tiles incl. padding; was 200 (same coverage, less interpret work)
    a, b = infonce.l2_normalize(a), infonce.l2_normalize(b)
    scale = jnp.float32(100.0)  # at the clamp

    def f(mat):
        def loss(a, b, s):
            return fused_symmetric_infonce(a, b, s, None, mat)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(a, b, scale)

    with pltpu.force_tpu_interpret_mode():
        (l0, g0) = f(False)
        (l1, g1) = f(True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for x0, x1, name in zip(g0, g1, ["da", "db", "dscale"]):
        x0, x1 = np.asarray(x0), np.asarray(x1)
        # relative-to-gradient-norm bound: the softmax normalization cancels
        # most of the quantization error; require < 1% relative L2 error
        denom = max(float(np.linalg.norm(x0)), 1e-12)
        rel = float(np.linalg.norm(x1 - x0)) / denom
        assert rel < 1e-2, f"{name} rel L2 err {rel:.2e} at max scale"


@pytest.mark.parametrize("shape", [(48, 256, 16, 128), (40, 300, 16, 128)])
def test_merged_backward_multitile_matches_twopass(rng, monkeypatch, shape):
    """The merged single-pass backward on a MULTI-tile grid (nm>1, nn>1,
    incl. a padded-batch case) == the two-pass formulation on identical
    inputs. Covers the grid-persistent acc_b accumulator, the parked
    dy_index output map and the cross-row flush ordering, which the
    B=48 1x1-grid loss tests never exercise."""
    from clip_dplm_tpu.ops.fused_infonce import (
        RAW_QSCALE,
        _round_up,
        _sym_grad_passes_from_raw,
    )

    m, n, block_m, block_n = shape
    d = 32
    a = rng.normal(size=(m, d)).astype(np.float32)
    b = rng.normal(size=(n, d)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    scale = jnp.asarray(np.float32(7.0))

    mp, np_ = _round_up(m, block_m), _round_up(n, block_n)
    raw = a @ b.T
    raw_q = np.zeros((mp, np_), np.int16)
    raw_q[:m, :n] = np.round(raw * RAW_QSCALE).astype(np.int16)
    s = raw_q[:m, :n].astype(np.float32) * (7.0 / RAW_QSCALE)
    lse_row = jnp.asarray(
        np.log(np.exp(s - s.max(1, keepdims=True)).sum(1, keepdims=True))
        + s.max(1, keepdims=True))
    lse_col = jnp.asarray(
        (np.log(np.exp(s - s.max(0, keepdims=True)).sum(0, keepdims=True))
         + s.max(0, keepdims=True)).T)

    args = (jnp.asarray(raw_q), jnp.asarray(a), jnp.asarray(b), scale,
            lse_row, lse_col)
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("CLIP_DPLM_LOSS_MERGED", mode)
        with pltpu.force_tpu_interpret_mode():
            outs[mode] = jax.jit(
                lambda *xs: _sym_grad_passes_from_raw(
                    *xs, block_m=block_m, block_n=block_n)
            )(*args)
        jax.clear_caches()  # env is read at trace time
    for got, want, name in zip(outs["1"], outs["0"],
                               ["acc_a", "rowdot", "acc_b"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4,
            err_msg=f"{name} merged multi-tile mismatch",
        )


def test_merged_backward_vmem_gate():
    """The merged single-pass backward must only engage when its FULL
    scoped-VMEM working set (dB accumulator + resident operand + the
    double-buffered block tiles) fits the compiler's 40 MB budget. B=10240
    at d=512 passed the old accumulator-only accounting (31.5 MB) but
    compiled to a 40.7 MB stack allocation and failed outright; B=8192
    (the bench operating point) must keep engaging."""
    from clip_dplm_tpu.ops.fused_infonce import (
        BLOCK_M, BLOCK_N, MERGED_VMEM_CAP, _merged_vmem_need)

    d = 512
    ok = jnp.zeros((8192, d), jnp.bfloat16)
    too_big = jnp.zeros((10240, d), jnp.bfloat16)
    assert _merged_vmem_need(8192, d, ok, BLOCK_M, BLOCK_N) <= MERGED_VMEM_CAP
    assert (_merged_vmem_need(10240, d, too_big, BLOCK_M, BLOCK_N)
            > MERGED_VMEM_CAP)
