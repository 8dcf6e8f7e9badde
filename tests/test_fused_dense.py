"""Parity tests for the fused Dense+LN+act+dropout Pallas block
(ops/fused_dense.py) and its flax-module routing (models/layers.py).

Kernels run in interpret mode on the CPU mesh; the compiled path is exercised
on TPU by bench.py / scripts. NOTE: the Pallas interpreter stubs the on-core
PRNG to zeros, so dropout statistics are TPU-only; interpret-mode tests run
the deterministic path (rate folded to 0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.ops.fused_dense import (
    fused_dense_norm_act,
    fused_dense_reference,
)

CASES = [
    ("ln_act", "gelu"),
    ("ln_act", "none"),
    ("act_ln", "relu"),
    # non-invertible acts: the act_ln forward saves the pre-activation
    # residual so the backward can evaluate act'(u) directly
    ("act_ln", "gelu"),
    ("act_ln", "silu"),
    ("act_ln", "tanh"),
]


def _inputs(B=48, K=200, N=256, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(B, K)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
        jnp.asarray(rng.normal(size=(N,)).astype(np.float32) * 0.1),
        jnp.asarray(1.0 + 0.1 * rng.normal(size=(N,)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(N,)).astype(np.float32)),
    )


@pytest.mark.parametrize("order,act", CASES)
def test_fused_dense_fwd_bwd_parity_f32(order, act):
    """Exact-math parity (f32 compute removes all rounding-order noise)."""
    x, w, b, g, bt = _inputs()

    def f_fused(x, w, b, g, bt):
        y = fused_dense_norm_act(
            x, w, b, g, bt, order=order, act=act, deterministic=True,
            interpret=True, compute_dtype=jnp.float32,
        )
        return jnp.sum(jnp.sin(y))

    def f_ref(x, w, b, g, bt):
        y = fused_dense_reference(
            x, w, b, g, bt, order=order, act=act, compute_dtype=jnp.float32
        )
        return jnp.sum(jnp.sin(y))

    lf, gradsf = jax.value_and_grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, g, bt)
    lr, gradsr = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, g, bt)
    assert np.allclose(lf, lr, rtol=1e-5)
    for a_, r_ in zip(gradsf, gradsr):
        np.testing.assert_allclose(
            np.asarray(a_, np.float32), np.asarray(r_, np.float32),
            rtol=2e-4, atol=1e-4,
        )


@pytest.mark.parametrize("order,act", CASES)
def test_fused_dense_bf16_matches_to_rounding(order, act):
    """bf16 compute: values match the dtype-boundary reference to bf16 noise."""
    x, w, b, g, bt = _inputs()
    y = fused_dense_norm_act(
        x, w, b, g, bt, order=order, act=act, deterministic=True, interpret=True
    )
    yr = fused_dense_reference(x, w, b, g, bt, order=order, act=act)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32),
        rtol=0.05, atol=0.03,
    )


def test_fused_dense_rejects_bad_args():
    x, w, b, g, bt = _inputs(N=256)
    with pytest.raises(ValueError):
        fused_dense_norm_act(x, w, b, g, bt, order="bogus", interpret=True)
    with pytest.raises(ValueError):
        fused_dense_norm_act(
            x, w[:, :200], b[:200], g[:200], bt[:200], interpret=True
        )  # N not lane-aligned
    with pytest.raises(ValueError):
        fused_dense_norm_act(
            x, w, b, g, bt, dropout_rate=0.5, deterministic=False,
            interpret=True,
        )  # dropout without a seed
    with pytest.raises(ValueError):
        fused_dense_norm_act(
            x, w, b, g, bt, order="act_ln", act="relu", dropout_rate=0.5,
            dropout_seed=jnp.zeros((1,), jnp.int32), deterministic=False,
            interpret=True,
        )  # act_ln does not implement dropout — reject, don't skip
    with pytest.raises(ValueError):
        fused_dense_norm_act(
            x, w, b, g, bt, order="ln_act", act="mish", interpret=True
        )  # unknown activation rejected eagerly


# ---------------------------------------------------------------------------
# module routing: fused path == unfused path (same params, same tree)
# ---------------------------------------------------------------------------


def _tower_pair(monkeypatch, fused_cfg, unfused_cfg, module_cls, x, rngs=None):
    import flax.linen  # noqa: F401  (ensure flax initialized)

    from clip_dplm_tpu.ops import fused_dense as fd

    monkeypatch.setattr(fd, "FORCE_INTERPRET", True)
    m_fused = module_cls(cfg=fused_cfg)
    m_plain = module_cls(cfg=unfused_cfg)
    p_fused = m_fused.init(jax.random.PRNGKey(0), x)["params"]
    p_plain = m_plain.init(jax.random.PRNGKey(0), x)["params"]
    return m_fused, m_plain, p_fused, p_plain


@pytest.mark.slow
def test_mlp_tower_fused_routing(monkeypatch):
    from dataclasses import replace

    from clip_dplm_tpu.config import TowerConfig
    from clip_dplm_tpu.models.layers import MLPTower

    cfg = TowerConfig(input_dim=96, hidden_size=128, num_hidden_layers=2)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(24, 96)), jnp.float32)
    m_fused, m_plain, p_fused, p_plain = _tower_pair(
        monkeypatch, replace(cfg, fused_dense=True), cfg, MLPTower, x
    )
    # identical param trees (same names, shapes, inits) => checkpoint compat
    assert jax.tree_util.tree_structure(p_fused) == jax.tree_util.tree_structure(p_plain)
    for a, b in zip(jax.tree_util.tree_leaves(p_fused), jax.tree_util.tree_leaves(p_plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss_fused(p):
        return jnp.sum(jnp.sin(m_fused.apply({"params": p}, x)))

    def loss_plain(p):
        return jnp.sum(jnp.sin(m_plain.apply({"params": p}, x)))

    lf, gf = jax.value_and_grad(loss_fused)(p_fused)
    lp, gp = jax.value_and_grad(loss_plain)(p_plain)
    assert np.allclose(lf, lp, rtol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.05,
        )


@pytest.mark.slow
def test_optimized_projection_fused_routing(monkeypatch):
    from dataclasses import replace

    from clip_dplm_tpu.config import ProjectionConfig
    from clip_dplm_tpu.models.layers import OptimizedProjectionHead

    cfg = ProjectionConfig(kind="optimized", dim=128, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16, 160)), jnp.float32)
    m_fused, m_plain, p_fused, p_plain = _tower_pair(
        monkeypatch, replace(cfg, fused_dense=True), cfg, OptimizedProjectionHead, x
    )
    assert jax.tree_util.tree_structure(p_fused) == jax.tree_util.tree_structure(p_plain)
    y_fused = m_fused.apply({"params": p_fused}, x)
    y_plain = m_plain.apply({"params": p_plain}, x)
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_plain, np.float32),
        rtol=0.05, atol=0.02,
    )
    # gradient parity incl. the fused skip/layer_scale residual tail
    gf = jax.grad(lambda p: jnp.sum(jnp.sin(m_fused.apply({"params": p}, x))))(p_fused)
    gp = jax.grad(lambda p: jnp.sum(jnp.sin(m_plain.apply({"params": p}, x))))(p_plain)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
    for k in flat_p:
        np.testing.assert_allclose(
            np.asarray(flat_f[k], np.float32), np.asarray(flat_p[k], np.float32),
            rtol=0.1, atol=0.05, err_msg=str(k),
        )


@pytest.mark.slow
def test_fused_skip_l2_epilogue_parity():
    """skip + layer_scale + L2-normalize epilogue, fwd and grads vs the
    reference at f32 (exact)."""
    x, w, b, g, bt = _inputs(B=32, K=160, N=128)
    rng = np.random.default_rng(7)
    skip = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32))
    ls = jnp.asarray([0.3], np.float32)

    from clip_dplm_tpu.ops.fused_dense import (
        fused_dense_norm_act, fused_dense_reference,
    )

    def f_fused(x, w, b, g, bt, skip, ls):
        y = fused_dense_norm_act(
            x, w, b, g, bt, order="ln_act", act="none", deterministic=True,
            interpret=True, compute_dtype=jnp.float32, skip=skip,
            layer_scale=ls, l2_normalize_out=True,
        )
        return jnp.sum(jnp.sin(3.0 * y))

    def f_ref(x, w, b, g, bt, skip, ls):
        y = fused_dense_reference(
            x, w, b, g, bt, order="ln_act", act="none",
            compute_dtype=jnp.float32, skip=skip, layer_scale=ls,
            l2_normalize_out=True,
        )
        return jnp.sum(jnp.sin(3.0 * y))

    args = (x, w, b, g, bt, skip, ls)
    lf, gradsf = jax.value_and_grad(f_fused, argnums=tuple(range(7)))(*args)
    lr, gradsr = jax.value_and_grad(f_ref, argnums=tuple(range(7)))(*args)
    assert np.allclose(lf, lr, rtol=1e-5)
    for name, a_, r_ in zip("x w b g bt skip ls".split(), gradsf, gradsr):
        np.testing.assert_allclose(
            np.asarray(a_, np.float32), np.asarray(r_, np.float32),
            rtol=3e-4, atol=1e-4, err_msg=name,
        )


@pytest.mark.slow
def test_projection_l2_normalize_output_knob(monkeypatch):
    """projection.l2_normalize_output makes every projection kind emit unit
    rows on both the fused and unfused paths."""
    from dataclasses import replace

    from clip_dplm_tpu.config import ProjectionConfig
    from clip_dplm_tpu.models.layers import make_projection
    from clip_dplm_tpu.ops import fused_dense as fd

    x = jnp.asarray(np.random.default_rng(5).normal(size=(8, 96)), jnp.float32)
    for kind in ("linear", "base", "optimized"):
        cfg = ProjectionConfig(kind=kind, dim=128, dropout=0.0,
                               l2_normalize_output=True)
        m = make_projection(cfg)
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        norms = jnp.linalg.norm(m.apply({"params": p}, x), axis=-1)
        np.testing.assert_allclose(
            np.asarray(norms), 1.0, rtol=1e-5, err_msg=f"{kind} unfused")

    monkeypatch.setattr(fd, "FORCE_INTERPRET", True)
    for kind in ("base", "optimized"):
        cfg = ProjectionConfig(kind=kind, dim=128, dropout=0.0,
                               l2_normalize_output=True, fused_dense=True)
        m_f = make_projection(cfg)
        p_f = m_f.init(jax.random.PRNGKey(0), x)["params"]
        norms_f = jnp.linalg.norm(m_f.apply({"params": p_f}, x), axis=-1)
        np.testing.assert_allclose(
            np.asarray(norms_f), 1.0, rtol=1e-5, err_msg=f"{kind} fused")


def test_base_projection_fused_routing(monkeypatch):
    from dataclasses import replace

    from clip_dplm_tpu.config import ProjectionConfig
    from clip_dplm_tpu.models.layers import ProjectionHead

    cfg = ProjectionConfig(kind="base", dim=128, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(16, 160)), jnp.float32)
    m_fused, m_plain, p_fused, p_plain = _tower_pair(
        monkeypatch, replace(cfg, fused_dense=True), cfg, ProjectionHead, x
    )
    assert jax.tree_util.tree_structure(p_fused) == jax.tree_util.tree_structure(p_plain)
    y_fused = m_fused.apply({"params": p_fused}, x)
    y_plain = m_plain.apply({"params": p_plain}, x)
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_plain, np.float32),
        rtol=0.05, atol=0.02,
    )


def test_fused_dense_disabled_off_tpu():
    """With FORCE_INTERPRET unset on CPU, the flag silently falls back to
    the unfused path (interpreted PRNG would break dropout semantics)."""
    from clip_dplm_tpu.models.layers import _fused_dense_mode

    enabled, interp = _fused_dense_mode(True)
    assert jax.devices()[0].platform != "tpu"
    assert not enabled and not interp
    assert _fused_dense_mode(False) == (False, False)
