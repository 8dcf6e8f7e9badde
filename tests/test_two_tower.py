"""End-to-end slice: config -> data -> model -> loss -> collective -> optimizer
-> checkpoint on the two-tower CLIP (BASELINE config 1, old/clip.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import Config, apply_overrides
from clip_dplm_tpu.data import PairedEmbeddingDataset
from clip_dplm_tpu.models import TwoTowerCLIP
from clip_dplm_tpu.train import Trainer, create_train_state, make_train_step
from clip_dplm_tpu.train.metrics import retrieval_metrics
from clip_dplm_tpu.train.trainer import jit_train_step, make_eval_step


def small_cfg(**over):
    cfg = Config()
    cfg = apply_overrides(
        cfg,
        [
            "tower_a.input_dim=32",
            "tower_a.hidden_size=64",
            "tower_a.num_hidden_layers=2",
            "tower_b.input_dim=48",
            "tower_b.hidden_size=64",
            "tower_b.num_hidden_layers=2",
            "projection.dim=32",
            "train.batch_size=32",
            "train.optim.warmup_steps=5",
            "train.optim.total_steps=200",
            "train.optim.learning_rate=1e-3",
        ]
        + [f"{k}={v}" for k, v in over.items()],
    )
    return cfg


def make_batch(cfg, n=32, seed=0):
    ds = PairedEmbeddingDataset.synthetic(
        n, cfg.tower_a.input_dim, cfg.tower_b.input_dim, seed=seed
    )
    return next(ds.batches(n, shuffle=False))


def _strip_labels(b):
    return {k: v for k, v in b.items() if k != "labels"}


def test_init_and_forward():
    cfg = small_cfg()
    model = TwoTowerCLIP(cfg=cfg)
    batch = _strip_labels(make_batch(cfg))
    state = create_train_state(model, cfg, batch)
    out = jax.jit(lambda p: model.apply(
        {"params": p}, batch, deterministic=True))(state.params)
    assert out["emb_a"].shape == (32, cfg.projection.dim)
    assert out["emb_b"].shape == (32, cfg.projection.dim)
    assert out["emb_a"].dtype == jnp.float32
    np.testing.assert_allclose(
        float(out["logit_scale"]), cfg.contrastive.logit_scale_init, rtol=1e-6
    )


@pytest.mark.slow
def test_training_learns():
    """Loss decreases and retrieval beats chance on structured synthetic pairs."""
    cfg = small_cfg()
    model = TwoTowerCLIP(cfg=cfg)
    ds = PairedEmbeddingDataset.synthetic(
        256, cfg.tower_a.input_dim, cfg.tower_b.input_dim, noise=0.05, seed=1
    )
    batch0 = _strip_labels(next(ds.batches(32, shuffle=False)))
    state = create_train_state(model, cfg, batch0)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))

    first_loss = None
    for epoch in range(30):
        for batch in ds.batches(32, seed=epoch):
            state, metrics = step(state, _strip_labels(batch))
            if first_loss is None:
                first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < first_loss * 0.7, (first_loss, final_loss)

    out = model.apply(
        {"params": state.params},
        {"a": jnp.asarray(ds.a), "b": jnp.asarray(ds.b)},
        deterministic=True,
    )
    r = retrieval_metrics(out["emb_a"], out["emb_b"])
    assert float(r["R@10"]) > 10.0 / 256.0 * 3  # way above chance


@pytest.mark.slow
def test_pjit_matches_single_device(mesh8):
    """The pjit-sharded step produces the same loss/grads as single-device."""
    cfg = small_cfg()
    model = TwoTowerCLIP(cfg=cfg)
    batch = _strip_labels(make_batch(cfg, n=64))
    state = create_train_state(model, cfg, batch)
    step = make_train_step(cfg)

    state1, m1 = jax.jit(step)(state, batch)
    sharded = jit_train_step(step, mesh8, state)
    state2, m2 = sharded(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    # parameters after one step match too
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat2 = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_grad_accum_matches_mean_of_microbatches():
    """With dropout disabled, the accumulated loss equals the mean of the
    per-microbatch losses computed independently."""
    from clip_dplm_tpu.ops.infonce import clip_loss

    no_dropout = {
        "tower_a.dropout": 0.0, "tower_b.dropout": 0.0, "projection.dropout": 0.0,
    }
    cfg_accum = small_cfg(**{"train.optim.grad_accum_steps": 2, **no_dropout})
    model = TwoTowerCLIP(cfg=cfg_accum)
    batch = _strip_labels(make_batch(cfg_accum, n=64))
    state = create_train_state(model, cfg_accum, batch)
    _, m = jax.jit(make_train_step(cfg_accum))(state, batch)

    expected = []
    for sl in (slice(0, 32), slice(32, 64)):
        mb = {k: v[sl] for k, v in batch.items()}
        out = model.apply({"params": state.params}, mb, deterministic=True)
        loss, _ = clip_loss(out["emb_a"], out["emb_b"], out["logit_scale"])
        expected.append(float(loss))
    np.testing.assert_allclose(float(m["loss"]), np.mean(expected), rtol=1e-5)


@pytest.mark.slow
def test_cache_path_runs():
    cfg = small_cfg(**{"contrastive.use_cache": "true", "contrastive.cache_size": 64})
    model = TwoTowerCLIP(cfg=cfg)
    batch = _strip_labels(make_batch(cfg))
    state = create_train_state(model, cfg, batch)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    state, m1 = step(state, batch)
    assert int(state.cache_len) == 32
    state, m2 = step(state, batch)
    assert int(state.cache_len) == 64
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_trainer_loop_and_early_stopping(tmp_path, mesh8):
    cfg = small_cfg(**{"train.early_stopping_patience": 2})
    model = TwoTowerCLIP(cfg=cfg)
    ds = PairedEmbeddingDataset.synthetic(
        128, cfg.tower_a.input_dim, cfg.tower_b.input_dim, seed=3
    )
    train, val = ds.split(0.75)
    batch0 = _strip_labels(next(train.batches(32, shuffle=False)))
    state = create_train_state(model, cfg, batch0)
    trainer = Trainer(cfg, state, ctx=mesh8, checkpoint_dir=str(tmp_path / "ckpt"))

    def train_batches():
        return (_strip_labels(b) for b in train.batches(32, seed=7))

    def val_batches():
        return (_strip_labels(b) for b in val.batches(32, shuffle=False))

    history = trainer.train(train_batches, val_batches, num_epochs=3)
    assert len(history["train_loss"]) == 3
    assert len(history["val_loss"]) == 3
    assert all(np.isfinite(v) for v in history["train_loss"])


@pytest.mark.slow
def test_architecture_variants():
    """mlp / transformer / resnet towers all run (run1 architecture search)."""
    for arch in ("mlp", "transformer", "resnet"):
        cfg = small_cfg(**{"tower_a.architecture": arch, "tower_b.architecture": arch})
        model = TwoTowerCLIP(cfg=cfg)
        batch = _strip_labels(make_batch(cfg, n=8))
        state = create_train_state(model, cfg, batch)
        out = model.apply({"params": state.params}, batch, deterministic=True)
        assert out["emb_a"].shape == (8, cfg.projection.dim)


def test_projection_variants():
    for kind in ("linear", "base", "optimized"):
        cfg = small_cfg(**{"projection.kind": kind})
        model = TwoTowerCLIP(cfg=cfg)
        batch = _strip_labels(make_batch(cfg, n=8))
        state = create_train_state(model, cfg, batch)
        out = model.apply({"params": state.params}, batch, deterministic=True)
        assert np.all(np.isfinite(np.asarray(out["emb_a"], dtype=np.float32)))


@pytest.mark.slow
def test_multi_step_trainer_matches_single(mesh8):
    """steps_per_call>1 scans steps on-device; same final loss trajectory as
    single-step given identical batch order."""
    cfg1 = small_cfg()
    cfg2 = small_cfg(**{"train.steps_per_call": 2})
    ds = PairedEmbeddingDataset.synthetic(128, cfg1.tower_a.input_dim,
                                          cfg1.tower_b.input_dim, seed=5)
    batches = [
        _strip_labels(b) for b in ds.batches(32, seed=3, shuffle=False)
    ]
    from clip_dplm_tpu.train import Trainer

    def run(cfg):
        model = TwoTowerCLIP(cfg=cfg)
        state = create_train_state(model, cfg, batches[0])
        tr = Trainer(cfg, state)
        tr.train(lambda: iter(batches), num_epochs=2)
        return tr.state

    s1, s2 = run(cfg1), run(cfg2)
    assert int(s1.step) == int(s2.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_grad_accum_cache_sees_full_batch():
    """With grad_accum_steps=2 the hard-negative cache must ingest EVERY
    microbatch's embeddings (old/clip_opt.py:75-81 caches every batch), not
    just microbatch 0."""
    cfg = small_cfg(**{
        "train.optim.grad_accum_steps": 2,
        "contrastive.use_cache": "true", "contrastive.cache_size": 128,
    })
    model = TwoTowerCLIP(cfg=cfg)
    batch = _strip_labels(make_batch(cfg, n=64))
    state = create_train_state(model, cfg, batch)
    state, m = jax.jit(make_train_step(cfg))(state, batch)
    assert int(state.cache_len) == 64  # full batch, not 32
    # the cached rows are normalized emb_b of the respective microbatches
    out0 = model.apply(
        {"params": state.params}, {k: v[:32] for k, v in batch.items()},
        deterministic=True,
    )
    assert np.isfinite(np.asarray(state.cache[:64])).all()
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_trainer_fused_global_shard_map_path(mesh8, monkeypatch):
    """use_fused_kernel + multi-device mesh routes the loss through the
    shard_map(axis_name) fused kernel; in interpret mode on the CPU mesh the
    loss matches the XLA global formulation."""
    from jax.experimental.pallas import tpu as pltpu

    from clip_dplm_tpu.train import trainer as trainer_mod

    cfg_fused = small_cfg(**{"contrastive.use_fused_kernel": "true",
                             "projection.dropout": 0.0, "tower_a.dropout": 0.0,
                             "tower_b.dropout": 0.0})
    cfg_xla = small_cfg(**{"projection.dropout": 0.0, "tower_a.dropout": 0.0,
                           "tower_b.dropout": 0.0})
    model = TwoTowerCLIP(cfg=cfg_fused)
    batch = _strip_labels(make_batch(cfg_fused, n=64))
    state = create_train_state(model, cfg_fused, batch)

    monkeypatch.setattr(trainer_mod, "_fused_ok", lambda: True)
    step_fused = make_train_step(cfg_fused, mesh8)
    step_xla = make_train_step(cfg_xla, mesh8)
    from clip_dplm_tpu.parallel import shard_batch

    sb = shard_batch(mesh8, batch)
    # jit_train_step donates the state: give each call its own copy
    state_b = jax.tree_util.tree_map(
        lambda x: x.copy() if hasattr(x, "copy") else x, state)
    with pltpu.force_tpu_interpret_mode():
        _, m_fused = jit_train_step(step_fused, mesh8, state)(state, sb)
    _, m_xla = jit_train_step(step_xla, mesh8, state_b)(state_b, sb)
    # trainer's fused path computes the similarity dot in bf16 (dot_dtype);
    # the XLA path is fp32 — tolerance covers the bf16 rounding only
    np.testing.assert_allclose(
        float(m_fused["loss"]), float(m_xla["loss"]), rtol=1e-3)


def test_fused_adamw_matches_optax_chain(rng):
    """fused_adamw (single-pass update with folded-in global-norm clip) must
    reproduce optax.chain(clip_by_global_norm, adamw) trajectories exactly."""
    import optax

    from clip_dplm_tpu.train.state import build_optimizer, fused_adamw
    from clip_dplm_tpu.config import OptimConfig

    cfg = OptimConfig(learning_rate=3e-3, warmup_steps=2, total_steps=10,
                      grad_clip_norm=0.5, weight_decay=0.01)
    params = {
        "w": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
    }
    import dataclasses
    tx_f = build_optimizer(cfg)  # fused_update default
    tx_c = build_optimizer(dataclasses.replace(cfg, fused_update=False))
    p_f, p_c = params, params
    s_f, s_c = tx_f.init(params), tx_c.init(params)
    for i in range(6):
        g = jax.tree_util.tree_map(
            lambda p: jnp.sin(p * (i + 1.0)) * (3.0 if i % 2 else 0.1), params)
        u_f, s_f = tx_f.update(g, s_f, p_f)
        u_c, s_c = tx_c.update(g, s_c, p_c)
        p_f = optax.apply_updates(p_f, u_f)
        p_c = optax.apply_updates(p_c, u_c)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_f[k]), np.asarray(p_c[k]), rtol=2e-6, atol=1e-7,
            err_msg=f"param {k} diverged between fused and chain optimizers",
        )
