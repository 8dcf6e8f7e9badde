"""LoRA adapters (models/lora.py): init equivalence, gradient routing,
frozen-base training, merge/split, and the DPLM integration.

The reference freezes its big towers outright (old/encoders.py:15-31,
tf nb cell 21); LoRA is the beyond-parity fine-tuning path for that scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import Config, ESMConfig, apply_overrides
from clip_dplm_tpu.models.esm import ESMTower
from clip_dplm_tpu.models.lora import (
    LoRASpec,
    has_lora_params,
    is_lora_path,
    merge_adapters,
    merge_lora,
    split_lora,
    spec_from,
)

ALL_TARGETS = ("q", "k", "v", "out", "ffn_in", "ffn_out")


def _tower_cfg(**kw):
    base = dict(name="tiny", vocab_size=33, d_model=64, num_layers=2,
                num_heads=4, max_len=64)
    base.update(kw)
    return ESMConfig(**base)


def _tokens(rng, B=4, S=18):
    toks = rng.integers(4, 24, (B, S)).astype(np.int32)
    toks[:, 0] = 0
    toks[:, -1] = 2
    return jnp.asarray(toks)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_spec_validation():
    with pytest.raises(ValueError):
        LoRASpec(rank=4, targets=("q", "bogus"))
    with pytest.raises(ValueError):
        LoRASpec(rank=0)
    assert spec_from(_tower_cfg()) is None
    spec = spec_from(_tower_cfg(lora_rank=4, lora_alpha=8.0,
                                lora_targets=("q", "out")))
    assert spec.rank == 4 and spec.scale == 2.0


def test_init_matches_base_model(rng):
    """b is zero-initialized, so the adapted model IS the base model at
    init — and the base param tree is byte-identical (checkpoints load)."""
    toks = _tokens(rng)
    lora_tower = ESMTower(cfg=_tower_cfg(lora_rank=4,
                                         lora_targets=ALL_TARGETS),
                          dtype=jnp.float32)
    base_tower = ESMTower(cfg=_tower_cfg(), dtype=jnp.float32)
    params = jax.jit(
        lambda k: lora_tower.init(k, toks)["params"])(jax.random.PRNGKey(0))
    assert has_lora_params(params)
    base, adapters = split_lora(params)
    assert not has_lora_params(base)
    # base tree structurally identical to the non-LoRA model's
    ref = jax.jit(
        lambda k: base_tower.init(k, toks)["params"])(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(base) == \
        jax.tree_util.tree_structure(ref)
    out_lora = jax.jit(lambda p: lora_tower.apply({"params": p}, toks))(params)
    out_base = jax.jit(lambda p: base_tower.apply({"params": p}, toks))(base)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_base),
                               atol=1e-6)


def test_grads_flow_to_adapters_not_base(rng):
    toks = _tokens(rng)
    tower = ESMTower(cfg=_tower_cfg(lora_rank=4, lora_targets=ALL_TARGETS),
                     dtype=jnp.float32)
    params = jax.jit(
        lambda k: tower.init(k, toks)["params"])(jax.random.PRNGKey(1))

    # give the adapters nonzero b so dL/da is nonzero too
    def bump(path, leaf):
        if is_lora_path(tuple(str(k.key) for k in path)):
            return leaf + 0.01
        return leaf

    params = jax.tree_util.tree_map_with_path(bump, params)

    def loss(p):
        return jnp.sum(tower.apply({"params": p}, toks,
                                   pooling="mean_residues") ** 2)

    grads = jax.jit(jax.grad(loss))(params)
    blk = grads["layer_0"]
    # frozen base: stop_gradient at use — exactly zero
    assert float(jnp.abs(blk["q"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(blk["ffn_out"]["kernel"]).max()) == 0.0
    # adapters train
    assert float(jnp.abs(blk["q_lora"]["a"]).max()) > 0.0
    assert float(jnp.abs(blk["q_lora"]["b"]).max()) > 0.0
    assert float(jnp.abs(blk["out_lora"]["b"]).max()) > 0.0
    assert float(jnp.abs(blk["ffn_in_lora"]["b"]).max()) > 0.0


def test_optimizer_freezes_base_and_masks_moments(rng):
    from clip_dplm_tpu.train.state import build_optimizer, freeze_subtrees

    toks = _tokens(rng)
    tower = ESMTower(cfg=_tower_cfg(lora_rank=2), dtype=jnp.float32)
    tp = jax.jit(
        lambda k: tower.init(k, toks)["params"])(jax.random.PRNGKey(2))
    params = {"esm_tower": tp,
              "head": {"kernel": jnp.ones((64, 8), jnp.float32)}}
    cfg = apply_overrides(Config(), ["train.optim.warmup_steps=0"])
    tx = freeze_subtrees(build_optimizer(cfg.train.optim), params,
                         ("esm_tower",))
    opt_state = tx.init(params)
    # moments exist only for trainable leaves (adapters + head)
    n_params = len(jax.tree_util.tree_leaves(params))
    inner = opt_state[0]
    if hasattr(inner, "inner_state"):  # optax.masked wrapper
        inner = inner.inner_state
    n_m = len(jax.tree_util.tree_leaves(inner.mu))
    trainable = [p for p, _ in _leaf_paths(params)
                 if p[0] == "head" or is_lora_path(p)]
    assert n_m == len(trainable) < n_params

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = jax.jit(tx.update)(grads, opt_state, params)
    frozen_moved = [
        p for p, u in _leaf_paths(updates)
        if p[0] == "esm_tower" and not is_lora_path(p)
        and float(jnp.abs(u).max()) != 0.0
    ]
    assert frozen_moved == []
    # trainable leaves DO move
    assert float(jnp.abs(updates["head"]["kernel"]).max()) > 0.0
    lora_b = updates["esm_tower"]["layer_0"]["q_lora"]["b"]
    assert float(jnp.abs(lora_b).max()) > 0.0


def _leaf_paths(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, path + (k,))
    else:
        yield path, tree


def test_merge_matches_adapted_forward(rng):
    toks = _tokens(rng)
    spec_cfg = _tower_cfg(lora_rank=4, lora_alpha=6.0,
                          lora_targets=ALL_TARGETS)
    tower = ESMTower(cfg=spec_cfg, dtype=jnp.float32)
    params = jax.jit(
        lambda k: tower.init(k, toks)["params"])(jax.random.PRNGKey(3))

    key = jax.random.PRNGKey(4)

    def randomize(path, leaf):
        nonlocal key
        if is_lora_path(tuple(str(k.key) for k in path)):
            key, sub = jax.random.split(key)
            return 0.02 * jax.random.normal(sub, leaf.shape, leaf.dtype)
        return leaf

    params = jax.tree_util.tree_map_with_path(randomize, params)
    adapted = jax.jit(lambda p: tower.apply(
        {"params": p}, toks, pooling="mean_residues"))(params)

    merged = merge_lora(params, spec_from(spec_cfg))
    assert not has_lora_params(merged)
    base_tower = ESMTower(cfg=_tower_cfg(), dtype=jnp.float32)
    base_apply = jax.jit(lambda p: base_tower.apply(
        {"params": p}, toks, pooling="mean_residues"))
    merged_out = base_apply(merged)
    np.testing.assert_allclose(np.asarray(adapted), np.asarray(merged_out),
                               rtol=1e-4, atol=1e-5)
    # adapters changed the function (the A/B above are nonzero)
    base_only, _ = split_lora(params)
    plain = base_apply(base_only)
    assert float(jnp.abs(plain - adapted).max()) > 1e-4


def test_split_merge_roundtrip(rng):
    toks = _tokens(rng)
    tower = ESMTower(cfg=_tower_cfg(lora_rank=2), dtype=jnp.float32)
    params = tower.init(jax.random.PRNGKey(5), toks)["params"]
    base, adapters = split_lora(params)
    assert has_lora_params(adapters) and not has_lora_params(base)
    back = merge_adapters(base, adapters)
    orig = dict(_leaf_paths(params))
    got = dict(_leaf_paths(back))
    assert set(orig) == set(got)
    for p in orig:
        np.testing.assert_array_equal(np.asarray(orig[p]),
                                      np.asarray(got[p]))


def test_dplm_lora_train_state(rng):
    """DPLM + LoRA: the auto frozen_keys leave adapters, final_ln and
    lm_head trainable; one train step moves only those."""
    from clip_dplm_tpu.models.dplm import DPLM
    from clip_dplm_tpu.train import create_train_state

    cfg = apply_overrides(Config(), [
        "experiment=dplm",
        "dplm.d_model=64", "dplm.num_layers=2", "dplm.num_heads=4",
        "dplm.lora_rank=2",
        "train.optim.fused_update=true",
        "train.optim.warmup_steps=0",
    ])
    model = DPLM(cfg=cfg.dplm, dtype=jnp.float32)
    toks = _tokens(rng, B=2, S=10)
    batch = {"tokens": toks, "mask": toks != 1}
    state = create_train_state(model, cfg, batch)

    def loss_fn(p):
        logits = model.apply({"params": p}, batch["tokens"], batch["mask"])
        return jnp.mean(logits ** 2)

    def one_step(st):
        return st.apply_gradients(jax.grad(loss_fn)(st.params))

    new_state = jax.jit(one_step)(state)
    moved, still = [], []
    for path, (old, new) in _zip_leaves(state.params, new_state.params):
        changed = bool(jnp.any(old != new))
        (moved if changed else still).append(path)
    moved_set = set(moved)
    assert any(is_lora_path(p) for p in moved_set)
    assert any(p[0] == "lm_head" for p in moved_set)
    for p in moved_set:
        assert is_lora_path(p) or p[0] in ("lm_head", "final_ln"), p
    # base trunk bit-frozen
    assert any(p[0] == "layer_0" and not is_lora_path(p) for p in still)


def _zip_leaves(a, b, path=()):
    if isinstance(a, dict):
        for k in a:
            yield from _zip_leaves(a[k], b[k], path + (k,))
    else:
        yield path, (a, b)


def test_dplm_lora_with_scan_layers(rng):
    """LoRA composes with the scanned trunk: adapters stack under
    layers/block and stay trainable while the stacked base freezes."""
    from clip_dplm_tpu.models.dplm import DPLM
    from clip_dplm_tpu.train import create_train_state

    cfg = apply_overrides(Config(), [
        "experiment=dplm",
        "dplm.d_model=64", "dplm.num_layers=2", "dplm.num_heads=4",
        "dplm.lora_rank=2", "dplm.scan_layers=true",
        "train.optim.fused_update=true",
        "train.optim.warmup_steps=0",
    ])
    model = DPLM(cfg=cfg.dplm, dtype=jnp.float32)
    toks = _tokens(rng, B=2, S=10)
    batch = {"tokens": toks, "mask": toks != 1}
    state = create_train_state(model, cfg, batch)
    blk = state.params["layers"]["block"]
    assert blk["q_lora"]["a"].shape[0] == 2  # stacked over layers

    def loss_fn(p):
        logits = model.apply({"params": p}, batch["tokens"], batch["mask"])
        return jnp.mean(logits ** 2)

    new_state = jax.jit(
        lambda st: st.apply_gradients(jax.grad(loss_fn)(st.params)))(state)
    old_blk = state.params["layers"]["block"]
    new_blk = new_state.params["layers"]["block"]
    assert bool(jnp.all(old_blk["q"]["kernel"] == new_blk["q"]["kernel"]))
    assert bool(jnp.any(old_blk["q_lora"]["b"] != new_blk["q_lora"]["b"]))


def test_adapter_npz_roundtrip(tmp_path, rng):
    from clip_dplm_tpu.models.lora import (
        load_adapters_npz,
        save_adapters_npz,
    )

    toks = _tokens(rng)
    tower = ESMTower(cfg=_tower_cfg(lora_rank=2), dtype=jnp.float32)
    params = tower.init(jax.random.PRNGKey(6), toks)["params"]
    path = str(tmp_path / "adapters.npz")
    n = save_adapters_npz(path, params)
    assert n == 2 * 2 * 2  # 2 layers x (q, v) x (a, b)
    ada = load_adapters_npz(path)
    base, ref = split_lora(params)
    got = dict(_leaf_paths(ada))
    for p, v in _leaf_paths(ref):
        np.testing.assert_array_equal(np.asarray(got[p]), np.asarray(v))
    # grafts back onto a base tree
    back = merge_adapters(base, ada)
    assert has_lora_params(back)
    with pytest.raises(ValueError):
        save_adapters_npz(str(tmp_path / "x.npz"), base)
