"""Tensor-parallel sharding: dp x tp mesh runs the full train step and matches
the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from clip_dplm_tpu.config import Config, apply_overrides
from clip_dplm_tpu.models import TwoTowerCLIP
from clip_dplm_tpu.parallel import create_mesh
from clip_dplm_tpu.parallel.mesh import apply_tp_sharding, tp_leaf_spec
from clip_dplm_tpu.train import create_train_state, make_train_step
from clip_dplm_tpu.train.trainer import jit_train_step


def _cfg():
    return apply_overrides(
        Config(),
        [
            "tower_a.input_dim=64", "tower_a.hidden_size=256",
            "tower_b.input_dim=64", "tower_b.hidden_size=256",
            "projection.dim=128", "train.optim.total_steps=100",
            "train.optim.warmup_steps=1",
        ],
    )


def test_tp_leaf_spec_rules():
    ctx = create_mesh(model_parallel=2)
    big = jnp.zeros((512, 512))
    assert tp_leaf_spec(big, ctx) == P(None, "model")
    small = jnp.zeros((8, 8))
    assert tp_leaf_spec(small, ctx) == P()
    bias = jnp.zeros((512,))
    assert tp_leaf_spec(bias, ctx) == P()
    odd = jnp.zeros((512, 513))  # not divisible by tp
    assert tp_leaf_spec(odd, ctx) == P()


@pytest.mark.slow
def test_dp_tp_step_matches_single_device(rng):
    cfg = _cfg()
    model = TwoTowerCLIP(cfg=cfg)
    B = 32
    batch = {
        "a": jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32)),
    }
    state = create_train_state(model, cfg, batch)
    step = make_train_step(cfg)

    # single device baseline
    s1, m1 = jax.jit(step)(state, batch)

    # 4 data x 2 model mesh
    ctx = create_mesh(model_parallel=2)
    assert ctx.data_size == 4 and ctx.model_size == 2
    state_tp = apply_tp_sharding(state, ctx, min_elements=1 << 12)
    sharded = jit_train_step(step, ctx, state_tp, tp_min_elements=1 << 12)
    from clip_dplm_tpu.parallel import shard_batch

    s2, m2 = sharded(state_tp, shard_batch(ctx, batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    for x, y in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5
        )
    # and the big kernels are actually sharded over the model axis
    k = s2.params["tower_a"]["dense_0"]["kernel"]
    assert "model" in str(k.sharding.spec)


@pytest.mark.slow
def test_tp_multi_step_stays_sharded(rng):
    """Donated sharded state keeps its sharding across chained steps."""
    cfg = _cfg()
    model = TwoTowerCLIP(cfg=cfg)
    batch = {
        "a": jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32)),
    }
    ctx = create_mesh(model_parallel=2)
    state = apply_tp_sharding(
        create_train_state(model, cfg, batch), ctx, min_elements=1 << 12
    )
    step = jit_train_step(make_train_step(cfg), ctx, state, tp_min_elements=1 << 12)
    from clip_dplm_tpu.parallel import shard_batch

    b = shard_batch(ctx, batch)
    for _ in range(3):
        state, metrics = step(state, b)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_tp_sharded_esm_inference(rng):
    """Frozen 'large' protein tower inference with kernels sharded over the
    model axis (the TP plan for the 650M tower, SURVEY.md sec 2.7)."""
    import jax.numpy as jnp

    from clip_dplm_tpu.config import ESMConfig
    from clip_dplm_tpu.data import protein
    from clip_dplm_tpu.models.esm import ESMTower

    cfg = ESMConfig(name="tp_test", vocab_size=33, d_model=128, num_layers=2,
                    num_heads=4, max_len=64)
    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    toks, mask = protein.tokenize_batch(
        [protein.random_protein(rng, 20) for _ in range(8)], pad_multiple=8)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    variables = tower.init(jax.random.PRNGKey(0), toks, mask)

    ref = tower.apply(variables, toks, mask, pooling="mean_residues")

    ctx = create_mesh(model_parallel=2)
    sharded_vars = apply_tp_sharding(variables, ctx, min_elements=1 << 12)
    fn = jax.jit(
        lambda v, t, m: tower.apply(v, t, m, pooling="mean_residues"),
        in_shardings=(
            jax.tree_util.tree_map(
                lambda l: ctx.sharding(tp_leaf_spec(l, ctx, 1 << 12)), variables
            ),
            ctx.sharding(P("data")),
            ctx.sharding(P("data")),
        ),
    )
    out = fn(sharded_vars, *map(lambda x: jax.device_put(
        x, ctx.sharding(P("data"))), (toks, mask)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


class _FakeDev:
    """Stand-in with the only attribute order_devices_for_mesh reads."""

    def __init__(self, i, slice_index):
        self.id = i
        self.slice_index = slice_index

    def __repr__(self):
        return f"d{self.id}@s{self.slice_index}"


def test_order_devices_keeps_tp_groups_on_one_slice():
    from clip_dplm_tpu.parallel.mesh import order_devices_for_mesh

    # interleaved arrival order across 2 slices of 4 devices each
    devs = [_FakeDev(i, slice_index=i % 2) for i in range(8)]
    ordered = order_devices_for_mesh(devs, model_parallel=4)
    # every consecutive group of 4 (a TP group after the (data, model)
    # reshape) must live inside one slice
    for g in range(2):
        group = ordered[4 * g : 4 * (g + 1)]
        assert len({d.slice_index for d in group}) == 1
    # stable within a slice
    assert [d.id for d in ordered] == [0, 2, 4, 6, 1, 3, 5, 7]


def test_order_devices_rejects_straddling_tp_group():
    import pytest as _pytest

    from clip_dplm_tpu.parallel.mesh import order_devices_for_mesh

    devs = [_FakeDev(i, slice_index=i // 2) for i in range(8)]  # 4 slices of 2
    with _pytest.raises(ValueError, match="straddle"):
        order_devices_for_mesh(devs, model_parallel=4)
    with _pytest.raises(ValueError, match="uneven"):
        order_devices_for_mesh(devs[:7], model_parallel=2)
    # pure DP tolerates any slice topology (no TP group can straddle):
    # uneven slices must NOT raise, and slices stay contiguous
    ordered = order_devices_for_mesh(devs[:7], model_parallel=1)
    assert [d.id for d in ordered] == [0, 1, 2, 3, 4, 5, 6]


def test_order_devices_single_slice_identity():
    from clip_dplm_tpu.parallel.mesh import order_devices_for_mesh

    # CPU/test devices have no slice_index -> order unchanged, no error
    devs = list(jax.devices())
    assert order_devices_for_mesh(devs, model_parallel=2) == devs


def test_shard_batch_process_local_matches_device_put():
    """Single-process degenerate case: the multi-host assembly path
    (make_array_from_process_local_data) must produce the same global arrays
    and shardings as the device_put path."""
    import numpy as np

    from clip_dplm_tpu.parallel import create_mesh, shard_batch

    ctx = create_mesh(model_parallel=2)
    batch = {
        "x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3),
        "edge_index": np.arange(2 * 5).reshape(2, 5),  # 2 % data_size != 0
    }
    a = shard_batch(ctx, batch, process_local=False)
    b = shard_batch(ctx, batch, process_local=True)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding, k


def test_shard_batch_per_process_divisibility(monkeypatch):
    """Multi-process classification must test PER-PROCESS rows against the
    PER-PROCESS device count: 12 local rows on a data=8 mesh split over 2
    processes (4 devices each) is a valid data shard (global 24 % 8 == 0)
    even though 12 % 8 != 0 — the old global check replicated it, silently
    committing per-host-divergent data."""
    from clip_dplm_tpu.parallel import mesh as mesh_mod
    from clip_dplm_tpu.parallel.mesh import (
        batch_sharding, create_mesh, replicated_sharding, shard_batch)

    ctx = create_mesh()  # 8 devices, data=8
    calls = []

    def fake_assemble(sharding, x, global_shape):
        calls.append((sharding, tuple(global_shape)))
        return x

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        mesh_mod.jax, "make_array_from_process_local_data", fake_assemble)
    shard_batch(
        ctx,
        {"x": np.zeros((12, 3), np.float32),      # 12 % 4 == 0 -> sharded
         "edge_index": np.zeros((2, 5), np.int32)},  # 2 % 4 != 0 -> replicated
        process_local=True,
    )
    by_shape = {shape: sh for sh, shape in calls}
    assert by_shape[(24, 3)] == batch_sharding(ctx)       # global rows
    assert by_shape[(2, 5)] == replicated_sharding(ctx)   # local shape kept


def test_prefetcher_uses_whole_batch_put():
    """Trainer hands parallel.shard_batch to the prefetcher as `put`; the
    prefetcher must route batches through it (a per-leaf device_put cannot
    assemble multi-process global arrays)."""
    from clip_dplm_tpu.data.prefetch import DevicePrefetcher

    seen = []

    def put(batch):
        seen.append(batch)
        return {k: v + 1 for k, v in batch.items()}

    out = list(DevicePrefetcher(
        [{"x": np.zeros(2)}, {"x": np.ones(2)}], put=put))
    assert len(seen) == 2
    np.testing.assert_array_equal(out[1]["x"], np.full(2, 2.0))
