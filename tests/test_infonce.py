"""InfoNCE correctness: parity with a torch-semantics implementation
(old/clip_opt.py:130-151), global-batch == single-device, cache behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from clip_dplm_tpu.ops import infonce


def _np_softmax_ce(logits, labels):
    logits = logits - logits.max(axis=1, keepdims=True)
    logz = np.log(np.exp(logits).sum(axis=1))
    return (logz - logits[np.arange(len(labels)), labels]).mean()


def test_clip_loss_matches_torch_semantics(rng):
    """Symmetric CE: 0.5*(CE(sim, arange) + CE(sim.T, arange)) with
    scale = exp(logit_scale).clamp(100)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B, D = 16, 32
    a = rng.normal(size=(B, D)).astype(np.float32)
    b = rng.normal(size=(B, D)).astype(np.float32)
    logit_scale = np.float32(2.6592)

    loss, metrics = infonce.clip_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(logit_scale))

    ta = F.normalize(torch.tensor(a), dim=-1)
    tb = F.normalize(torch.tensor(b), dim=-1)
    scale = torch.tensor(logit_scale).exp().clamp(max=100)
    sim = scale * ta @ tb.T
    labels = torch.arange(B)
    expected = 0.5 * (F.cross_entropy(sim, labels) + F.cross_entropy(sim.T, labels))
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-3)  # XLA vs torch f32 exp rounding, amplified by the temperature scale


def test_clip_loss_with_cache_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B, D, C = 8, 16, 24
    a = rng.normal(size=(B, D)).astype(np.float32)
    b = rng.normal(size=(B, D)).astype(np.float32)
    cache_np = rng.normal(size=(C, D)).astype(np.float32)
    cache_np /= np.linalg.norm(cache_np, axis=1, keepdims=True)
    ls = np.float32(np.log(1 / 0.07))

    loss, _ = infonce.clip_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(ls),
        cache=jnp.asarray(cache_np), cache_len=jnp.int32(C),
    )

    ta = F.normalize(torch.tensor(a), dim=-1)
    tb = F.normalize(torch.tensor(b), dim=-1)
    scale = torch.tensor(ls).exp().clamp(max=100)
    sim = scale * ta @ tb.T
    sim_cache = scale * ta @ torch.tensor(cache_np).T
    combined = torch.cat([sim, sim_cache], dim=1)
    labels = torch.arange(B)
    expected = 0.5 * (
        F.cross_entropy(combined, labels) + F.cross_entropy(sim.T, labels)
    )
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-3)  # XLA vs torch f32 exp rounding, amplified by the temperature scale


def test_label_smoothing_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B = 12
    logits = rng.normal(size=(B, B)).astype(np.float32)
    labels = np.arange(B)
    got = infonce._cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1).mean()
    # torch label_smoothing spreads s/n over all classes incl. target;
    # reference built s/(n-1) off-target + (1-s) target (old/clip_opt.py:144-147),
    # so compare against an explicit soft-target CE.
    t = torch.tensor(logits)
    n = B
    soft = torch.full((B, n), 0.1 / (n - 1))
    soft[torch.arange(B), torch.tensor(labels)] = 0.9
    expected = (-soft * F.log_softmax(t, dim=1)).sum(1).mean()
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-4)


def test_global_matches_local(mesh8, rng):
    """shard_map global-batch loss == single-device loss on the full batch."""
    B, D = 64, 32
    a = rng.normal(size=(B, D)).astype(np.float32)
    b = rng.normal(size=(B, D)).astype(np.float32)
    ls = jnp.asarray(np.float32(2.0))

    ref_loss, ref_metrics = infonce.clip_loss(jnp.asarray(a), jnp.asarray(b), ls)

    def f(a_l, b_l):
        loss, metrics = infonce.global_clip_loss(a_l, b_l, ls, axis_name="data")
        return loss, metrics["accuracy"]

    shmap = jax.shard_map(
        f,
        mesh=mesh8.mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P(), P()),
    )
    loss, acc = shmap(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(float(acc), float(ref_metrics["accuracy"]), rtol=1e-4)


def test_update_cache_semantics():
    """Ring-buffer semantics of old/clip_opt.py:76-81: reset-to-0 on overflow."""
    cache = jnp.zeros((10, 4))
    ptr = jnp.int32(0)
    x1 = jnp.ones((4, 4))
    cache, ptr, filled = infonce.update_cache(cache, ptr, x1)
    assert int(ptr) == 4 and int(filled) == 4
    assert np.allclose(np.asarray(cache[:4]), 1.0)
    x2 = 2 * jnp.ones((4, 4))
    cache, ptr, filled = infonce.update_cache(cache, ptr, x2)
    assert int(ptr) == 8
    # next write of 4 would overflow 10 -> ptr resets to 0 first
    x3 = 3 * jnp.ones((4, 4))
    cache, ptr, filled = infonce.update_cache(cache, ptr, x3)
    assert int(ptr) == 4
    assert np.allclose(np.asarray(cache[:4]), 3.0)
    assert np.allclose(np.asarray(cache[4:8]), 2.0)


def test_l2_normalize():
    x = jnp.array([[3.0, 4.0], [0.0, 0.0]])
    z = infonce.l2_normalize(x)
    np.testing.assert_allclose(np.asarray(z[0]), [0.6, 0.8], rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(z)))  # zero vector stays finite


@pytest.mark.slow
def test_multiway_global_matches_local(mesh8, rng):
    """multiway_clip_loss(axis_name=...) inside shard_map == the full-batch
    local 3-way loss (the reference gathers for every CLIP variant,
    old/clip_opt.py:102-112)."""
    import jax
    from jax.sharding import PartitionSpec as P

    embs = {
        "cell": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
        "pert": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
        "protein": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
    }
    ls = jnp.asarray(np.float32(2.0))
    from clip_dplm_tpu.ops.infonce import multiway_clip_loss
    ref, _ = multiway_clip_loss(embs, ls)

    def f(e):
        loss, _ = multiway_clip_loss(e, ls, axis_name="data")
        return loss

    got = jax.shard_map(
        f, mesh=mesh8.mesh,
        in_specs=({"cell": P("data"), "pert": P("data"), "protein": P("data")},),
        out_specs=P(),
    )(embs)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_cross_entropy_smoothing_ignores_masked_columns(rng):
    """Label smoothing must spread only over valid (non -1e30) columns:
    appending fully-masked columns leaves the smoothed CE unchanged."""
    logits = jnp.asarray(rng.normal(size=(8, 12)).astype(np.float32))
    labels = jnp.arange(8, dtype=jnp.int32)
    base = infonce._cross_entropy(logits, labels, label_smoothing=0.1)
    padded = jnp.concatenate(
        [logits, jnp.full((8, 5), -1e30, jnp.float32)], axis=1)
    got = infonce._cross_entropy(padded, labels, label_smoothing=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-5)
