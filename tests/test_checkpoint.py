import jax
import numpy as np
import pytest

from clip_dplm_tpu.config import Config, apply_overrides
from clip_dplm_tpu.data import PairedEmbeddingDataset
from clip_dplm_tpu.models import TwoTowerCLIP
from clip_dplm_tpu.train import create_train_state, make_train_step
from clip_dplm_tpu.train.checkpoint import CheckpointManager


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    cfg = apply_overrides(
        Config(),
        [
            "tower_a.input_dim=16", "tower_a.hidden_size=32",
            "tower_b.input_dim=16", "tower_b.hidden_size=32",
            "projection.dim=16", "train.optim.total_steps=50",
        ],
    )
    model = TwoTowerCLIP(cfg=cfg)
    ds = PairedEmbeddingDataset.synthetic(32, 16, 16)
    batch = {k: v for k, v in next(ds.batches(16, shuffle=False)).items() if k != "labels"}
    state = create_train_state(model, cfg, batch)
    step = jax.jit(make_train_step(cfg))
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(state, int(state.step))

    fresh = create_train_state(model, cfg, batch)
    restored = mgr.restore(fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too -> next step identical
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_async_save_restore(tmp_path):
    """async_save returns before the write is durable; wait()/restore barrier.

    Uses a tiny raw pytree via the same manager the Trainer uses (production
    overlap feature: Orbax background write threads)."""
    import dataclasses

    import jax.numpy as jnp

    @dataclasses.dataclass
    class FakeState:
        params: dict
        opt_state: tuple
        rng: object
        step: object
        cache: None = None
        cache_ptr: None = None
        cache_len: None = None

        def replace(self, **kw):
            return dataclasses.replace(self, **kw)

    state = FakeState(
        params={"w": jnp.arange(8.0)},
        opt_state=(),
        rng=jnp.zeros((4,), jnp.uint32),
        step=jnp.asarray(7, jnp.int32),
    )
    mgr = CheckpointManager(str(tmp_path / "ackpt"), keep=2, async_save=True)
    mgr.save(state, 7)
    mgr.wait()
    fresh = state.replace(params={"w": jnp.zeros(8)}, step=jnp.asarray(0, jnp.int32))
    assert mgr.latest_step() == 7
    restored = mgr.restore(fresh)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(8.0))
    assert int(restored.step) == 7
    # a second async save followed directly by restore must see step 9
    mgr.save(state.replace(step=jnp.asarray(9, jnp.int32)), 9)
    restored = mgr.restore(fresh)
    assert int(restored.step) == 9
    mgr.close()


def test_preemption_signal_saves_live_state(tmp_path):
    """SIGTERM mid-epoch (simulated on SIGUSR1) latches the guard, the
    Trainer saves the LIVE state at step granularity, stops, and a restore
    resumes exactly at the preempted step (train/preemption.py)."""
    import os
    import signal

    from clip_dplm_tpu.models import TwoTowerCLIP as _M
    from clip_dplm_tpu.train import PreemptionGuard, Trainer

    cfg = apply_overrides(
        Config(),
        [
            "tower_a.input_dim=16", "tower_a.hidden_size=32",
            "tower_b.input_dim=16", "tower_b.hidden_size=32",
            "projection.dim=16", "train.optim.total_steps=50",
            "train.early_stopping_patience=100",
        ],
    )
    model = _M(cfg=cfg)
    ds = PairedEmbeddingDataset.synthetic(64, 16, 16)
    batch0 = {k: v for k, v in next(ds.batches(16, shuffle=False)).items()
              if k != "labels"}
    state = create_train_state(model, cfg, batch0)
    trainer = Trainer(cfg, state, checkpoint_dir=str(tmp_path / "ckpt"))
    guard = PreemptionGuard(signals=(signal.SIGUSR1,))

    def train_batches():
        for i, b in enumerate(ds.batches(16, seed=0)):
            if i == 2:  # the real delivery path: a signal, not request()
                os.kill(os.getpid(), signal.SIGUSR1)
            yield {k: v for k, v in b.items() if k != "labels"}

    with guard:
        history = trainer.train(
            lambda: train_batches(), num_epochs=5, preemption_guard=guard)

    # stopped mid-run: no epoch ever completed, and the preempted step is
    # recorded (exact step depends on how far the prefetcher ran ahead of
    # the consumer when the signal landed)
    assert history["train_loss"] == []
    assert len(history["preempted_at_step"]) == 1
    saved_step = history["preempted_at_step"][0]
    assert 1 <= saved_step <= 4

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    fresh = create_train_state(model, cfg, batch0)
    restored = mgr.restore(fresh)
    assert int(restored.step) == saved_step


def test_preemption_guard_chains_and_restores_handlers():
    import signal

    from clip_dplm_tpu.train.preemption import PreemptionGuard

    seen = []
    prev = signal.signal(signal.SIGUSR2, lambda s, f: seen.append(s))
    try:
        with PreemptionGuard(signals=(signal.SIGUSR2,)) as g:
            import os

            os.kill(os.getpid(), signal.SIGUSR2)
            assert g.requested
            assert seen == [signal.SIGUSR2]  # chained to the prior handler
        assert signal.getsignal(signal.SIGUSR2).__name__ == "<lambda>"
    finally:
        signal.signal(signal.SIGUSR2, prev)


def test_train_step_exception_closes_prefetcher():
    """An exception escaping train_step must not leave the prefetch worker
    blocked on a full queue (trainer closes the prefetcher in a finally);
    an abandoned worker would pin `depth` device-resident batches forever."""
    from clip_dplm_tpu.train import Trainer

    cfg = apply_overrides(
        Config(),
        [
            "tower_a.input_dim=16", "tower_a.hidden_size=32",
            "tower_b.input_dim=16", "tower_b.hidden_size=32",
            "projection.dim=16", "train.optim.total_steps=50",
        ],
    )
    model = TwoTowerCLIP(cfg=cfg)
    ds = PairedEmbeddingDataset.synthetic(32, 16, 16)
    batch0 = {k: v for k, v in next(ds.batches(16, shuffle=False)).items()
              if k != "labels"}
    state = create_train_state(model, cfg, batch0)
    trainer = Trainer(cfg, state)

    def boom(state, batch):
        raise RuntimeError("boom")

    trainer.train_step = boom

    captured = []
    orig_prefetched = trainer._prefetched

    def capture(batches):
        pf = orig_prefetched(batches)
        captured.append(pf)
        return pf

    trainer._prefetched = capture

    def endless_batches():
        # long enough that the worker is mid-stream (blocked on the depth-2
        # queue) when train_step raises — the hazard the finally covers
        while True:
            yield batch0

    with pytest.raises(RuntimeError, match="boom"):
        trainer.train(lambda: endless_batches(), num_epochs=1)
    (pf,) = captured
    pf._thread.join(timeout=2.0)
    assert not pf._thread.is_alive()


def test_preemption_poll_interval_multihost(monkeypatch):
    """Multi-host, the flag agreement is a collective and must only run at
    the deterministic poll boundary (every preemption_poll_batches), not
    per batch — and the save happens at that boundary."""
    from clip_dplm_tpu.train import Trainer

    cfg = apply_overrides(
        Config(),
        [
            "tower_a.input_dim=16", "tower_a.hidden_size=32",
            "tower_b.input_dim=16", "tower_b.hidden_size=32",
            "projection.dim=16", "train.optim.total_steps=50",
            "train.preemption_poll_batches=4",
        ],
    )
    model = TwoTowerCLIP(cfg=cfg)
    ds = PairedEmbeddingDataset.synthetic(32, 16, 16)
    batch0 = {k: v for k, v in next(ds.batches(16, shuffle=False)).items()
              if k != "labels"}
    state = create_train_state(model, cfg, batch0)
    trainer = Trainer(cfg, state)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    class FakeGuard:
        calls = 0

        def requested_globally(self):
            FakeGuard.calls += 1
            return True  # "preempted" from the very first agreement

    def batches():
        for _ in range(16):
            yield batch0

    history = trainer.train(
        lambda: batches(), num_epochs=1, preemption_guard=FakeGuard())
    # flag latched before batch 0, but the collective only runs at the 4th
    # batch — exactly one agreement call, save at step 4
    assert FakeGuard.calls == 1
    assert history["preempted_at_step"] == [4]


def test_preemption_requested_globally_single_process():
    """Single-process jobs (and this CPU-mesh test env) must reduce to the
    local flag with no collective (preemption.py::requested_globally)."""
    from clip_dplm_tpu.train.preemption import PreemptionGuard

    g = PreemptionGuard(signals=())
    assert g.requested_globally() is False
    g.request()
    assert g.requested_globally() is True
