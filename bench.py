"""Headline benchmark: contrastive pairs/sec/chip on the two-tower CLIP train
step (BASELINE.json north star). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = achieved model FLOP/s / (0.95 * chip peak bf16 FLOP/s), i.e.
1.0 == the >=95%-of-roofline target. Model FLOPs are counted analytically
(fwd+bwd ~= 3x fwd) for the exact step being run.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


# chip peak bf16 matmul FLOP/s (dense): v5e ~197 TFLOPs, v5p ~459, v4 ~275.
_PEAK_FLOPS = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6e": 918e12,
    "cpu": 1e11,
}


def chip_peak_flops() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for key, val in _PEAK_FLOPS.items():
        if key in kind:
            return val
    return 197e12


def two_tower_step_flops(cfg, batch: int) -> float:
    """Analytic matmul FLOPs for fwd+bwd of one train step (bwd ~= 2x fwd)."""

    def dense(m, n, k):
        return 2.0 * m * n * k

    def tower(tcfg, B):
        f = dense(B, tcfg.hidden_size, tcfg.input_dim)
        f += (tcfg.num_hidden_layers - 1) * dense(B, tcfg.hidden_size, tcfg.hidden_size)
        return f

    def proj(in_dim, pcfg, B):
        hidden = pcfg.hidden_dim or 4 * pcfg.dim
        f = dense(B, pcfg.dim, in_dim)  # skip
        f += dense(B, hidden, in_dim) + dense(B, hidden, hidden) + dense(B, pcfg.dim, hidden)
        return f

    fwd = tower(cfg.tower_a, batch) + tower(cfg.tower_b, batch)
    fwd += proj(cfg.tower_a.hidden_size, cfg.projection, batch)
    fwd += proj(cfg.tower_b.hidden_size, cfg.projection, batch)
    fwd += dense(batch, batch, cfg.projection.dim)  # B x B similarity
    return 3.0 * fwd


def main() -> None:
    import os

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models import TwoTowerCLIP
    from clip_dplm_tpu.train import create_train_state, make_train_step

    B = int(os.environ.get("BENCH_B", 8192))
    cfg = apply_overrides(
        Config(),
        [
            "tower_a.input_dim=256",
            "tower_a.hidden_size=1024",
            "tower_a.num_hidden_layers=3",
            "tower_b.input_dim=1280",
            "tower_b.hidden_size=1024",
            "tower_b.num_hidden_layers=3",
            "projection.dim=512",
            f"train.batch_size={B}",
            "train.optim.total_steps=1000",
            # fused Pallas InfoNCE: measured 1.1x over the XLA loss at B=8k
            "contrastive.use_fused_kernel=true",
            # hardware RNG for dropout masks: threefry bit-gen costs ~4ms/step
            "train.rng_impl=unsafe_rbg",
        ],
    )
    model = TwoTowerCLIP(cfg=cfg)
    rng = np.random.default_rng(0)
    batch = {
        "a": jnp.asarray(rng.normal(size=(B, cfg.tower_a.input_dim)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(B, cfg.tower_b.input_dim)).astype(np.float32)),
    }
    state = create_train_state(model, cfg, batch)
    step = make_train_step(cfg)

    # The device tunnel only reliably syncs on host fetches, so the benchmark
    # scans `iters` chained train steps inside ONE jit call and fetches the
    # final loss — per-call dispatch overhead is amortized and the timing is
    # forced by the data dependency. The tunnel costs ~35 ms per CALL, so the
    # scan must be long: 20 steps overstated the step by ~1.7 ms (14%);
    # at 100 steps wall time matches the profiler's device-busy time.
    iters = int(os.environ.get("BENCH_ITERS", 100))

    @jax.jit
    def multi_step(state, batch):
        def body(s, _):
            s, metrics = step(s, batch)
            return s, metrics["loss"]
        state, losses = jax.lax.scan(body, state, None, length=iters)
        return state, losses[-1]

    state, loss = multi_step(state, batch)  # compile + warmup
    float(loss)

    t0 = time.perf_counter()
    state, loss = multi_step(state, batch)
    assert np.isfinite(float(loss))
    dt = (time.perf_counter() - t0) / iters

    n_chips = max(1, len(jax.devices()))
    pairs_per_sec_chip = B / dt / n_chips
    flops_per_sec = two_tower_step_flops(cfg, B) / dt / n_chips
    roofline = 0.95 * chip_peak_flops()
    print(
        json.dumps(
            {
                "metric": "contrastive_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec_chip, 2),
                "unit": "pairs/s/chip",
                "vs_baseline": round(flops_per_sec / roofline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
