"""Host input-pipeline benchmark: can the host FEED the device at the
benched step rates? (VERDICT r4 item 2 — every prior bench timed
device-resident batches.)

Measures, at the two tracked geometries (headline two-tower B=8192 vectors;
flagship rna_rbp B=1024 token batches):

  1. host-only batch assembly — the real collate/augment path
     (PairedEmbeddingDataset gaussian-noise augment; TokenPairDataset
     pad-and-stack collation), batches/s and MB/s;
  2. host->device feed through `DevicePrefetcher` (the double-buffered
     transfer thread the Trainer uses), f32 and bf16-cast-on-host variants
     (feeding bf16 halves wire bytes; the towers' first op casts to bf16
     anyway, so the device program is unchanged);
  3. end-to-end training: the real `make_train_step` dispatched per batch
     with the prefetcher feeding, sustained steps/s;
  4. the tunnel's per-dispatch overhead (a trivial jit called in a fetch
     loop) — the environment artifact that bounds ANY per-batch dispatch
     loop on this tunnel, reported so (3) can be read honestly: on a real
     TPU VM the dispatch charge is tens of microseconds, here ~50 ms.

Device-resident reference rates come from the certified benches
(BENCH_r04.json: 913,038 pairs/s -> 111.5 steps/s at B=8192; 8,771 -> 8.56
steps/s at B=1024).

Writes evidence/host_pipeline_r5.json.
Env: HP_PARTS=headline,flagship  HP_BATCHES=24  BENCH_FORCE_PLATFORM=cpu
for a smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # also applies BENCH_FORCE_PLATFORM

import jax
import jax.numpy as jnp
import numpy as np

_enable_compile_cache()

EVIDENCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "evidence")


def _progress(msg):
    print(f"[host_pipeline] {msg}", file=sys.stderr, flush=True)


def batch_mb(batch) -> float:
    return sum(np.asarray(v).nbytes for v in batch.values()) / 1e6


def cycle(make_iter):
    while True:
        for b in make_iter():
            yield b


def take(it, n):
    for _ in range(n):
        yield next(it)


def measure_host_only(make_iter, n: int) -> dict:
    it = cycle(make_iter)
    first = next(it)  # warm caches / lazy init outside the timed region
    t0 = time.perf_counter()
    for b in take(it, n):
        pass
    dt = time.perf_counter() - t0
    mb = batch_mb(first)
    return {"batches_per_s": round(n / dt, 2), "batch_mb": round(mb, 1),
            "mb_per_s": round(n / dt * mb, 1)}


def measure_feed(make_iter, n: int, cast_bf16: bool) -> dict:
    """Host->device rate through DevicePrefetcher; completion forced by one
    host fetch touching every delivered batch (the only honest sync on this
    tunnel)."""
    from clip_dplm_tpu.data.prefetch import DevicePrefetcher

    transform = None
    if cast_bf16:
        import ml_dtypes

        def transform(b):
            return {k: (v.astype(ml_dtypes.bfloat16)
                        if v.dtype == np.float32 else v)
                    for k, v in b.items()}

    pf = DevicePrefetcher(cycle(make_iter), depth=2, transform=transform)
    first = next(pf)  # covers worker spin-up + first transfer
    probes = [jax.tree_util.tree_leaves(first)[0].ravel()[0]]
    t0 = time.perf_counter()
    for b in take(pf, n):
        probes.append(jax.tree_util.tree_leaves(b)[0].ravel()[0])
    total = float(jnp.sum(jnp.stack([p.astype(jnp.float32) for p in probes])))
    dt = time.perf_counter() - t0
    pf.close()
    assert np.isfinite(total)
    # `first` is the DELIVERED device batch, so its nbytes already reflect
    # the wire dtype (bf16 after the cast transform)
    mb = batch_mb(first)
    return {"batches_per_s": round(n / dt, 2), "wire_batch_mb": round(mb, 1),
            "mb_per_s": round(n / dt * mb, 1)}


def measure_e2e(cfg, model, make_iter, n: int) -> dict:
    from clip_dplm_tpu.data.prefetch import DevicePrefetcher
    from clip_dplm_tpu.train import create_train_state, make_train_step

    pf = DevicePrefetcher(cycle(make_iter), depth=2)
    first = next(pf)
    state = create_train_state(model, cfg, first)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    state, metrics = step(state, first)  # compile
    float(metrics["loss"])
    _progress("e2e: compiled; timing")
    t0 = time.perf_counter()
    for b in take(pf, n):
        state, metrics = step(state, b)
    loss = float(metrics["loss"])  # forces the whole chain
    dt = time.perf_counter() - t0
    pf.close()
    assert np.isfinite(loss)
    return {"steps_per_s": round(n / dt, 3),
            "ms_per_step": round(dt / n * 1e3, 1)}


def measure_dispatch_overhead(n: int = 20) -> dict:
    """Per-call charge of a trivial dispatch+fetch on this backend."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    x = f(x)
    float(x[0])
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        float(x[0])
    dt = time.perf_counter() - t0
    return {"ms_per_dispatch_fetch": round(dt / n * 1e3, 2)}


def headline(n: int) -> dict:
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.data.synthetic import PairedEmbeddingDataset
    from clip_dplm_tpu.models import TwoTowerCLIP

    B = int(os.environ.get("HP_B", 8192))
    cfg = apply_overrides(Config(), [
        "tower_a.input_dim=256", "tower_a.hidden_size=1024",
        "tower_a.num_hidden_layers=3",
        "tower_b.input_dim=1280", "tower_b.hidden_size=1024",
        "tower_b.num_hidden_layers=3",
        "projection.dim=512", f"train.batch_size={B}",
        "train.optim.total_steps=1000",
        "contrastive.use_fused_kernel=true", "train.rng_impl=unsafe_rbg",
        "train.optim.moment_dtype=bfloat16",
        "tower_a.fused_dense=true", "tower_b.fused_dense=true",
        "projection.fused_dense=true",
    ])
    _progress(f"headline: building dataset (B={B})")
    ds = PairedEmbeddingDataset.synthetic(
        n=8 * B, dim_a=256, dim_b=1280, noise=0.1)
    ds.gaussian_noise = 0.01  # the run1 GaussianNoise augment path
    ds.labels = None  # the two_tower step consumes {a, b} batches
    epoch = [0]

    def make_iter():
        epoch[0] += 1
        return ds.batches(B, seed=epoch[0], shuffle=True, train=True)

    out = {"batch_size": B}
    out["host_only"] = measure_host_only(make_iter, n)
    _progress(f"headline host_only: {out['host_only']}")
    out["feed_f32"] = measure_feed(make_iter, n, cast_bf16=False)
    _progress(f"headline feed_f32: {out['feed_f32']}")
    out["feed_bf16"] = measure_feed(make_iter, n, cast_bf16=True)
    _progress(f"headline feed_bf16: {out['feed_bf16']}")
    out["e2e"] = measure_e2e(cfg, TwoTowerCLIP(cfg=cfg), make_iter, n)
    _progress(f"headline e2e: {out['e2e']}")
    # the certified rate was measured at B=8192 ONLY; at any other HP_B the
    # division would fabricate a reference (pairs/s is not B-invariant)
    if B == 8192:
        out["device_resident_steps_per_s"] = round(913038 / B, 2)  # BENCH r4
    return out


def flagship(n: int) -> dict:
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.data.collate import TokenPairDataset
    from clip_dplm_tpu.models.token_towers import RNARBPCLIP

    B = int(os.environ.get("HP_FB", 1024))
    sa = sb = 127
    cfg = apply_overrides(Config(), [
        "experiment=rna_rbp",
        "rna_tower.input_dim=120", "rna_tower.d_model=512",
        "rna_tower.num_layers=3", "rna_tower.num_heads=8",
        f"rna_tower.max_len={sa + 1}",
        "rbp_tower.input_dim=1280", "rbp_tower.d_model=512",
        "rbp_tower.num_layers=3", "rbp_tower.num_heads=8",
        f"rbp_tower.max_len={sb + 1}",
        "train.optim.fused_update=true", "projection.dim=512",
        f"train.batch_size={B}", "train.optim.total_steps=1000",
        "train.optim.moment_dtype=bfloat16",
        "contrastive.use_fused_kernel=true", "train.rng_impl=unsafe_rbg",
        "projection.fused_dense=true",
    ])
    _progress(f"flagship: building token dataset (B={B})")
    # 4*B variable-length pairs; per batch the REAL collate runs: shuffle,
    # gather, pad-and-stack to the (B, 127, D) static shape
    ds = TokenPairDataset.synthetic(
        4 * B, dim_a=120, dim_b=1280, len_range_a=(40, sa),
        len_range_b=(60, sb), noise=0.5, seed=0)
    epoch = [0]

    def make_iter():
        epoch[0] += 1
        return ds.batches(B, seed=epoch[0], shuffle=True,
                          pad_to_a=sa, pad_to_b=sb)

    out = {"batch_size": B}
    out["host_only"] = measure_host_only(make_iter, n)
    _progress(f"flagship host_only: {out['host_only']}")
    out["feed_f32"] = measure_feed(make_iter, n, cast_bf16=False)
    _progress(f"flagship feed_f32: {out['feed_f32']}")
    out["feed_bf16"] = measure_feed(make_iter, n, cast_bf16=True)
    _progress(f"flagship feed_bf16: {out['feed_bf16']}")
    out["e2e"] = measure_e2e(cfg, RNARBPCLIP(cfg=cfg), make_iter, n)
    _progress(f"flagship e2e: {out['e2e']}")
    if B == 1024:  # see the headline note: certified at this B only
        out["device_resident_steps_per_s"] = round(8771 / B, 2)  # BENCH r4
    return out


def main():
    parts = os.environ.get("HP_PARTS", "headline,flagship").split(",")
    n = int(os.environ.get("HP_BATCHES", 24))
    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "n_batches_timed": n,
        "dispatch_overhead": measure_dispatch_overhead(),
    }
    _progress(f"dispatch overhead: {out['dispatch_overhead']}")
    if "headline" in parts:
        out["headline_two_tower"] = headline(n)
    if "flagship" in parts:
        out["flagship_rna_rbp"] = flagship(n)
    os.makedirs(EVIDENCE, exist_ok=True)
    path = os.path.join(EVIDENCE, "host_pipeline_r5.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
