"""Op-level trace of the flagship RNA<->RBP forward (and optionally the full
step) on the real TPU: runs a scan-chained forward under jax.profiler and
aggregates device-plane op durations — the evidence for killing the
~20 ms/step of unattributed forward time (VERDICT r2, weak #1).

Usage: TRACE_WHAT=fwd|full BENCH_ITERS=20 python scripts/tpu_flagship_trace.py
Prints per-op totals (ms/step) sorted descending, bucketed by op family.
"""

from __future__ import annotations

import glob
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _enable_compile_cache  # repo-local persistent XLA cache

_enable_compile_cache()


def build_two_tower(what: str, iters: int, overrides=()):
    """TRACE_MODEL=two_tower: the headline bench step (bench.py config)."""
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models import TwoTowerCLIP
    from clip_dplm_tpu.train import create_train_state, make_train_step

    B = int(os.environ.get("BENCH_B", 8192))
    cfg = apply_overrides(
        Config(),
        [
            "tower_a.input_dim=256", "tower_a.hidden_size=1024",
            "tower_a.num_hidden_layers=3",
            "tower_b.input_dim=1280", "tower_b.hidden_size=1024",
            "tower_b.num_hidden_layers=3",
            "projection.dim=512",
            f"train.batch_size={B}",
            "train.optim.total_steps=1000",
            "contrastive.use_fused_kernel=true",
            "train.rng_impl=unsafe_rbg",
            "train.optim.moment_dtype=bfloat16",
            "tower_a.fused_dense=true", "tower_b.fused_dense=true",
            "projection.fused_dense=true",
        ] + list(overrides),
    )
    model = TwoTowerCLIP(cfg=cfg)
    rng = np.random.default_rng(0)
    batch = {
        "a": jnp.asarray(rng.normal(size=(B, 256)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(B, 1280)).astype(np.float32)),
    }
    state = create_train_state(model, cfg, batch)
    if what == "full":
        step = make_train_step(cfg)

        @jax.jit
        def run(state, batch):
            def body(s, _):
                s, m = step(s, batch)
                return s, m["loss"]
            state, losses = jax.lax.scan(body, state, None, length=iters)
            return losses[-1]

        return run, (state, batch)

    @jax.jit
    def run(params, b):
        def body(c, _):
            out = model.apply(
                {"params": params},
                {"a": b["a"] + 1e-9 * c, "b": b["b"] + 1e-9 * c},
                deterministic=True)
            return (jnp.sum(out["emb_a"]) + jnp.sum(out["emb_b"])).astype(
                jnp.float32) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    return run, (state.params, batch)


def build_dplm(what: str, iters: int, overrides=()):
    """TRACE_MODEL=dplm: the serving-side sampler chain (tpu_dplm_probe.py
    geometry). `iters` diffusion steps in the sampler's own lax.scan; per-op
    totals divide by iters like the training traces. DPLM_RNG=unsafe_rbg
    switches the Gumbel/noise key impl (threefry is the jax default)."""
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models.dplm import DPLM, sample

    B = int(os.environ.get("DPLM_B", 256))
    length = int(os.environ.get("DPLM_LEN", 126))
    cfg = apply_overrides(Config(), [
        "dplm.d_model=640", "dplm.num_layers=12", "dplm.num_heads=10",
    ] + list(overrides))
    model = DPLM(cfg=cfg.dplm)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8), jnp.int32))["params"]
    impl = os.environ.get("DPLM_RNG", "")
    key = jax.random.key(0, impl=impl) if impl else jax.random.PRNGKey(0)

    @jax.jit
    def run(k):
        toks, logp = sample(model, params, k, B, length, num_steps=iters)
        return jnp.sum(logp)

    return run, (key,)


def build_tf_clip(what: str, iters: int, overrides=()):
    """TRACE_MODEL=tf_clip: the 3-way contrastive train step at the probe
    geometry (scripts/tpu_config_probes.py fixture, PROBE_TF_B rows)."""
    from tpu_config_probes import tf_clip_fixture

    from clip_dplm_tpu.train import make_train_step

    B = int(os.environ.get("PROBE_TF_B", 4096))
    cfg, model, state, batch = tf_clip_fixture(B, overrides)

    if what == "full":
        step = make_train_step(cfg)

        @jax.jit
        def run(state, batch):
            def body(s, _):
                s, m = step(s, batch)
                return s, m["loss"]
            state, losses = jax.lax.scan(body, state, None, length=iters)
            return losses[-1]

        return run, (state, batch)

    @jax.jit
    def run(params, b):
        def body(c, _):
            out = model.apply(
                {"params": params},
                {**b, "cell_state": b["cell_state"] + 1e-9 * c},
                deterministic=True)
            return jnp.sum(out["cell_embed"]).astype(jnp.float32) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    return run, (state.params, batch)


def build(what: str, iters: int, overrides=()):
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models.token_towers import RNARBPCLIP
    from clip_dplm_tpu.train import create_train_state, make_train_step

    B = int(os.environ.get("BENCH_B", 1024))
    sa = sb = 127
    cfg = apply_overrides(
        Config(),
        [
            "experiment=rna_rbp",
            "rna_tower.input_dim=120", "rna_tower.d_model=512",
            "rna_tower.num_layers=3", "rna_tower.num_heads=8",
            f"rna_tower.max_len={sa + 1}",
            "rbp_tower.input_dim=1280", "rbp_tower.d_model=512",
            "rbp_tower.num_layers=3", "rbp_tower.num_heads=8",
            f"rbp_tower.max_len={sb + 1}",
            "train.optim.fused_update=true",
            "projection.dim=512",
            f"train.batch_size={B}",
            "train.optim.total_steps=1000",
            "train.optim.moment_dtype=bfloat16",
            "contrastive.use_fused_kernel=true",
            "train.rng_impl=unsafe_rbg",
            "projection.fused_dense=true",
        ] + list(overrides),
    )
    model = RNARBPCLIP(cfg=cfg)
    rng = np.random.default_rng(0)
    la = rng.integers(sa // 2, sa, B)
    lb = rng.integers(sb // 2, sb, B)
    batch = {
        "rna_tokens": jnp.asarray(rng.normal(size=(B, sa, 120)).astype(np.float32)),
        "rna_mask": jnp.asarray(np.arange(sa)[None, :] < la[:, None]),
        "rbp_tokens": jnp.asarray(rng.normal(size=(B, sb, 1280)).astype(np.float32)),
        "rbp_mask": jnp.asarray(np.arange(sb)[None, :] < lb[:, None]),
    }
    state = create_train_state(model, cfg, batch)

    if what == "full":
        step = make_train_step(cfg)

        @jax.jit
        def run(state, batch):
            def body(s, _):
                s, m = step(s, batch)
                return s, m["loss"]
            state, losses = jax.lax.scan(body, state, None, length=iters)
            return losses[-1]

        return run, (state, batch)

    def perturbed(b, c):
        return {
            "rna_tokens": b["rna_tokens"] + 1e-9 * c,
            "rna_mask": b["rna_mask"],
            "rbp_tokens": b["rbp_tokens"] + 1e-9 * c,
            "rbp_mask": b["rbp_mask"],
        }

    @jax.jit
    def run(params, b):
        def body(c, _):
            out = model.apply({"params": params}, perturbed(b, c),
                              deterministic=True)
            return (jnp.sum(out["emb_a"]) + jnp.sum(out["emb_b"])).astype(
                jnp.float32) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    return run, (state.params, batch)


BUCKETS = [
    ("attention-batch-matmul", re.compile(r"dot.*batch|batch.*dot|BatchMatMul", re.I)),
    ("fusion", re.compile(r"^(loop_)?fusion")),
    ("matmul", re.compile(r"dot|convolution", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("dynamic-slice/update", re.compile(r"dynamic", re.I)),
    ("custom-call (pallas)", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("all-reduce/collective", re.compile(r"all-reduce|all-gather|collective", re.I)),
]


def bucket_of(name: str) -> str:
    for b, pat in BUCKETS:
        if pat.search(name):
            return b
    return "other"


def main():
    what = os.environ.get("TRACE_WHAT", "fwd")
    iters = int(os.environ.get("BENCH_ITERS", 20))
    topk = int(os.environ.get("TRACE_TOPK", 40))
    overrides = [o for o in os.environ.get("BENCH_OVERRIDES", "").split(",") if o]
    builder = {"two_tower": build_two_tower, "dplm": build_dplm,
               "tf_clip": build_tf_clip}.get(
        os.environ.get("TRACE_MODEL", ""), build)
    run, args = builder(what, iters, overrides)

    # warmup/compile
    out = run(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    out = run(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    wall = (time.perf_counter() - t0) / iters
    print(f"{what}: {wall * 1e3:.2f} ms/step (wall, {iters}-scan)", flush=True)

    tdir = tempfile.mkdtemp(prefix="flagship_trace_")
    with jax.profiler.trace(tdir):
        out = run(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    paths = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane written under {tdir}")
    from jax._src.profiler import ProfileData

    pd = ProfileData.from_file(paths[-1])
    per_op = defaultdict(float)
    device_planes = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        device_planes += 1
        for line in plane.lines:
            # keep ONLY the synchronous op timeline ("XLA Ops"): the module,
            # step, async and overlay lines double-count the same intervals
            if line.name != "XLA Ops":
                continue
            print(f"[line] {plane.name} :: {line.name}")
            for ev in line.events:
                if ev.name.startswith("end:"):
                    continue
                name = ev.name
                if name.startswith(("%copy-start", "%copy-done")):
                    name = "(async copies, overlapped)"
                if name.startswith(("jit_", "%while")):
                    name = "(outer wrapper)"
                per_op[name] += ev.duration_ns / 1e6  # ms total
    per_op.pop("(outer wrapper)", None)
    if not device_planes:
        names = [p.name for p in pd.planes]
        raise SystemExit(f"no device plane found; planes: {names}")

    total = sum(per_op.values())
    print(f"device total: {total / iters:.2f} ms/step "
          f"({device_planes} device plane(s))")
    per_bucket = defaultdict(float)
    for name, ms in per_op.items():
        per_bucket[bucket_of(name)] += ms
    print("\n-- buckets (ms/step) --")
    for b, ms in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"  {ms / iters:8.3f}  {b}")
    # scope totals: events are named by their surrounding computation scope
    # (proj_a, tower_b, jvp = the loss custom-VJP, fusion.N = XLA fusions),
    # so the prefix before the first '.'/' ' groups ops per subsystem and
    # catches the long tail the top-k list misses
    per_scope = defaultdict(float)
    for name, ms in per_op.items():
        scope = re.split(r"[. =]", name.lstrip("%"), 1)[0]
        per_scope[scope] += ms
    print("\n-- scope totals (ms/step) --")
    for s, ms in sorted(per_scope.items(), key=lambda kv: -kv[1]):
        if ms / iters >= 0.005:
            print(f"  {ms / iters:8.3f}  {s}")
    print(f"\n-- top {topk} ops (ms/step) --")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:topk]:
        print(f"  {ms / iters:8.3f}  {name[:110]}")
    tail = sorted(per_op.values(), reverse=True)[topk:]
    if tail:
        print(f"  {sum(tail) / iters:8.3f}  (tail: {len(tail)} more ops)")


if __name__ == "__main__":
    main()
