"""On-TPU probe for the fused dense block: fwd-only and full-step timing,
fused vs unfused, plus block-size sweep. Honest methodology per CLAUDE.md:
chained lax.scan with carry threaded through the computation + host fetch.

Usage: timeout 560 python scripts/tpu_fused_dense_probe.py [fwd|step|blocks]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from clip_dplm_tpu.config import Config, apply_overrides


def base_cfg(extra=()):
    return apply_overrides(
        Config(),
        [
            "tower_a.input_dim=256", "tower_a.hidden_size=1024",
            "tower_a.num_hidden_layers=3",
            "tower_b.input_dim=1280", "tower_b.hidden_size=1024",
            "tower_b.num_hidden_layers=3",
            "projection.dim=512",
            "train.batch_size=8192",
            "train.optim.total_steps=1000",
            "contrastive.use_fused_kernel=true",
            "train.rng_impl=unsafe_rbg",
            "train.optim.moment_dtype=bfloat16",
        ] + list(extra),
    )


FUSED = [
    "tower_a.fused_dense=true", "tower_b.fused_dense=true",
    "projection.fused_dense=true",
]


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        # host fetch is the only honest sync through the tunnel
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def make_batch(cfg, B):
    rng = np.random.default_rng(0)
    return {
        "a": jnp.asarray(rng.normal(size=(B, cfg.tower_a.input_dim)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(B, cfg.tower_b.input_dim)).astype(np.float32)),
    }


def probe_fwd(K=50):
    from clip_dplm_tpu.models import TwoTowerCLIP

    B = 8192
    for label, extra in [("unfused", []), ("fused", FUSED)]:
        cfg = base_cfg(extra)
        model = TwoTowerCLIP(cfg=cfg)
        batch = make_batch(cfg, B)
        params = model.init(jax.random.PRNGKey(0), batch)["params"]

        @jax.jit
        def chain(params, batch):
            def body(carry, _):
                out = model.apply(
                    {"params": params},
                    {"a": batch["a"] + carry, "b": batch["b"] + carry},
                    deterministic=True,
                )
                # thread the carry through the output so nothing hoists,
                # touching BOTH towers so neither is dead-code-eliminated
                return (
                    (out["emb_a"][:, :1] + out["emb_b"][:, :1]) * 1e-6,
                    out["emb_a"][0, 0] + out["emb_b"][0, 0],
                )
            c, outs = jax.lax.scan(body, jnp.zeros((B, 1)), None, length=K)
            return outs[-1] + c[0, 0]

        dt = timeit(chain, params, batch) / K
        print(f"fwd {label}: {dt*1e3:.3f} ms")


def probe_step(K=100):
    from clip_dplm_tpu.models import TwoTowerCLIP
    from clip_dplm_tpu.train import create_train_state, make_train_step

    B = 8192
    for label, extra in [("unfused", []), ("fused", FUSED)]:
        cfg = base_cfg(extra)
        model = TwoTowerCLIP(cfg=cfg)
        batch = make_batch(cfg, B)
        state = create_train_state(model, cfg, batch)
        step = make_train_step(cfg)

        @jax.jit
        def multi(state, batch):
            def body(s, _):
                s, m = step(s, batch)
                return s, m["loss"]
            state, losses = jax.lax.scan(body, state, None, length=K)
            return state, losses[-1]

        state, _ = multi(state, batch)
        float(_)
        t0 = time.perf_counter()
        state, loss = multi(state, batch)
        float(loss)
        dt = (time.perf_counter() - t0) / K
        print(f"step {label}: {dt*1e3:.3f} ms")


def probe_blocks(K=50):
    """Sweep fwd-kernel block sizes on the projection fc1 geometry."""
    from clip_dplm_tpu.ops import fused_dense as fd

    B, Kdim, N = 8192, 1024, 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, Kdim)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(Kdim, N)).astype(np.float32) * 0.02)
    b = jnp.zeros((N,), jnp.float32)
    g = jnp.ones((N,), jnp.float32)
    bt = jnp.zeros((N,), jnp.float32)

    from clip_dplm_tpu.ops.fused_dense import fused_dense_reference

    @jax.jit
    def xla_chain(x, w):
        def body(c, _):
            y = fused_dense_reference(
                x + c, w, b, g, bt, order="ln_act", act="gelu",
                out_dtype=jnp.bfloat16,
            )
            return y[:, :1].astype(jnp.float32) * 1e-6, y[0, 0]
        c, outs = jax.lax.scan(body, jnp.zeros((B, 1)), None, length=K)
        return outs[-1].astype(jnp.float32) + c[0, 0]

    dt = timeit(xla_chain, x, w) / K
    print(f"fwd fc1 XLA reference: {dt*1e3:.3f} ms")

    for bm in (128, 256, 512):
        for bk in (256, 512, 1024):
            @jax.jit
            def chain(x, w):
                def body(c, _):
                    y = fd.fused_dense_norm_act(
                        x + c, w, b, g, bt, order="ln_act", act="gelu",
                        out_dtype=jnp.bfloat16, block_m=bm, block_k=bk,
                    )
                    return y[:, :1].astype(jnp.float32) * 1e-6, y[0, 0]
                c, outs = jax.lax.scan(body, jnp.zeros((B, 1)), None, length=K)
                return outs[-1].astype(jnp.float32) + c[0, 0]

            try:
                dt = timeit(chain, x, w) / K
                print(f"fwd fc1 bm={bm} bk={bk}: {dt*1e3:.3f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"fwd fc1 bm={bm} bk={bk}: FAIL {type(e).__name__}")


def probe_gradblocks(K=50):
    """fwd+bwd of one fused block vs the XLA reference, block_m sweep for
    the backward epilogue kernel."""
    from clip_dplm_tpu.ops import fused_dense as fd

    B, Kdim, N = 8192, 1024, 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, Kdim)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(Kdim, N)).astype(np.float32) * 0.02)
    b = jnp.zeros((N,), jnp.float32)
    g = jnp.ones((N,), jnp.float32)
    bt = jnp.zeros((N,), jnp.float32)

    def run(label, f):
        @jax.jit
        def chain(x, w):
            def body(c, _):
                def loss(w):
                    y = f(x + c, w)
                    return jnp.sum(y.astype(jnp.float32) * 1e-6)
                l, dw = jax.value_and_grad(loss)(w)
                return jnp.full((B, 1), dw[0, 0] * 1e-6), l
            c, outs = jax.lax.scan(body, jnp.zeros((B, 1)), None, length=K)
            return outs[-1] + c[0, 0]

        dt = timeit(chain, x, w) / K
        print(f"fwd+bwd fc0 {label}: {dt*1e3:.3f} ms")

    run("XLA", lambda x, w: fd.fused_dense_reference(
        x, w, b, g, bt, order="ln_act", act="gelu", out_dtype=jnp.bfloat16))
    for bm in (128, 256, 512):
        run(f"fused bm={bm}", lambda x, w, bm=bm: fd.fused_dense_norm_act(
            x, w, b, g, bt, order="ln_act", act="gelu",
            out_dtype=jnp.bfloat16, block_m=bm))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "step"
    {"fwd": probe_fwd, "step": probe_step, "blocks": probe_blocks,
     "gradblocks": probe_gradblocks}[which]()
