"""Head-to-head: fused_short_attention vs XLA split/attend/merge at the
flagship shape (B=1024, S=128, D=512, H=8), fwd and fwd+bwd, block_b sweep."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from clip_dplm_tpu.ops.short_attention import (
        fused_short_attention, short_attention_reference,
    )

    B = int(os.environ.get("BENCH_B", 1024))
    S = int(os.environ.get("BENCH_S", 128))
    D = int(os.environ.get("BENCH_D", 512))
    H = int(os.environ.get("BENCH_H", 8))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32), jnp.bfloat16)
    lens = rng.integers(S // 2, S + 1, B)
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

    def chain(body):
        @jax.jit
        def run(q, k, v):
            def f(c, _):
                out = body(q + c.astype(q.dtype), k, v)
                return jnp.sum(out).astype(jnp.float32) * 1e-9, ()
            c, _ = jax.lax.scan(f, jnp.float32(0.0), None, length=iters)
            return c
        return run

    def chain_grad(body):
        def loss(q, k, v):
            return jnp.sum(body(q, k, v).astype(jnp.float32))
        g = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def run(q, k, v):
            def f(c, _):
                gq, gk, gv = g(q + c.astype(q.dtype), k, v)
                return (jnp.sum(gq) + jnp.sum(gk) + jnp.sum(gv)).astype(
                    jnp.float32) * 1e-9, ()
            c, _ = jax.lax.scan(f, jnp.float32(0.0), None, length=iters)
            return c
        return run

    do_grad = os.environ.get("BENCH_GRAD", "1") == "1"
    do_xla = os.environ.get("BENCH_XLA", "1") == "1"
    gs = [int(g) for g in os.environ.get("BENCH_GS", "4,8").split(",")]

    xla = lambda q, k, v: short_attention_reference(q, k, v, H, mask=mask)
    print(f"shape B={B} S={S} D={D} H={H}  ({iters}-scan)", flush=True)
    if do_xla:
        print("xla fwd:     ", round(timed(chain(xla), q, k, v, iters=iters) * 1e3, 3), "ms", flush=True)
        if do_grad:
            print("xla fwd+bwd: ", round(timed(chain_grad(xla), q, k, v, iters=iters) * 1e3, 3), "ms", flush=True)

    layouts = os.environ.get("BENCH_LAYOUTS", "bhsd").split(",")
    for layout in layouts:
        for G in gs:
            if B % G:
                continue
            fused = lambda q, k, v, G=G, L=layout: fused_short_attention(
                q, k, v, H, mask=mask, block_b=G, layout=L)
            t1 = timed(chain(fused), q, k, v, iters=iters)
            print(f"fused {layout} G={G:2d} fwd: {t1 * 1e3:7.3f} ms", flush=True)
            if do_grad:
                t2 = timed(chain_grad(fused), q, k, v, iters=iters)
                print(f"fused {layout} G={G:2d} fwd+bwd: {t2 * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
