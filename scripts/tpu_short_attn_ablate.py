"""Ablate the short-attention kernel inner loop at the flagship shape:
which part of the per-(g,h) work dominates — matmuls, the row-max, or the
exp/normalize? Variants (bhsd layout, G=8):

  mm    : scores matmul -> second matmul directly (no softmax at all)
  noexp : + bias add and row-sum normalize, no exp/max (linear 'softmax')
  nomax : full softmax but constant shift instead of the row max
  full  : the real kernel
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, heads, scale, g_rows,
           variant):
    for g in range(g_rows):
        bias = bias_ref[g]
        for h in range(heads):
            q = q_ref[g, h]
            k = k_ref[g, h]
            v = v_ref[g, h]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if variant == "mm":
                p = s
            elif variant == "noexp":
                s = s + bias
                l = jnp.maximum(jnp.sum(s, axis=-1, keepdims=True), 1e-30)
                p = s / l
            elif variant == "nomax":
                s = s + bias
                p = jnp.exp(s - 20.0)
                l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
                p = p / l
            else:  # full
                s = s + bias
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
                p = p / l
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[g, h] = o.astype(o_ref.dtype)


def timed(fn, *args, iters):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    B, S, H, Dh = 1024, 128, 8, 64
    G = int(os.environ.get("BENCH_G", 8))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, Dh)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, Dh)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, Dh)).astype(np.float32), jnp.bfloat16)
    bias = jnp.zeros((B, 1, S), jnp.float32)

    io = pl.BlockSpec((G, H, S, Dh), lambda i: (i, 0, 0, 0))
    bias_spec = pl.BlockSpec((G, 1, S), lambda i: (i, 0, 0))
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    variants = os.environ.get("BENCH_VARIANTS", "mm,noexp,nomax,full").split(",")
    for variant in variants:
        kern = functools.partial(kernel, heads=H, scale=0.125, g_rows=G,
                                 variant=variant)
        call = pl.pallas_call(
            kern, grid=(B // G,), in_specs=[io, io, io, bias_spec],
            out_specs=io, out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=params)

        @jax.jit
        def run(q, k, v):
            def f(c, _):
                out = call(q + c.astype(q.dtype), k, v, bias)
                return jnp.sum(out).astype(jnp.float32) * 1e-9, ()
            c, _ = jax.lax.scan(f, jnp.float32(0.0), None, length=iters)
            return c

        t = timed(run, q, k, v, iters=iters)
        print(f"{variant:6s}: {t * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
