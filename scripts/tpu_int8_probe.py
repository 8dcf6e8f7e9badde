"""Probe: W8A8 (int8 weights + dynamic per-row int8 activations, int32
accumulate) vs bf16 at the DPLM sampler's actual dense shapes.

Two measurements:
  1. raw square matmul int8 vs bf16 (MXU ceiling check)
  2. a full FFN block (d -> 4d -> gelu -> d) at the sampler geometry
     (rows = B*S = 32768, d = 640), including the honest quantize/dequant
     overhead the real W8A8 path would pay.

Timing per CLAUDE.md: chain the carry through the computation inside one
lax.scan jit; sync on a host fetch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_chain(fn, x0, iters=30):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    out = run(x0)
    float(jnp.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    out = run(x0)
    float(jnp.asarray(out).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def _quant_rows(x):
    """dynamic symmetric per-row int8: returns (x8, scale (rows,1) f32)."""
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    s = jnp.maximum(s, 1e-8)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return x8, s


def _int8_dot(x8, w8):
    return jax.lax.dot_general(
        x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def main():
    rng = np.random.default_rng(0)

    # --- 1. square matmul ceiling -----------------------------------------
    M = N = K = 4096
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    wb = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32), jnp.bfloat16)
    xb0 = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
    x80 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))

    flops = 2.0 * M * N * K
    dt_b = _time_chain(
        lambda x: (jnp.dot(x, wb) * (1.0 / K)).astype(jnp.bfloat16), xb0)
    dt_8 = _time_chain(
        lambda x: jnp.clip(_int8_dot(x, w8) >> 7, -127, 127).astype(jnp.int8),
        x80)
    print(f"square bf16: {dt_b*1e3:.3f} ms {flops/dt_b/1e12:6.1f} TFLOP/s")
    print(f"square int8: {dt_8*1e3:.3f} ms {flops/dt_8/1e12:6.1f} TOP/s "
          f" ({dt_b/dt_8:.2f}x)")

    # --- 2. FFN block at DPLM sampler geometry -----------------------------
    rows, d, dff = 32768, 640, 2560
    w1b = jnp.asarray(rng.normal(size=(d, dff)).astype(np.float32) / 25, jnp.bfloat16)
    w2b = jnp.asarray(rng.normal(size=(dff, d)).astype(np.float32) / 50, jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32), jnp.bfloat16)

    def ffn_bf16(x):
        h = jnp.dot(x, w1b)
        h = jax.nn.gelu(h)
        y = jnp.dot(h, w2b)
        return (x + y).astype(jnp.bfloat16)

    # per-channel int8 weights (symmetric)
    def quant_cols(w):
        s = jnp.max(jnp.abs(w), axis=0, keepdims=True).astype(jnp.float32) / 127.0
        w8_ = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        return w8_, s

    w1q, s1 = quant_cols(w1b)
    w2q, s2 = quant_cols(w2b)

    def ffn_w8a8(x):
        x8, sx = _quant_rows(x)
        h = _int8_dot(x8, w1q).astype(jnp.float32) * (sx * s1)
        h = jax.nn.gelu(h)
        h8, sh = _quant_rows(h)
        y = _int8_dot(h8, w2q).astype(jnp.float32) * (sh * s2)
        return (x + y).astype(jnp.bfloat16)

    fflops = 2.0 * rows * d * dff * 2
    dt_fb = _time_chain(ffn_bf16, x0)
    dt_f8 = _time_chain(ffn_w8a8, x0)
    print(f"ffn   bf16: {dt_fb*1e3:.3f} ms {fflops/dt_fb/1e12:6.1f} TFLOP/s")
    print(f"ffn  w8a8: {dt_f8*1e3:.3f} ms {fflops/dt_f8/1e12:6.1f} TOP/s "
          f" ({dt_fb/dt_f8:.2f}x)")

    # numerics: relative error of one w8a8 FFN vs f32 reference
    ref = ffn_bf16(x0).astype(jnp.float32)
    got = ffn_w8a8(x0).astype(jnp.float32)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    print(f"ffn w8a8 rel error vs bf16: {rel:.4f}")


if __name__ == "__main__":
    main()
