"""Standalone probe of the DPLM sampler's narrow-N ffn_out matmul
(VERDICT r3 item 4): (M=32768, K=2560) @ (K, N=640) runs at ~52% MXU
standalone under XLA (1.04 ms vs 0.545 ms roofline, RESULTS.md sampler
decomposition). Try the formulations the dead-end list leaves open:

  a. baseline     out       = x @ w                      (M, N) narrow-N
  b. transposed   out_T     = w_T @ x_T                  (N, M) wide-N —
     x is SUPPLIED transposed (isolates the matmul; a win here would
     motivate a feature-major activation layout through the sampler)
  c. batched      (8, 4096, K) @ (K, N) — reshaped M as a batch dim,
     different emitter path
  d. both-chains  (2M, K) @ (K, N) — the guided sampler's K=2 candidate
     chains share weights; one twice-tall dot instead of two dots
  e. transposed with the x_T transpose INSIDE the timed region — the
     honest cost of adopting (b) without a layout change upstream

Timing per CLAUDE.md rules: lax.scan chains with the carry perturbing an
input, host fetch as sync.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = 32768, 2560, 640
ITERS = int(os.environ.get("BENCH_ITERS", 50))


def timed(fn, *args):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / ITERS


def chain(body):
    """scan ITERS times; the carry perturbs the activation input."""

    @jax.jit
    def run(x, w):
        def step(c, _):
            y = body(x + 1e-9 * c, w)
            return jnp.sum(y[..., :1]).astype(jnp.float32) * 1e-12, ()
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=ITERS)
        return c

    return run


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    xt = jnp.asarray(np.ascontiguousarray(np.asarray(x, np.float32).T),
                     jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    wt = jnp.asarray(np.ascontiguousarray(np.asarray(w, np.float32).T),
                     jnp.bfloat16)
    x2 = jnp.concatenate([x, x], axis=0)
    floor_ms = 2 * M * K * N / 197e12 * 1e3  # bf16 v5e peak

    results = {}
    results["a_baseline"] = timed(
        chain(lambda xx, ww: jnp.dot(
            xx, ww, preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
        x, w) * 1e3
    results["b_transposed_xT_supplied"] = timed(
        chain(lambda xxt, wwt: jnp.dot(
            wwt, xxt, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16)),
        xt, wt) * 1e3
    results["c_batched_8x4096"] = timed(
        chain(lambda xx, ww: jnp.einsum(
            "bmk,kn->bmn", xx.reshape(8, M // 8, K), ww,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
        x, w) * 1e3
    results["d_two_chains_2M"] = timed(
        chain(lambda xx, ww: jnp.dot(
            xx, ww, preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
        x2, w) * 1e3 / 2.0  # per-chain cost
    results["e_transpose_inside"] = timed(
        chain(lambda xx, wwt: jnp.dot(
            wwt, xx.T, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16)),
        x, wt) * 1e3
    # f: the EXACT in-model form — flax Dense on a NATIVELY (B=256, S=128, K)
    # 3D activation (not a reshape of 2D, which XLA would canonicalize away)
    x3 = x.reshape(256, M // 256, K)  # materialized as the input array
    results["f_3d_inmodel_256x128"] = timed(
        chain(lambda xx, ww: jnp.einsum(
            "bsk,kn->bsn", xx, ww,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
        x3, w) * 1e3
    # g: the 3D input flattened to 2D around the dot (reshape cost included)
    # — the candidate model change if (f) is slow and (g) matches (a)
    results["g_3d_flattened_wrapped"] = timed(
        chain(lambda xx, ww: jnp.dot(
            xx.reshape(M, K), ww,
            preferred_element_type=jnp.float32).astype(
                jnp.bfloat16).reshape(256, M // 256, N)),
        x3, w) * 1e3

    print(f"geometry ({M},{K})@({K},{N}); roofline {floor_ms:.3f} ms; "
          f"iters={ITERS}")
    for k, v in results.items():
        print(f"  {k:28s} {v:7.3f} ms  ({floor_ms / v * 100:5.1f}% MXU)")


if __name__ == "__main__":
    main()
