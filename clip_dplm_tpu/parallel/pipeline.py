"""GPipe-style pipeline parallelism over a mesh axis.

Scale-out beyond the reference (single-GPU everywhere): the 3B/15B ESM
variants the reference names but never runs (triple_flow/1_config.py:152-183,
`esm2_t36_3B` / `esm2_t48_15B`) do not fit one chip; here a stack of
identical blocks is cut into P stages laid out over a `pipe` mesh axis and
microbatches stream through a ppermute ring.

SPMD formulation (shard_map-friendly, no per-device programs):

- block parameters are STACKED on a leading (L,) axis and sharded over
  `pipe`, so each device holds its stage's (L/P, ...) slice;
- the schedule runs T = M + P - 1 ticks of `lax.scan`; at tick t, stage p
  applies its blocks to microbatch m = t - p (garbage ticks compute anyway
  and are masked on collection — branchless, static shapes);
- activations move stage p -> p+1 with a single `ppermute` per tick, which
  the scheduler overlaps with the next tick's compute;
- stage 0 injects x[m] from its local microbatch buffer, the last stage
  collects y[m] by masked dynamic_update_slice; a final ppermute returns the
  collected outputs to every stage (replicated out).

Autodiff: everything is scan + ppermute + where, so `jax.grad` through the
pipeline is exact — the backward schedule is the transposed ring. Tested
against the unpipelined stack (fwd + gradients, tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _shift_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def pipeline_apply(
    block_fn: Callable[[Any, Any], Any],
    stage_params: Any,
    x_micro: Any,
    axis_name: str = "pipe",
) -> Any:
    """Run microbatches through a pipelined stack of identical blocks.

    Call INSIDE shard_map with:
      stage_params: pytree whose leaves are stacked per-block with a leading
        axis sharded over `axis_name` — locally (L/P, ...); the stage applies
        its L/P blocks in order.
      x_micro: pytree of (M, micro, ...) microbatch buffers, REPLICATED
        across the pipe axis (every stage holds the inputs; only stage 0
        reads them). Leaves that the blocks only read (masks, positions)
        simply travel the ring with the activations.
      block_fn(params_i, h) -> h: one block application over the pytree h.

    Returns the (M, micro, ...) output pytree, replicated (every stage ends
    up with the full buffer).
    """
    P = jax.lax.axis_size(axis_name)
    p = jax.lax.axis_index(axis_name)
    perm = _shift_perm(P)
    M = jax.tree_util.tree_leaves(x_micro)[0].shape[0]
    T = M + P - 1

    def stage(h):
        def body(h, params_i):
            return block_fn(params_i, h), None

        h, _ = jax.lax.scan(body, h, stage_params)
        return h

    def at(tree, idx):
        return _tmap(
            lambda x: jax.lax.dynamic_index_in_dim(
                x, idx, axis=0, keepdims=False), tree)

    def tick(carry, t):
        buf, ys = carry
        m = t - p  # microbatch index this stage works on (may be invalid)
        # stage 0 injects its m-th (== t-th) input; others use the ring buf
        inject = at(x_micro, jnp.clip(t, 0, M - 1))
        h_in = _tmap(lambda i, b: jnp.where(p == 0, i, b), inject, buf)
        h_out = stage(h_in)
        # the last stage collects its result when m is valid
        keep = (p == P - 1) & (m >= 0) & (m < M)
        mc = jnp.clip(m, 0, M - 1)
        old = at(ys, mc)
        ys = _tmap(
            lambda y, new, o: jax.lax.dynamic_update_index_in_dim(
                y, jnp.where(keep, new, o), mc, axis=0),
            ys, h_out, old)
        buf = jax.lax.ppermute(h_out, axis_name, perm)
        return (buf, ys), None

    buf0 = _tmap(lambda x: jnp.zeros(x.shape[1:], x.dtype), x_micro)
    ys0 = _tmap(jnp.zeros_like, x_micro)
    (_, ys), _ = jax.lax.scan(tick, (buf0, ys0), jnp.arange(T))

    # only the last stage holds real outputs; psum broadcasts them ring-wide
    ys = _tmap(
        lambda y: jax.lax.psum(
            jnp.where(p == P - 1, y, jnp.zeros_like(y)), axis_name), ys)
    return ys


def stack_layer_params(params: Any, num_layers: int, prefix: str = "layer_"):
    """{'layer_0': tree, 'layer_1': tree, ...} -> one tree with a stacked
    (L, ...) leading axis per leaf, ready to shard over the pipe axis."""
    layers = [params[f"{prefix}{i}"] for i in range(num_layers)]
    return _tmap(lambda *xs: jnp.stack(xs), *layers)
