"""Train state pytree + optimizer construction.

The state is a single pytree (params, opt state, hard-negative cache ring
buffer, RNG, step) so Orbax checkpoints capture everything needed for exact
resume — superseding the three ad-hoc checkpoint dicts of the reference
(triple_flow/5_training.py:335-358, triple_flow/1_config.py:434-452,
tong/utils/training.py:144-151), and adding step-granular resume which the
reference lacks (epoch-only).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from clip_dplm_tpu.config import Config, OptimConfig


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    # raw PRNG key data (jax.random.key_data) so Orbax can serialize it;
    # wrap with jax.random.wrap_key_data(rng, impl=cfg.train.rng_impl)
    rng: jax.Array
    # hard-negative embedding ring buffer (old/clip_opt.py:46-81); zeros-sized
    # placeholder when disabled.
    cache: jax.Array
    cache_ptr: jax.Array
    cache_len: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def build_schedule(cfg: OptimConfig) -> optax.Schedule:
    peak = cfg.learning_rate
    end = peak * cfg.min_lr_ratio
    if cfg.schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=peak,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
            end_value=end,
        )
    if cfg.schedule == "cosine":
        # CosineAnnealingLR equivalent (run1/full.py:174)
        return optax.cosine_decay_schedule(
            init_value=peak, decay_steps=cfg.total_steps, alpha=cfg.min_lr_ratio
        )
    if cfg.schedule == "constant":
        return optax.constant_schedule(peak)
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


import flax.struct as _struct


@_struct.dataclass
class FusedAdamWState:
    count: jax.Array
    mu: Any
    nu: Any
    # previous step's global grad norm (stale clip mode); 0 = "not yet seen"
    prev_norm: jax.Array


def fused_adamw(
    schedule: optax.Schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    clip_norm: float = 0.0,
    moment_dtype=None,
    clip_mode: str = "exact",
) -> optax.GradientTransformation:
    """AdamW with the global-norm clip FOLDED into the moment/update math.

    optax.chain(clip_by_global_norm, adamw) runs a full extra read+write pass
    over the gradients to apply the clip factor; here the factor is a scalar
    multiplied inside the single per-leaf read-modify-write. Semantics match
    the chain exactly in clip_mode="exact" (same bias correction, decoupled
    weight decay, schedule indexing) — see
    test_two_tower.py::test_fused_adamw_matches_optax_chain.

    clip_mode="stale" clips with the PREVIOUS step's global norm (first step
    unclipped): the exact norm is a reduction over every gradient leaf, which
    serializes all optimizer kernels behind the full backward — a scheduling
    barrier worth ~0.4 ms/step at 20M params on v5e. The one-step-stale factor
    bounds update magnitude the same way in steady state (grad-norm spikes are
    clipped one step late).
    """

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=moment_dtype or p.dtype)
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
            prev_norm=jnp.zeros((), jnp.float32),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("fused_adamw requires params")
        clipf = jnp.float32(1.0)
        new_norm = state.prev_norm
        if clip_norm and clip_norm > 0:
            if clip_mode == "stale":
                new_norm = optax.global_norm(grads)
                # first step: prev_norm==0 -> no clip
                clipf = jnp.where(
                    state.prev_norm > 0,
                    jnp.minimum(1.0, clip_norm / state.prev_norm), 1.0)
            else:
                gnorm = optax.global_norm(grads)
                clipf = jnp.minimum(1.0, clip_norm / gnorm)
        count_inc = state.count + 1
        b1c = 1.0 - jnp.float32(b1) ** count_inc
        b2c = 1.0 - jnp.float32(b2) ** count_inc
        lr = schedule(state.count)

        def leaf(g, m, v, p):
            g = g.astype(jnp.float32) * clipf
            m_new = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v_new = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g)
            u = -lr * (
                (m_new / b1c) / (jnp.sqrt(v_new / b2c) + eps)
                + weight_decay * p.astype(jnp.float32)
            )
            md = moment_dtype or m.dtype
            return u.astype(p.dtype), m_new.astype(md), v_new.astype(md)

        out = jax.tree_util.tree_map(leaf, grads, state.mu, state.nu, params)
        is_out = lambda x: isinstance(x, tuple) and len(x) == 3
        pick = lambda i: jax.tree_util.tree_map(
            lambda o: o[i], out, is_leaf=is_out)
        return pick(0), FusedAdamWState(
            count=count_inc, mu=pick(1), nu=pick(2), prev_norm=new_norm)

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip + schedule (run1/full.py:173-174 recipe:
    AdamW(wd=.01) + cosine, clip_grad_norm_(1.0)). `fused_update` (default)
    uses the single-pass fused kernel above; the optax chain is kept for
    equivalence testing."""
    schedule = build_schedule(cfg)
    moment_dtype = jnp.bfloat16 if cfg.moment_dtype == "bfloat16" else None
    if cfg.fused_update:
        return fused_adamw(
            schedule,
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            clip_norm=cfg.grad_clip_norm or 0.0,
            moment_dtype=moment_dtype,
            clip_mode=cfg.clip_mode,
        )
    chain = []
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mu_dtype=moment_dtype,
        )
    )
    return optax.chain(*chain)


def freeze_subtrees(
    tx: optax.GradientTransformation, params, frozen_keys,
    mask_moments: Optional[bool] = None,
) -> optax.GradientTransformation:
    """Zero the final updates for top-level param subtrees in `frozen_keys`.

    stop_gradient alone is not enough: AdamW's decoupled weight decay would
    still shrink frozen towers every step. Applied after the optimizer so
    frozen params are bit-exact fixed.

    `*_lora` adapter leaves (models/lora.py) inside a frozen subtree stay
    trainable — that is the LoRA fine-tuning contract. When adapters are
    present (or `mask_moments=True`), the inner optimizer itself is masked
    to the trainable leaves, so NO Adam moments are allocated for the
    frozen base (at ESM-650M that is ~2.6 GB of HBM back)."""
    from clip_dplm_tpu.models.lora import has_lora_params, is_lora_path

    frozen = set(frozen_keys)

    def rec(tree, path):
        if isinstance(tree, dict):
            return {k: rec(v, path + (k,)) for k, v in tree.items()}
        return path[0] in frozen and not is_lora_path(path)

    fmask = {k: rec(v, (k,)) for k, v in params.items()}
    if mask_moments is None:
        mask_moments = has_lora_params(params)
    zero_frozen = optax.masked(optax.set_to_zero(), fmask)
    if mask_moments:
        tmask = jax.tree_util.tree_map(lambda b: not b, fmask)
        # masked(tx) passes frozen leaves' updates through UNCHANGED (raw
        # grads), so the set_to_zero stage after it is load-bearing
        return optax.chain(optax.masked(tx, tmask), zero_frozen)
    return optax.chain(tx, zero_frozen)


def create_train_state(
    model,
    cfg: Config,
    example_batch,
    rng: Optional[jax.Array] = None,
    tx: Optional[optax.GradientTransformation] = None,
    frozen_keys=(),
) -> TrainState:
    if rng is None:
        rng = jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)
    init_rng, state_rng = jax.random.split(rng)
    state_rng = jax.random.key_data(state_rng)
    rngs = {"params": init_rng, "dropout": init_rng}
    # per-family init signatures (registry ties model class to experiment):
    # TripleFlowModel.__call__(key, batch, ...); DPLM.__call__(tokens, mask)
    if cfg.experiment == "triple_flow":
        variables = model.init(rngs, init_rng, example_batch, deterministic=True)
    elif cfg.experiment == "dplm":
        variables = model.init(
            rngs, example_batch["tokens"], example_batch.get("mask")
        )
    else:
        variables = model.init(rngs, example_batch, deterministic=True)
    params = variables["params"]
    if tx is None:
        tx = build_optimizer(cfg.train.optim)
        if not frozen_keys and cfg.esm.frozen and "esm_tower" in params:
            frozen_keys = ("esm_tower",)
        if not frozen_keys and cfg.experiment == "dplm" and cfg.dplm.lora_rank:
            # LoRA-specialize a (warm-started) DPLM trunk: adapters +
            # final_ln + lm_head train, the trunk base is frozen
            frozen_keys = tuple(
                k for k in params
                if k.startswith("layer_") or k == "layers"  # scan_layers
                or k == "embed_tokens"
            )
        if frozen_keys:
            tx = freeze_subtrees(tx, params, frozen_keys)
    cc = cfg.contrastive
    cache_rows = cc.cache_size if cc.use_cache else 1
    cache = jnp.zeros((cache_rows, cfg.projection.dim), jnp.float32)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_rng,
        cache=cache,
        cache_ptr=jnp.zeros((), jnp.int32),
        cache_len=jnp.zeros((), jnp.int32),
        tx=tx,
        apply_fn=model.apply,
    )
