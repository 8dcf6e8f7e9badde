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


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip + schedule (run1/full.py:173-174 recipe:
    AdamW(wd=.01) + cosine, clip_grad_norm_(1.0))."""
    schedule = build_schedule(cfg)
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
            mu_dtype=jnp.bfloat16 if cfg.moment_dtype == "bfloat16" else None,
        )
    )
    return optax.chain(*chain)


def freeze_subtrees(
    tx: optax.GradientTransformation, params, frozen_keys
) -> optax.GradientTransformation:
    """Zero the final updates for top-level param subtrees in `frozen_keys`.

    stop_gradient alone is not enough: AdamW's decoupled weight decay would
    still shrink frozen towers every step. Applied after the optimizer so
    frozen params are bit-exact fixed."""
    frozen = set(frozen_keys)
    mask = {
        k: jax.tree_util.tree_map(lambda _: k in frozen, v)
        for k, v in params.items()
    }
    return optax.chain(tx, optax.masked(optax.set_to_zero(), mask))


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
