"""Jitted train/eval steps + the Trainer loop.

TPU-native replacement for the reference's three train loops
(old/clip_opt.py:153-171, run1/full.py:120-187, tong/utils/training.py:7-155):
one jitted train step, pjit-sharded over the `data` mesh axis. The global
math is written once — batch-sharded inputs make XLA insert the ICI
all-gather for the B x B similarity and the psum for gradients automatically
(the DDP + dist.all_gather of run1/full.py:77-84,172 with zero backend code).

Real gradient accumulation via `lax.scan` over microbatches (the reference
only carried the config knob, triple_flow/1_config.py:146-150).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from clip_dplm_tpu.config import Config
from clip_dplm_tpu.ops import infonce
from clip_dplm_tpu.parallel import MeshContext
from clip_dplm_tpu.train.state import TrainState


def _fused_ok() -> bool:
    """Pallas InfoNCE compiles only for TPU; everywhere else (CPU CI mesh,
    the virtual dryrun) fall back to the numerically identical XLA loss."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pair_loss_fn(cfg: Config, ctx: Optional[MeshContext] = None):
    """Loss for the emb_a/emb_b two-tower families (two_tower, rna_rbp,
    esm_clip)."""
    cc = cfg.contrastive
    use_fused = cc.use_fused_kernel and _fused_ok()

    def contrastive(emb_a, emb_b, logit_scale, cache, cache_len):
        if cc.loss_kind == "flatnce":
            from clip_dplm_tpu.ops.loss_variants import flatnce_loss

            return flatnce_loss(
                emb_a, emb_b, logit_scale, max_scale=cc.logit_scale_max
            )
        if cc.loss_kind == "siglip":
            from clip_dplm_tpu.ops.loss_variants import siglip_loss

            return siglip_loss(
                emb_a, emb_b, logit_scale, max_scale=cc.logit_scale_max
            )
        if use_fused:
            from clip_dplm_tpu.ops.fused_infonce import fused_clip_loss

            import functools

            base = functools.partial(
                fused_clip_loss,
                max_scale=cc.logit_scale_max,
                dot_dtype=jnp.bfloat16,
                label_smoothing=cc.label_smoothing,
                materialize_raw=cc.fused_materialize_raw,
                assume_normalized=cfg.projection.l2_normalize_output,
            )
            if ctx is not None and ctx.data_size > 1 and cc.gather_global_batch:
                # explicit SPMD: rows stay local per chip (GSPMD can't
                # partition the Pallas custom call on its own —
                # old/clip_opt.py:102-112 semantics)
                d = ctx.data_axis
                if cc.use_cache:
                    # cache columns require the gathered formulation
                    fn = lambda a, b, ls, c, cl: base(
                        a, b, ls, cache=c, cache_len=cl, axis_name=d)
                    in_specs = (P(d), P(d), P(), P(), P())
                    args = (emb_a, emb_b, logit_scale, cache, cache_len)
                else:
                    # ring schedule: column shards travel a ppermute ring and
                    # ICI overlaps the kernel passes; no B_g x d gather buffer
                    from clip_dplm_tpu.ops.fused_infonce import (
                        ring_fused_clip_loss,
                    )

                    fn = lambda a, b, ls: ring_fused_clip_loss(
                        a, b, ls, axis_name=d,
                        max_scale=cc.logit_scale_max,
                        dot_dtype=jnp.bfloat16,
                        label_smoothing=cc.label_smoothing,
                    )
                    in_specs = (P(d), P(d), P())
                    args = (emb_a, emb_b, logit_scale)
                return jax.shard_map(
                    fn, mesh=ctx.mesh, in_specs=in_specs, out_specs=(P(), P()),
                    check_vma=False,  # pallas_call outputs carry no vma info
                )(*args)
            return base(
                emb_a, emb_b, logit_scale,
                cache=cache if cc.use_cache else None,
                cache_len=cache_len if cc.use_cache else None,
            )
        return infonce.clip_loss(
            emb_a,
            emb_b,
            logit_scale,
            cache=cache if cc.use_cache else None,
            cache_len=cache_len if cc.use_cache else None,
            label_smoothing=cc.label_smoothing,
            max_scale=cc.logit_scale_max,
        )

    def loss_fn(params, apply_fn, batch, rng, cache, cache_len):
        out = apply_fn(
            {"params": params}, batch, deterministic=False, rngs={"dropout": rng}
        )
        emb_a, emb_b = out["emb_a"], out["emb_b"]
        logit_scale = (
            out["logit_scale"]
            if cc.learned_temperature
            else jnp.log(1.0 / cc.temperature)
        )
        if cc.loss_kind == "supcon":
            from clip_dplm_tpu.ops.loss_variants import supcon_pair_loss

            if "labels" not in batch:
                raise ValueError("supcon loss requires `labels` in the batch")
            loss, metrics = supcon_pair_loss(
                emb_a, emb_b, batch["labels"], logit_scale,
                max_scale=cc.logit_scale_max,
            )
        else:
            loss, metrics = contrastive(emb_a, emb_b, logit_scale, cache, cache_len)
        return loss, (metrics, infonce.l2_normalize(emb_b))

    return loss_fn


def _multiway_loss_fn(cfg: Config, ctx: Optional[MeshContext] = None):
    """3-way TF CLIP loss (tf nb cell 41): sum of pairwise symmetric CEs over
    cell/pert/protein embeddings. Under a sharded batch the global B x B
    similarity is emitted by GSPMD automatically, matching the reference's
    gather-for-every-variant (old/clip_opt.py:102-112). With the fused kernel
    each pair term routes through fused_clip_loss (single chip) or the
    ring-scheduled kernel (multi-chip) — the three B x B sims never hit HBM."""
    cc = cfg.contrastive
    use_fused = cc.use_fused_kernel and _fused_ok()

    def multiway(embs, logit_scale):
        if not use_fused:
            return infonce.multiway_clip_loss(
                embs, logit_scale,
                label_smoothing=cc.label_smoothing,
                max_scale=cc.logit_scale_max,
            )
        import functools

        from clip_dplm_tpu.ops.fused_infonce import fused_multiway_clip_loss

        base = functools.partial(
            fused_multiway_clip_loss,
            max_scale=cc.logit_scale_max,
            dot_dtype=jnp.bfloat16,
            label_smoothing=cc.label_smoothing,
            materialize_raw=cc.fused_materialize_raw,
        )
        if ctx is not None and ctx.data_size > 1 and cc.gather_global_batch:
            d = ctx.data_axis
            names = list(embs.keys())
            return jax.shard_map(
                lambda *vals: base(
                    dict(zip(names, vals[:-1])), vals[-1], axis_name=d),
                mesh=ctx.mesh,
                in_specs=tuple([P(d)] * len(names)) + (P(),),
                out_specs=(P(), P()),
                check_vma=False,
            )(*[embs[n] for n in names], logit_scale)
        return base(embs, logit_scale)

    def loss_fn(params, apply_fn, batch, rng, cache, cache_len):
        del cache, cache_len
        out = apply_fn(
            {"params": params}, batch, deterministic=False, rngs={"dropout": rng}
        )
        embs = {
            "cell": out["cell_embed"],
            "pert": out["pert_embed"],
            "protein": out["protein_embed"],
        }
        logit_scale = (
            out["logit_scale"]
            if cc.learned_temperature
            else jnp.log(1.0 / cc.temperature)
        )
        loss, metrics = multiway(embs, logit_scale)
        return loss, (metrics, None)

    return loss_fn


def _triple_flow_loss_fn(cfg: Config, ctx: Optional[MeshContext] = None):
    """Encoders + OT-CFM flows: compute_all_losses over the TripleFlowModel
    outputs (tong/utils/losses.py:34-80 / triple_flow/5_training.py:265-279)."""
    from clip_dplm_tpu.models.triple_flow_model import compute_all_losses

    def loss_fn(params, apply_fn, batch, rng, cache, cache_len):
        del cache, cache_len
        drop_rng, flow_rng = jax.random.split(rng)
        out = apply_fn(
            {"params": params}, flow_rng, batch,
            deterministic=False, rngs={"dropout": drop_rng},
        )
        loss, metrics = compute_all_losses(out, cfg)
        return loss, (metrics, None)

    return loss_fn


def _dplm_loss_fn(cfg: Config, ctx: Optional[MeshContext] = None):
    """Absorbing-state discrete-diffusion denoising loss (models/dplm.py)."""
    from clip_dplm_tpu.models.dplm import diffusion_loss_from_apply

    def loss_fn(params, apply_fn, batch, rng, cache, cache_len):
        del cache, cache_len
        loss, metrics = diffusion_loss_from_apply(
            apply_fn, params, rng, batch["tokens"], batch.get("mask")
        )
        return loss, (metrics, None)

    return loss_fn


def make_loss_fn(cfg: Config, ctx: Optional[MeshContext] = None):
    """Per-family loss adapter: every experiment family the registry ships
    trains through the same (params, apply_fn, batch, rng, cache, cache_len)
    -> (loss, (metrics, aux_emb)) signature."""
    if cfg.experiment == "tf_clip":
        return _multiway_loss_fn(cfg, ctx)
    if cfg.experiment == "triple_flow":
        return _triple_flow_loss_fn(cfg, ctx)
    if cfg.experiment == "dplm":
        return _dplm_loss_fn(cfg, ctx)
    return _pair_loss_fn(cfg, ctx)


def make_train_step(
    cfg: Config, ctx: Optional[MeshContext] = None
) -> Callable[[TrainState, Any], Tuple[TrainState, Dict]]:
    """Build the (un-jitted) train step; jit it with shardings via
    `jit_train_step` or directly for single-device tests. `ctx` enables
    mesh-aware loss formulations (the shard_map fused-kernel path)."""
    loss_fn = make_loss_fn(cfg, ctx)
    accum = cfg.train.optim.grad_accum_steps
    use_cache = cfg.contrastive.use_cache

    rng_impl = cfg.train.rng_impl

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        key = jax.random.wrap_key_data(state.rng, impl=rng_impl)
        rng, new_key = jax.random.split(key)
        new_rng = jax.random.key_data(new_key)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if accum <= 1:
            (loss, (metrics, new_b)), grads = grad_fn(
                state.params, state.apply_fn, batch, rng,
                state.cache, state.cache_len,
            )
        else:
            # microbatch scan: leading dim reshaped (accum, micro, ...)
            def reshape(x):
                return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

            micro = jax.tree_util.tree_map(reshape, batch)
            rngs = jax.random.split(rng, accum)

            def body(carry, xs):
                grads_acc, loss_acc, metrics_acc = carry
                mb, r = xs
                (loss, (metrics, mb_b)), grads = grad_fn(
                    state.params, state.apply_fn, mb, r,
                    state.cache, state.cache_len,
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc, metrics)
                # emit this microbatch's embeddings so the hard-negative cache
                # sees the FULL batch (old/clip_opt.py:75-81 caches every batch)
                return (grads_acc, loss_acc + loss, metrics_acc), mb_b

            # metric/grad zeros from abstract shapes — no extra forward pass
            out_shapes = jax.eval_shape(
                lambda p, mb, r, c, cl: grad_fn(p, state.apply_fn, mb, r, c, cl),
                state.params,
                jax.tree_util.tree_map(lambda x: x[0], micro), rngs[0],
                state.cache, state.cache_len,
            )
            zero_metrics = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), out_shapes[0][1][0]
            )
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss, metrics), micro_b = jax.lax.scan(
                body, (zero_grads, jnp.zeros(()), zero_metrics), (micro, rngs)
            )
            new_b = (
                None if micro_b is None
                else micro_b.reshape((-1,) + micro_b.shape[2:])
            )
            inv = 1.0 / accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
            metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)

        new_state = state.apply_gradients(grads).replace(rng=new_rng)
        if use_cache and new_b is not None:
            cache, ptr, filled = infonce.update_cache(
                state.cache, state.cache_ptr, new_b, state.cache_len
            )
            new_state = new_state.replace(cache=cache, cache_ptr=ptr, cache_len=filled)
        metrics = dict(metrics)
        metrics["loss"] = loss
        if cfg.train.log_grad_norm:
            metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return step


def make_multi_train_step(cfg: Config, steps_per_call: int,
                          ctx: Optional[MeshContext] = None):
    """Scan `steps_per_call` train steps inside one jit call over a stacked
    batch tree (leading dim = steps). Returns (state, metrics-of-last-step)."""
    step = make_train_step(cfg, ctx)

    def multi(state: TrainState, batches) -> Tuple[TrainState, Dict]:
        def body(s, b):
            s, m = step(s, b)
            return s, m

        state, metrics = jax.lax.scan(body, state, batches)
        return state, jax.tree_util.tree_map(lambda x: x[-1], metrics)

    return multi


def stack_batches(batches):
    """Stack a list of same-shaped host batches along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def make_eval_step(cfg: Config) -> Callable[[TrainState, Any], Dict]:
    cc = cfg.contrastive
    rng_impl = cfg.train.rng_impl
    eval_fused = cc.use_fused_kernel and _fused_ok()

    def pair_step(state: TrainState, batch) -> Dict:
        out = state.apply_fn({"params": state.params}, batch, deterministic=True)
        logit_scale = (
            out["logit_scale"]
            if cc.learned_temperature
            else jnp.log(1.0 / cc.temperature)
        )
        if eval_fused:
            # same kernel as training (numerically equal to the XLA loss;
            # keeps the eval CLIs on the fused path on TPU)
            from clip_dplm_tpu.ops.fused_infonce import fused_clip_loss

            loss, metrics = fused_clip_loss(
                out["emb_a"], out["emb_b"], logit_scale,
                max_scale=cc.logit_scale_max, dot_dtype=jnp.bfloat16,
                materialize_raw=False,
                assume_normalized=cfg.projection.l2_normalize_output,
            )
        else:
            loss, metrics = infonce.clip_loss(
                out["emb_a"], out["emb_b"], logit_scale,
                label_smoothing=0.0, max_scale=cc.logit_scale_max,
            )
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    def multiway_step(state: TrainState, batch) -> Dict:
        out = state.apply_fn({"params": state.params}, batch, deterministic=True)
        embs = {
            "cell": out["cell_embed"],
            "pert": out["pert_embed"],
            "protein": out["protein_embed"],
        }
        logit_scale = (
            out["logit_scale"]
            if cc.learned_temperature
            else jnp.log(1.0 / cc.temperature)
        )
        loss, metrics = infonce.multiway_clip_loss(
            embs, logit_scale, max_scale=cc.logit_scale_max
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    def triple_flow_step(state: TrainState, batch) -> Dict:
        from clip_dplm_tpu.models.triple_flow_model import compute_all_losses

        # eval is deterministic given the state: the CFM (t, noise) draw uses
        # the state RNG without advancing it
        key = jax.random.wrap_key_data(state.rng, impl=rng_impl)
        out = state.apply_fn(
            {"params": state.params}, key, batch, deterministic=True
        )
        loss, metrics = compute_all_losses(out, cfg)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    def dplm_step(state: TrainState, batch) -> Dict:
        from clip_dplm_tpu.models.dplm import diffusion_loss_from_apply

        key = jax.random.wrap_key_data(state.rng, impl=rng_impl)
        loss, metrics = diffusion_loss_from_apply(
            state.apply_fn, state.params, key, batch["tokens"], batch.get("mask")
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    if cfg.experiment == "tf_clip":
        return multiway_step
    if cfg.experiment == "triple_flow":
        return triple_flow_step
    if cfg.experiment == "dplm":
        return dplm_step
    return pair_step


def jit_train_step(step_fn, ctx: MeshContext, state: TrainState,
                   tp_min_elements: int = None):
    """jit with explicit shardings: batch sharded over `data`, state sharded
    by the tensor-parallel rule over `model` (replicated when model_size==1).

    XLA lowers the B x B similarity over the sharded batch into an ICI
    all-gather + local matmul, the gradient reduction into psums, and the
    TP-sharded kernels into all-gather/reduce-scatter pairs — the whole
    NCCL layer of the reference disappears into the compiler.
    """
    from clip_dplm_tpu.parallel.mesh import TP_MIN_ELEMENTS, tp_leaf_spec

    me = TP_MIN_ELEMENTS if tp_min_elements is None else tp_min_elements
    repl = ctx.sharding(P())
    state_sh = jax.tree_util.tree_map(
        lambda leaf: ctx.sharding(tp_leaf_spec(leaf, ctx, me)), state
    )
    # the batch keeps the committed shardings from parallel.shard_batch
    # (leading dim over `data`; non-divisible leaves like graph edge_index
    # replicated) — None lets jit inherit them instead of forcing one spec
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, None),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def jit_eval_step(step_fn, ctx: MeshContext, state: TrainState,
                  tp_min_elements: int = None):
    from clip_dplm_tpu.parallel.mesh import TP_MIN_ELEMENTS, tp_leaf_spec

    me = TP_MIN_ELEMENTS if tp_min_elements is None else tp_min_elements
    repl = ctx.sharding(P())
    state_sh = jax.tree_util.tree_map(
        lambda leaf: ctx.sharding(tp_leaf_spec(leaf, ctx, me)), state
    )
    return jax.jit(step_fn, in_shardings=(state_sh, None), out_shardings=repl)


class EarlyStopping:
    """Patience-based early stopping (rna nb cell 29; tong/utils/training.py:100-109)."""

    def __init__(self, patience: int = 5, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def update(self, value: float) -> bool:
        """Returns True if `value` is a new best."""
        if self.best is None or value < self.best - self.min_delta:
            self.best = value
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience:
            self.should_stop = True
        return False


class Trainer:
    """Epoch-driven training loop with eval, early stopping, checkpointing and
    CSV/W&B-gated metric logging (capability match for the reference trainers;
    see module docstring)."""

    def __init__(
        self,
        cfg: Config,
        state: TrainState,
        ctx: Optional[MeshContext] = None,
        checkpoint_dir: Optional[str] = None,
        log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    ):
        self.cfg = cfg
        self.state = state
        self.ctx = ctx
        self.log_fn = log_fn
        self.steps_per_call = max(1, cfg.train.steps_per_call)
        if self.steps_per_call > 1:
            train_step = make_multi_train_step(cfg, self.steps_per_call, ctx)
        else:
            train_step = make_train_step(cfg, ctx)
        eval_step = make_eval_step(cfg)
        if ctx is not None:
            self.train_step = jit_train_step(train_step, ctx, state)
            self.eval_step = jit_eval_step(eval_step, ctx, state)
        else:
            self.train_step = jax.jit(train_step, donate_argnums=(0,))
            self.eval_step = jax.jit(eval_step)
        self.checkpoint_dir = checkpoint_dir
        self.history: Dict[str, list] = {"train_loss": [], "val_loss": []}
        self._ckpt = None
        if checkpoint_dir:
            from clip_dplm_tpu.train.checkpoint import CheckpointManager

            self._ckpt = CheckpointManager(
                checkpoint_dir, keep=cfg.train.keep_checkpoints,
                async_save=cfg.train.async_checkpoint,
            )
        self._profiler = None
        if cfg.logging.profile:
            from clip_dplm_tpu.utils.logging import ProfilerHook

            self._profiler = ProfilerHook(cfg.logging.profile_dir)
        self._global_step = 0

    def _put(self, batch):
        if self.ctx is not None:
            from clip_dplm_tpu.parallel import shard_batch

            return shard_batch(self.ctx, batch)
        return batch

    def _grouped(self, batches: Iterable):
        """Group into stacked super-batches when steps_per_call > 1 (the
        ragged tail group is dropped to keep shapes static)."""
        if self.steps_per_call <= 1:
            yield from batches
            return
        group = []
        for b in batches:
            group.append(b)
            if len(group) == self.steps_per_call:
                yield stack_batches(group)
                group = []

    def _prefetched(self, batches: Iterable):
        """Double-buffered host->device transfer: the next batch is collated
        and device_put on a background thread while the device runs the
        current step (data/prefetch.py)."""
        from clip_dplm_tpu.data.prefetch import DevicePrefetcher

        if self.ctx is not None:
            # parallel.shard_batch owns the placement rule (data-sharded
            # when the leading dim divides, replicated otherwise) AND the
            # multi-process assembly of per-host shards into global arrays
            # — a plain per-leaf device_put here would break on pods.
            return DevicePrefetcher(batches, put=self._put, depth=2)
        return DevicePrefetcher(batches, depth=2)

    def train(
        self,
        train_batches: Callable[[], Iterable],
        val_batches: Optional[Callable[[], Iterable]] = None,
        num_epochs: Optional[int] = None,
        preemption_guard=None,
    ) -> Dict[str, list]:
        """Run the epoch loop. With a checkpoint dir and
        `train.preemption_checkpoint` (default on), SIGTERM — the
        spot/maintenance preemption notice — triggers one step-granular
        save of the live state before returning (train/preemption.py);
        pass `preemption_guard` to control the signal set or to drive the
        flag programmatically."""
        num_epochs = num_epochs or self.cfg.train.num_epochs
        stopper = EarlyStopping(self.cfg.train.early_stopping_patience)
        guard = preemption_guard
        installed = False
        if (guard is None and self._ckpt is not None
                and self.cfg.train.preemption_checkpoint):
            from clip_dplm_tpu.train.preemption import PreemptionGuard

            guard = PreemptionGuard()
            guard.install()
            installed = True
        try:
            self._train_epochs(
                train_batches, val_batches, num_epochs, stopper, guard)
        finally:
            if installed:
                guard.uninstall()
            if self._ckpt:
                self._ckpt.wait()  # async saves must be durable before returning
        return self.history

    def _train_epochs(self, train_batches, val_batches, num_epochs,
                      stopper, guard) -> None:
        for epoch in range(num_epochs):
            t0 = time.time()
            losses = []
            prefetcher = self._prefetched(self._grouped(train_batches()))
            # Multi-host, the flag agreement is a COLLECTIVE (an allgather
            # that also syncs host with device, killing the host's dispatch
            # run-ahead) — poll it only every `preemption_poll_batches`,
            # at batch indices every host reaches identically, so all hosts
            # enter the collective save at the SAME step (preemption.py
            # module docstring). Single-process, the poll is a plain local
            # flag read and runs every batch.
            multi = jax.process_count() > 1
            poll = max(1, self.cfg.train.preemption_poll_batches)
            try:
                for i, batch in enumerate(prefetcher):
                    self.state, metrics = self.train_step(self.state, batch)
                    losses.append(metrics["loss"])
                    self._global_step += self.steps_per_call
                    if self._profiler is not None:
                        self._profiler.step(self._global_step)
                    at_boundary = not multi or (i + 1) % poll == 0
                    if (guard is not None and at_boundary
                            and guard.requested_globally()):
                        # step-granular save of the LIVE state; resume picks
                        # up at state.step instead of the last epoch boundary
                        if self._ckpt:
                            self._ckpt.save(
                                self.state,
                                int(jax.device_get(self.state.step)))
                        self.history.setdefault(
                            "preempted_at_step", []).append(self._global_step)
                        return
            finally:
                # also covers exceptions escaping train_step: an abandoned
                # worker would otherwise spin on queue.Full forever, pinning
                # `depth` device-resident batches
                if hasattr(prefetcher, "close"):
                    prefetcher.close()
            # epoch end is also an agreed boundary on every host: catches a
            # flag latched within the last poll window of the epoch
            if guard is not None and multi and guard.requested_globally():
                if self._ckpt:
                    self._ckpt.save(
                        self.state, int(jax.device_get(self.state.step)))
                self.history.setdefault(
                    "preempted_at_step", []).append(self._global_step)
                return
            train_loss = float(np.mean([jax.device_get(l) for l in losses]))
            self.history["train_loss"].append(train_loss)

            val_loss = None
            if val_batches is not None:
                vals = [
                    jax.device_get(self.eval_step(self.state, self._put(b))["loss"])
                    for b in val_batches()
                ]
                val_loss = float(np.mean(vals))
                self.history["val_loss"].append(val_loss)

            if self.log_fn:
                self.log_fn(
                    epoch,
                    {
                        "train_loss": train_loss,
                        "val_loss": val_loss if val_loss is not None else float("nan"),
                        "epoch_seconds": time.time() - t0,
                    },
                )

            monitor = val_loss if val_loss is not None else train_loss
            is_best = stopper.update(monitor)
            if self._ckpt and is_best:
                self._ckpt.save(self.state, int(jax.device_get(self.state.step)))
            if stopper.should_stop:
                break
