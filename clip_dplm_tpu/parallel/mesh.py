"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL process group
(run1/full.py:283,374) and DDP wrapping (old/clip_opt.py:154): a single
`jax.sharding.Mesh` over the slice; pjit emits the collectives (all-gather for
the global-batch InfoNCE, psum for gradient reduction) onto ICI automatically.

Axes:
  data  -- batch sharding (data parallel + the global-batch contrastive gather
           of old/clip_opt.py:102-112)
  model -- reserved tensor-parallel axis for large protein towers
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshContext:
    mesh: Mesh
    data_axis: str = "data"
    model_axis: str = "model"

    @property
    def data_size(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def model_size(self) -> int:
        return self.mesh.shape[self.model_axis]

    def sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    @property
    def batch_spec(self) -> P:
        return P(self.data_axis)

    @property
    def replicated_spec(self) -> P:
        return P()


def order_devices_for_mesh(
    devices: Sequence[Any], model_parallel: int
) -> list:
    """Order devices so the (data, model) reshape keeps TP traffic on ICI.

    Multi-slice TPU pods expose `device.slice_index`; devices within a slice
    share ICI while cross-slice traffic rides DCN (orders of magnitude less
    bandwidth). The mesh is built by reshaping a flat device list to
    (data, model), so the model (tensor-parallel) axis holds CONSECUTIVE
    devices — this helper sorts devices so each slice's devices are
    contiguous, guaranteeing every TP group lives inside one slice whenever
    model_parallel divides the per-slice device count. Data-parallel gradient
    psums then span DCN, which is the standard multi-slice recipe (DCN
    carries only one all-reduce per step; TP collectives per layer stay on
    ICI). Single-slice (or CPU) device lists come back unchanged up to a
    stable sort.

    With model_parallel > 1, raises if slices are uneven or model_parallel
    straddles a slice boundary — a silently DCN-crossing TP group is a
    performance bug, not a fallback. Pure DP (model_parallel == 1) accepts
    any slice topology.
    """
    devices = list(devices)
    groups: dict = {}
    for d in devices:
        groups.setdefault(getattr(d, "slice_index", 0) or 0, []).append(d)
    if len(groups) > 1 and model_parallel > 1:
        # With model_parallel == 1 no TP group can straddle a slice, so
        # uneven slice sizes are fine (pure-DP over a degraded/subset
        # topology); the guards only protect multi-device TP groups.
        sizes = {len(g) for g in groups.values()}
        if len(sizes) != 1:
            raise ValueError(f"uneven slice sizes {sorted(sizes)}")
        per_slice = sizes.pop()
        if per_slice % model_parallel != 0:
            raise ValueError(
                f"model_parallel={model_parallel} does not divide the "
                f"per-slice device count {per_slice}; a TP group would "
                "straddle slices and ride DCN"
            )
    return [d for _, g in sorted(groups.items()) for d in g]


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> MeshContext:
    """Create a 2D (data, model) mesh over all (or given) devices.

    model_parallel=1 gives pure data parallelism; larger values carve a tensor
    parallel sub-axis (reserved for the 650M-scale protein tower). On
    multi-slice pods the device order is fixed up so TP groups never straddle
    a slice boundary (see order_devices_for_mesh).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    devices = order_devices_for_mesh(devices, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    mesh = Mesh(arr, (data_axis, model_axis))
    return MeshContext(mesh=mesh, data_axis=data_axis, model_axis=model_axis)


def batch_sharding(ctx: MeshContext) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return ctx.sharding(P(ctx.data_axis))


def replicated_sharding(ctx: MeshContext) -> NamedSharding:
    return ctx.sharding(P())


def shard_batch(ctx: MeshContext, batch, process_local: Optional[bool] = None):
    """Put a host batch on the mesh with the leading dim sharded over `data`.

    Leaves whose leading dim does not divide the data axis (e.g. the (2, E)
    edge_index of graph batches) are replicated instead — XLA re-partitions
    downstream as needed.

    Single-process (the default on one host): `batch` is the GLOBAL batch and
    a plain device_put scatters it. Multi-process (pods, one process per
    host): each process's dataloader yields only its PER-PROCESS shard of the
    global batch — `jax.make_array_from_process_local_data` assembles the
    logically-global array from those local shards without any cross-host
    copy of the full batch. `process_local` forces the branch (for tests);
    by default it follows `jax.process_count() > 1`. Replicated leaves must
    hold identical data on every process either way.
    """
    sh = batch_sharding(ctx)
    repl = replicated_sharding(ctx)
    n = ctx.data_size
    if process_local is None:
        process_local = jax.process_count() > 1
    pc = jax.process_count() if process_local else 1
    if process_local and n % pc != 0:
        # With a data axis that does not divide across processes there is no
        # valid per-process shard size: EVERY leaf would fall into the
        # replicated-assembly path below, and per-host dataloader output is
        # per-host DIVERGENT — committing it replicated is silent corruption.
        raise ValueError(
            f"shard_batch: data axis size {n} does not divide across "
            f"{pc} processes; per-process batches cannot be assembled"
        )

    def put(x):
        has_dim = hasattr(x, "shape") and x.ndim >= 1
        if not process_local:
            divisible = has_dim and x.shape[0] % n == 0
            return jax.device_put(x, sh if divisible else repl)
        x = np.asarray(x)
        # Each process holds 1/process_count of the data axis, so the
        # shardability test is PER-PROCESS rows against the PER-PROCESS
        # device count — checking local rows % n (the GLOBAL axis size)
        # would misclassify valid local shards as replicated and commit
        # per-host-divergent data under a replicated sharding.
        local_n = n // pc
        divisible = has_dim and x.shape[0] % local_n == 0
        if not divisible:
            # Legitimate for genuinely replicated leaves (e.g. a shared
            # (2, E) edge_index), but a silent-corruption hazard if a
            # per-host-divergent leaf lands here — make it visible.
            import warnings

            shape = getattr(x, "shape", ())
            warnings.warn(
                f"shard_batch: leaf with shape {shape} does not divide the "
                f"per-process batch ({local_n} rows/process); assembling it "
                "REPLICATED — it must hold identical data on every process",
                stacklevel=3,
            )
            return jax.make_array_from_process_local_data(repl, x, x.shape)
        # local rows * process_count = global rows for the data-sharded dim
        global_shape = (x.shape[0] * pc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


TP_MIN_ELEMENTS = 1 << 16  # leaves smaller than this stay replicated


def tp_leaf_spec(leaf, ctx: MeshContext, min_elements: int = TP_MIN_ELEMENTS) -> P:
    """Shape-based tensor-parallel rule for a state leaf.

    Large 2D kernels (in, out) shard their output dim over the `model` axis;
    large embeddings (vocab, d) shard d; everything else (biases, LN scales,
    scalars, optimizer counts) is replicated. Shape-based so it applies
    uniformly to params AND their Adam moments without path bookkeeping.
    """
    tp = ctx.model_size
    if tp <= 1 or not hasattr(leaf, "shape"):
        return P()
    shape = leaf.shape
    if len(shape) == 2 and shape[0] * shape[1] >= min_elements and shape[1] % tp == 0:
        return P(None, ctx.model_axis)
    if len(shape) == 3 and shape[-1] % tp == 0 and leaf.size >= min_elements:
        return P(None, None, ctx.model_axis)
    return P()


def apply_tp_sharding(state, ctx: MeshContext, min_elements: int = TP_MIN_ELEMENTS):
    """device_put every leaf of a train state with the TP rule; jit then
    propagates these committed shardings through the step (XLA inserts the
    tensor-parallel collectives over ICI automatically)."""
    def put(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        return jax.device_put(
            leaf, ctx.sharding(tp_leaf_spec(leaf, ctx, min_elements))
        )

    return jax.tree_util.tree_map(put, state)
