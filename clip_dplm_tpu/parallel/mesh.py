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
from typing import Optional, Sequence

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


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> MeshContext:
    """Create a 2D (data, model) mesh over all (or given) devices.

    model_parallel=1 gives pure data parallelism; larger values carve a tensor
    parallel sub-axis (reserved for the 650M-scale protein tower).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    mesh = Mesh(arr, (data_axis, model_axis))
    return MeshContext(mesh=mesh, data_axis=data_axis, model_axis=model_axis)


def batch_sharding(ctx: MeshContext) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return ctx.sharding(P(ctx.data_axis))


def replicated_sharding(ctx: MeshContext) -> NamedSharding:
    return ctx.sharding(P())


def shard_batch(ctx: MeshContext, batch):
    """Device-put a host batch with the leading dim sharded over `data`."""
    sh = batch_sharding(ctx)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
