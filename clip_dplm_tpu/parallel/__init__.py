from clip_dplm_tpu.parallel.mesh import (  # noqa: F401
    MeshContext,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
