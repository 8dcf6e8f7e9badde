from clip_dplm_tpu.parallel.mesh import (  # noqa: F401
    MeshContext,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from clip_dplm_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    stack_layer_params,
)
