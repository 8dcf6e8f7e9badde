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
from clip_dplm_tpu.parallel.composed import (  # noqa: F401
    init_composed_params,
    make_composed_train_step,
    shard_composed_params,
)
