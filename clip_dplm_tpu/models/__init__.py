from clip_dplm_tpu.models.layers import (  # noqa: F401
    MLPTower,
    ResNetTower,
    VectorTransformerTower,
    make_tower,
    LinearProjection,
    ProjectionHead,
    OptimizedProjectionHead,
    make_projection,
)
from clip_dplm_tpu.models.clip import TwoTowerCLIP  # noqa: F401
