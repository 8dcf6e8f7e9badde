from clip_dplm_tpu.models.layers import (  # noqa: F401
    MLPTower,
    ResNetTower,
    VectorTransformerTower,
    TransformerBlock,
    make_tower,
    LinearProjection,
    ProjectionHead,
    OptimizedProjectionHead,
    make_projection,
)
from clip_dplm_tpu.models.clip import TwoTowerCLIP  # noqa: F401
from clip_dplm_tpu.models.token_towers import RNARBPCLIP, TokenTransformerTower  # noqa: F401
from clip_dplm_tpu.models.esm import ESMTower, convert_esm_torch_params  # noqa: F401
from clip_dplm_tpu.models.lora import (  # noqa: F401
    LoRASpec,
    merge_adapters,
    merge_lora,
    split_lora,
)
from clip_dplm_tpu.models.t5 import ProtT5Tower, convert_t5_torch_params  # noqa: F401
from clip_dplm_tpu.models.rnabert import RNABertTower, convert_bert_torch_params  # noqa: F401
from clip_dplm_tpu.models.protein_clip import ESMProteinCLIP  # noqa: F401
from clip_dplm_tpu.models.tf_clip import TFContrastiveModel  # noqa: F401
from clip_dplm_tpu.models.gnn import MultiLayerPiGNN, PiGNNLayer  # noqa: F401
from clip_dplm_tpu.models.tong_encoders import (  # noqa: F401
    CellStateEncoder,
    PerturbationEncoder,
    ProteinEncoder,
)
from clip_dplm_tpu.models.flows import OTFlow, TripleFlow, VectorFieldNet  # noqa: F401
from clip_dplm_tpu.models.icnn import (  # noqa: F401
    SingleCellICNN,
    SingleCellTransport,
    TripleTransportMaps,
)
from clip_dplm_tpu.models.triple_flow_model import TripleFlowModel  # noqa: F401
from clip_dplm_tpu.models.dplm import DPLM  # noqa: F401
from clip_dplm_tpu.models.esm_projections import GeneProjection, ProteinProjection  # noqa: F401
