from clip_dplm_tpu.data.synthetic import (  # noqa: F401
    make_paired_embeddings,
    PairedEmbeddingDataset,
)
