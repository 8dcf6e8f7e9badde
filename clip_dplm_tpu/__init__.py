"""clip-dplm-tpu: TPU-native contrastive multi-modal biology framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference `SrikarK-code/clip-dplm` (see SURVEY.md): CLIP-style
contrastive alignment of biological modalities, optimal-transport machinery
(ICNN Brenier potentials, entropic OT, OT conditional flow matching), and a
CLIP-guided DPLM discrete-diffusion protein sampler.

Layering (bottom-up):
  ops/       -- Pallas kernels + jittable numerical primitives (flash attention,
                fused InfoNCE, log-domain Sinkhorn, segment ops)
  parallel/  -- device mesh, shardings, collectives
  models/    -- towers, encoders, flows, ICNN, DPLM (flax.linen)
  data/      -- host-side pipelines, collation, augmentation
  train/     -- train state, trainer, checkpointing, metrics
  experiments/ -- CLIs (train / evaluate / sweep / visualize)
"""

__version__ = "0.1.0"

from clip_dplm_tpu.config import (  # noqa: F401
    Config,
    load_config,
)
