from clip_dplm_tpu.ops.attention import (  # noqa: F401
    attention_reference,
    multihead_attention,
)
from clip_dplm_tpu.ops.infonce import (  # noqa: F401
    clip_loss,
    global_clip_loss,
    l2_normalize,
    similarity_logits,
)
from clip_dplm_tpu.ops.ring_attention import ring_flash_attention  # noqa: F401
