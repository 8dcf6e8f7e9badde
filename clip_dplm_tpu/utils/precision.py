"""bf16 compute policy with explicit fp32 islands.

TPU-native replacement for CUDA AMP (`autocast`/`GradScaler`,
old/clip_opt.py:4,163-171 and triple_flow/5_training.py:217-237): bf16 shares
fp32's exponent range, so no loss scaler is needed. fp32 islands are kept
where the reference kept them (logit scale + loss math, the ICNN gradient
fp32 island of triple_flow/2_icnn_core.py:195).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


@dataclasses.dataclass(frozen=True)
class Policy:
    """Casting policy for a module: params stored in param_dtype, compute in
    compute_dtype, losses/reductions in fp32."""

    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    @property
    def compute(self):
        return DTYPES[self.compute_dtype]

    @property
    def param(self):
        return DTYPES[self.param_dtype]

    def cast_to_compute(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


FP32 = Policy(compute_dtype="float32", param_dtype="float32")
BF16 = Policy(compute_dtype="bfloat16", param_dtype="float32")
