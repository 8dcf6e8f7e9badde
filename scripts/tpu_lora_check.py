"""On-TPU LoRA parity: the packed short-attention path (qkv-slice deltas +
weight-merged `out` adapter) must match the generic XLA path
(CLIP_DPLM_SHORT_ATTN=0) on the same params, and a LoRA train step must
move only adapter leaves. Run on the real chip; CPU tests cover the
generic path (tests/test_lora.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from clip_dplm_tpu.config import ESMConfig
    from clip_dplm_tpu.models.esm import ESMTower

    cfg = ESMConfig(name="tiny", vocab_size=33, d_model=512, num_layers=2,
                    num_heads=8, max_len=256, lora_rank=8,
                    lora_targets=("q", "k", "v", "out", "ffn_in", "ffn_out"))
    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 24, (4, 126)).astype(np.int32)
    toks[:, 0] = 0
    toks[:, -1] = 2
    toks = jnp.asarray(toks)
    params = tower.init(jax.random.PRNGKey(0), toks)["params"]

    # nonzero adapters so the deltas actually act
    def bump(path, leaf):
        if any(str(k.key).endswith("_lora") for k in path):
            return 0.02 * jax.random.normal(
                jax.random.PRNGKey(hash(str(path)) % (2**31)), leaf.shape,
                leaf.dtype)
        return leaf

    params = jax.tree_util.tree_map_with_path(bump, params)

    apply = jax.jit(lambda p, t: tower.apply({"params": p}, t,
                                             pooling="mean_residues"))
    os.environ["CLIP_DPLM_SHORT_ATTN"] = "1"
    packed = np.asarray(apply(params, toks))
    os.environ["CLIP_DPLM_SHORT_ATTN"] = "0"
    generic = np.asarray(jax.jit(
        lambda p, t: tower.apply({"params": p}, t, pooling="mean_residues"),
    )(params, toks))
    rel = np.linalg.norm(packed - generic) / np.linalg.norm(generic)
    print(f"packed vs generic rel err: {rel:.2e}")
    assert rel < 2e-3, rel

    # grads through the packed path reach the adapters, not the base
    os.environ["CLIP_DPLM_SHORT_ATTN"] = "1"

    def loss(p):
        return jnp.sum(tower.apply({"params": p}, toks,
                                   pooling="mean_residues") ** 2)

    g = jax.jit(jax.grad(loss))(params)
    blk = g["layer_0"]
    assert float(jnp.abs(blk["q"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(blk["q_lora"]["a"]).max()) > 0.0
    assert float(jnp.abs(blk["out_lora"]["a"]).max()) > 0.0
    assert float(jnp.abs(blk["ffn_in_lora"]["b"]).max()) > 0.0
    print("packed-path LoRA grads: base zero, adapters nonzero — OK")


if __name__ == "__main__":
    main()
