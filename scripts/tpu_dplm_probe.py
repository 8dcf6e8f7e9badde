"""DPLM sampler throughput on the real TPU — the serving-side number for the
generation subsystem (models/dplm.py lax.scan sampler; BASELINE.json
config 5 names the sampler, the reference never implements it).

Methodology (CLAUDE.md): the sampler is one jitted `lax.scan` over
num_diffusion_steps with the token carry threaded through every step (no
hoisting possible), and timing is host-fetch bounded. Per-call tunnel
overhead (~50 ms) is amortized over the full denoising chain.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models.dplm import DPLM, sample

    B = int(os.environ.get("DPLM_B", 256))
    length = int(os.environ.get("DPLM_LEN", 126))  # +cls/eos = 128 (aligned)
    steps = int(os.environ.get("DPLM_STEPS", 100))
    # DPLM_D/DPLM_NL/DPLM_NH select the trunk geometry. The default is the
    # 59M serving model; d=1280/33/20 is the ESM-2-650M geometry the north
    # star names for config 5 ("650M-scale protein encoder").
    d = int(os.environ.get("DPLM_D", 640))
    nl = int(os.environ.get("DPLM_NL", 12))
    nh = int(os.environ.get("DPLM_NH", 10))
    # DPLM_SCAN=1: lax.scan over stacked layer params — required in practice
    # at 650M scale (the 33-layer unrolled trunk is >30 min of XLA compile
    # through the tunnel; the scanned trunk compiles in ~1 min)
    scan = os.environ.get("DPLM_SCAN", "0") == "1"
    cfg = apply_overrides(Config(), [
        f"dplm.d_model={d}", f"dplm.num_layers={nl}", f"dplm.num_heads={nh}",
        f"dplm.num_diffusion_steps={steps}",
        f"dplm.scan_layers={'true' if scan else 'false'}",
    ])
    model = DPLM(cfg=cfg.dplm)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((2, 8), jnp.int32))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    # DPLM_RNG=unsafe_rbg switches the sampling keys to the hardware RNG
    # (threefry is the jax default; the per-step Gumbel draw over
    # (B, S, vocab) is threefry VPU work the rbg generator does in hardware)
    impl = os.environ.get("DPLM_RNG", "")
    mk_key = (lambda s: jax.random.key(s, impl=impl)) if impl \
        else jax.random.PRNGKey

    run = jax.jit(lambda k: sample(model, params, k, B, length,
                                   num_steps=steps))
    toks, lp = run(mk_key(0))  # compile + warmup
    float(jnp.sum(lp))
    t0 = time.perf_counter()
    toks, lp = run(mk_key(1))
    assert bool(jnp.all(toks[:, 0] == 0))
    float(jnp.sum(lp))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "dplm_sampler_throughput",
        "params": n_params,
        "batch": B, "length": length, "diffusion_steps": steps,
        "seqs_per_sec": round(B / dt, 2),
        "residues_per_sec": round(B * length / dt, 1),
        "sec_per_batch": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
