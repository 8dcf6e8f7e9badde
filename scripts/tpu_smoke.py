"""On-hardware kernel smoke: parity + timing of the Pallas kernels vs their
XLA reference formulations on the real chip.

Usage: `timeout 570 python scripts/tpu_smoke.py` — prints one line per check.
(Tests run kernels in interpret mode on CPU; this is the compiled-on-TPU
complement, run manually or by the round driver.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fetch_timed(fn, *args, iters=20):
    """Scan-chained timing with a host fetch (see CLAUDE.md tunnel notes)."""
    @jax.jit
    def run(*a):
        def body(c, _):
            return c, fn(*a)
        _, outs = jax.lax.scan(body, 0, None, length=iters)
        return jax.tree_util.tree_map(lambda x: x[-1], outs)

    out = run(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    out = run(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from clip_dplm_tpu.ops.attention import attention_reference
    from clip_dplm_tpu.ops.flash_attention import flash_attention
    from clip_dplm_tpu.ops import infonce
    from clip_dplm_tpu.ops.fused_infonce import fused_clip_loss

    rng = np.random.default_rng(0)
    ok = True

    # flash attention parity + speed
    B, H, S, D = 8, 8, 1024, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32), jnp.bfloat16)
        for _ in range(3)
    )
    mask = jnp.asarray(np.arange(S)[None, :] < rng.integers(S // 2, S, (B, 1)))
    o1 = flash_attention(q, k, v, mask=mask)
    o2 = attention_reference(q, k, v, mask=mask)
    diff = float(jnp.max(jnp.abs(
        jnp.where(mask[:, None, :, None], (o1 - o2).astype(jnp.float32), 0.0))))
    t_flash = fetch_timed(lambda q: flash_attention(q, k, v, mask=mask).sum(), q)
    t_ref = fetch_timed(lambda q: attention_reference(q, k, v, mask=mask).sum(), q)
    line_ok = diff < 5e-2 and t_flash < t_ref * 1.2
    ok &= line_ok
    print(f"flash_attention S={S}: maxdiff={diff:.2e} "
          f"{t_flash*1e3:.2f}ms vs xla {t_ref*1e3:.2f}ms "
          f"{'OK' if line_ok else 'FAIL'}")

    # fused InfoNCE parity + speed
    Bc, Dc = 8192, 512
    a = jnp.asarray(rng.normal(size=(Bc, Dc)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Bc, Dc)).astype(np.float32))
    ls = jnp.asarray(np.float32(2.6592))
    l1, _ = fused_clip_loss(a, b, ls, dot_dtype=jnp.bfloat16)
    l2, _ = infonce.clip_loss(a, b, ls)
    rel = abs(float(l1) - float(l2)) / abs(float(l2))
    t_fused = fetch_timed(
        lambda a: jax.grad(
            lambda a: fused_clip_loss(a, b, ls, dot_dtype=jnp.bfloat16)[0])(a).sum(),
        a)
    t_xla = fetch_timed(
        lambda a: jax.grad(lambda a: infonce.clip_loss(a, b, ls)[0])(a).sum(), a)
    line_ok = rel < 1e-3 and t_fused < t_xla * 1.2
    ok &= line_ok
    print(f"fused_infonce B={Bc}: rel={rel:.2e} "
          f"{t_fused*1e3:.2f}ms vs xla {t_xla*1e3:.2f}ms "
          f"{'OK' if line_ok else 'FAIL'}")

    print("SMOKE", "PASS" if ok else "FAIL", f"on {jax.devices()}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
