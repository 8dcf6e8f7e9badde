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
    def chained_attn_time(fn, iters=20):
        @jax.jit
        def run(q):
            def body(c, _):
                return fn(c, k, v).astype(c.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=iters)
            return out.sum()
        float(run(q))
        t0 = time.perf_counter()
        float(run(q))
        return (time.perf_counter() - t0) / iters

    t_flash = chained_attn_time(lambda q, k, v: flash_attention(q, k, v, mask=mask))
    t_ref = chained_attn_time(lambda q, k, v: attention_reference(q, k, v, mask=mask))
    line_ok = diff < 5e-2 and t_flash < t_ref * 1.1
    ok &= line_ok
    print(f"flash_attention S={S}: maxdiff={diff:.2e} "
          f"{t_flash*1e3:.2f}ms vs xla {t_ref*1e3:.2f}ms "
          f"{'OK' if line_ok else 'FAIL'}")

    # fused InfoNCE parity + speed — FULL gradients (da, db, dls; a partial
    # grad lets XLA DCE half its backward while the custom VJP cannot) and a
    # CHAINED scan (constant-input bodies get hoisted, see CLAUDE.md).
    Bc, Dc = 8192, 512
    a = jnp.asarray(rng.normal(size=(Bc, Dc)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Bc, Dc)).astype(np.float32))
    ls = jnp.asarray(np.float32(2.6592))
    l1, _ = fused_clip_loss(a, b, ls, dot_dtype=jnp.bfloat16)
    l2, _ = infonce.clip_loss(a, b, ls)
    rel = abs(float(l1) - float(l2)) / abs(float(l2))

    def chained_grad_time(loss_fn, iters=10):
        @jax.jit
        def run(a, b, ls):
            def body(carry, _):
                aa, bb, ll = carry
                g = jax.grad(lambda a, b, l: loss_fn(a, b, l)[0],
                             argnums=(0, 1, 2))(aa, bb, ll)
                return (aa - 1e-6 * g[0], bb - 1e-6 * g[1], ll - 1e-6 * g[2]), g[2]
            _, hist = jax.lax.scan(body, (a, b, ls), None, length=iters)
            return hist[-1]
        float(run(a, b, ls))
        t0 = time.perf_counter()
        float(run(a, b, ls))
        return (time.perf_counter() - t0) / iters

    import functools

    t_fused = chained_grad_time(
        functools.partial(fused_clip_loss, dot_dtype=jnp.bfloat16))
    t_xla = chained_grad_time(infonce.clip_loss)
    line_ok = rel < 1e-3 and t_fused < t_xla * 1.1
    ok &= line_ok
    print(f"fused_infonce B={Bc}: rel={rel:.2e} "
          f"{t_fused*1e3:.2f}ms vs xla {t_xla*1e3:.2f}ms "
          f"{'OK' if line_ok else 'FAIL'}")

    print("SMOKE", "PASS" if ok else "FAIL", f"on {jax.devices()}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
