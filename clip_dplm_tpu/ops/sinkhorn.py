"""Entropic + exact optimal transport, jitted for TPU.

TPU-native replacement for the POT / torchcfm OT machinery the reference pulls
in (tong/models/flows/ot_flow.py:3-7,63-65,92-96 — POT's C-accelerated
Sinkhorn/LP runs on the host, forcing a device->host->device round trip every
batch; SURVEY.md section 2.6 row 5, section 3.1 boundary #2):

  * `sinkhorn` — log-domain (logsumexp) Sinkhorn iterations under `lax.scan`,
    fully on-device and differentiable.
  * `sample_plan` — Gumbel-categorical sampling of target indices from a
    coupling, on-device.
  * `hungarian_pairing` — exact assignment via scipy on the host through
    `jax.pure_callback` with static shapes (the exact-OT minibatch pairing of
    torchcfm's ExactOptimalTransportConditionalFlowMatcher).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared euclidean cost matrix (n, m), fp32."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    return jnp.maximum(xx + yy - 2.0 * (x @ y.T), 0.0)


@partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn(
    cost: jax.Array,
    epsilon: float = 0.05,
    num_iters: int = 100,
    a: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Log-domain Sinkhorn. Returns (plan, f, g) with plan rows summing to a.

    P = exp((f_i + g_j - C_ij) / eps); f/g updated by logsumexp — stable for
    small epsilon where the kernel exp(-C/eps) underflows.
    """
    n, m = cost.shape
    loga = jnp.log(jnp.full((n,), 1.0 / n)) if a is None else jnp.log(a)
    logb = jnp.log(jnp.full((m,), 1.0 / m)) if b is None else jnp.log(b)
    cost = cost.astype(jnp.float32)

    def body(carry, _):
        f, g = carry
        f = epsilon * loga - epsilon * jax.nn.logsumexp(
            (g[None, :] - cost) / epsilon, axis=1
        )
        g = epsilon * logb - epsilon * jax.nn.logsumexp(
            (f[:, None] - cost) / epsilon, axis=0
        )
        return (f, g), None

    (f, g), _ = jax.lax.scan(
        body, (jnp.zeros(n, jnp.float32), jnp.zeros(m, jnp.float32)),
        None, length=num_iters,
    )
    plan = jnp.exp((f[:, None] + g[None, :] - cost) / epsilon)
    return plan, f, g


def sinkhorn_divergence_cost(plan: jax.Array, cost: jax.Array) -> jax.Array:
    """<P, C> transport cost of a coupling."""
    return jnp.sum(plan * cost)


def sample_plan(
    key: jax.Array, plan: jax.Array, num_samples: Optional[int] = None
) -> jax.Array:
    """Sample one target index per source row from the coupling (categorical
    over each row) — the minibatch-OT pairing step of OT-CFM, on-device."""
    logits = jnp.log(jnp.maximum(plan, 1e-30))
    n = plan.shape[0]
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k, l: jax.random.categorical(k, l))(keys, logits)


def _hungarian_host(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    _, col = linear_sum_assignment(cost)
    return col.astype(np.int32)


def hungarian_pairing(cost: jax.Array) -> jax.Array:
    """Exact OT assignment for uniform square marginals (a permutation),
    solved on the host with static shapes. The assignment is discrete, so the
    cost is stop-gradient'ed — pure_callback has no JVP rule and none is
    needed (minibatch-OT pairing is non-differentiable in torchcfm too)."""
    n, m = cost.shape
    assert n == m, "hungarian_pairing expects a square cost"
    return jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.lax.stop_gradient(cost.astype(jnp.float32)),
        vmap_method="sequential",
    )


def ot_pairing(
    key: jax.Array,
    x0: jax.Array,
    x1: jax.Array,
    method: str = "exact",
    epsilon: float = 0.05,
    num_iters: int = 100,
) -> jax.Array:
    """Return indices j(i) pairing each source x0_i with a target x1_j under
    the minibatch OT plan. method: exact (Hungarian, host) | sinkhorn
    (entropic, on-device) | independent (identity pairing)."""
    if method == "independent":
        return jnp.arange(x0.shape[0], dtype=jnp.int32)
    cost = pairwise_sqdist(x0, x1)
    if method == "exact":
        return hungarian_pairing(cost)
    if method == "sinkhorn":
        plan, _, _ = sinkhorn(cost, epsilon=epsilon, num_iters=num_iters)
        return sample_plan(key, plan)
    raise ValueError(f"unknown OT pairing method {method!r}")
