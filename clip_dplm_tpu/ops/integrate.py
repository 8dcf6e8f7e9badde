"""ODE integration of learned vector fields — `lax.scan` Euler / Heun / RK4.

The reference trains flow nets via CFM regression but never implements the
inference-time integrator its generation API requires
(tong/tests/integration/test_generation.py + tong/README.md:127-129 — see
SURVEY.md section 3.5); this module supplies it as a compiled scan.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

VectorField = Callable[[jax.Array, jax.Array], jax.Array]  # (x, t) -> dx/dt


def integrate(
    vf: VectorField,
    x0: jax.Array,
    t0: float = 0.0,
    t1: float = 1.0,
    num_steps: int = 50,
    method: str = "heun",
    return_trajectory: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Integrate dx/dt = vf(x, t) from t0 to t1 with fixed steps.

    Returns (x_final, trajectory) where trajectory is (num_steps+1, ...)
    including the initial state (empty when return_trajectory=False).
    """
    dt = (t1 - t0) / num_steps
    B = x0.shape[0]

    def t_vec(t):
        return jnp.full((B,), t, jnp.float32)

    def euler(x, t):
        return x + dt * vf(x, t_vec(t))

    def heun(x, t):
        k1 = vf(x, t_vec(t))
        k2 = vf(x + dt * k1, t_vec(t + dt))
        return x + 0.5 * dt * (k1 + k2)

    def rk4(x, t):
        k1 = vf(x, t_vec(t))
        k2 = vf(x + 0.5 * dt * k1, t_vec(t + 0.5 * dt))
        k3 = vf(x + 0.5 * dt * k2, t_vec(t + 0.5 * dt))
        k4 = vf(x + dt * k3, t_vec(t + dt))
        return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    step = {"euler": euler, "heun": heun, "rk4": rk4}[method]

    def body(x, i):
        t = t0 + i.astype(jnp.float32) * dt
        x_next = step(x, t)
        return x_next, x_next if return_trajectory else jnp.zeros((0,))

    x_final, traj = jax.lax.scan(body, x0, jnp.arange(num_steps))
    if return_trajectory:
        traj = jnp.concatenate([x0[None], traj], axis=0)
    return x_final, traj
