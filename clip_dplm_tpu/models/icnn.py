"""Input-convex neural networks (Brenier potentials) + transport maps.

Capability match for triple_flow/2_icnn_core.py + 4_transport_maps.py:
  * ConvexLayer — y = act(LN(W x + scale * softplus(V + eps) z)), unconstrained
    W, softplus-positive z-path weights, learnable scale, orthogonal init,
    train-time z-contribution norm clamp (2_icnn_core.py:42-127).
  * SingleCellICNN — input LN -> ConvexLayer chain -> Dense(1) scalar
    potential Psi (2_icnn_core.py:129-179).
  * transport map T = grad(Psi) via `nn.grad` (lifted jax.grad — natively
    composable and jittable, replacing torch double-backprop autograd;
    2_icnn_core.py:181-211, fp32 island kept: the gradient is computed on an
    fp32 potential). Train-time per-sample grad-norm clip preserved.
  * Hessian via jax.jacfwd-of-grad per sample for convexity property checks
    (2_icnn_core.py:213-241; + hessian_reg * I).
  * TransportCost — mean L2 + L1 sparsity (4_transport_maps.py:46-87).
  * SingleCellTransport — input LN -> T=grad Psi -> output LN
    (4_transport_maps.py:89-145).
  * TripleTransportMaps — T_CP, T_CE, T_PE with the consistency loss
    T_CE(x) ~= T_PE(T_CP(x)) when all modalities present. The reference's
    ConsistencyChecker called a tensor as a function
    (4_transport_maps.py:243, a known defect); here the composed map is the
    actual composition of the transport modules.

Note on strict convexity: LayerNorm (use_layer_norm=True, the reference
default) breaks the ICNN convexity guarantee; the convexity property test
runs with use_layer_norm=False where Psi is convex by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_dplm_tpu.config import ICNNConfig


def _softplus_inverse(y: float) -> float:
    return math.log(math.expm1(y))


class ConvexLayer(nn.Module):
    cfg: ICNNConfig
    output_dim: int

    @nn.compact
    def __call__(self, x, z=None, *, train: bool = False):
        c = self.cfg
        y = nn.Dense(
            self.output_dim,
            kernel_init=nn.initializers.orthogonal(),
            param_dtype=jnp.float32,
            name="linear",
        )(x)
        if z is not None:
            pos_w = self.param(
                "pos_weights", nn.initializers.zeros,
                (z.shape[-1], self.output_dim), jnp.float32,
            )
            if c.strict_convex:
                scale_raw = self.param(
                    "scale",
                    nn.initializers.constant(_softplus_inverse(c.init_scale)),
                    (1,), jnp.float32,
                )
                scale = jax.nn.softplus(scale_raw)
            else:
                scale = self.param(
                    "scale", nn.initializers.constant(c.init_scale), (1,),
                    jnp.float32,
                )
            w = jax.nn.softplus(pos_w + c.eps)  # non-negative z-path weights
            z_contrib = (z @ w) * scale
            if train:
                # stabilization: clamp mean |z contribution|
                # (2_icnn_core.py:110-116); norm is stop-gradient like the
                # reference's no_grad block
                z_scale = jax.lax.stop_gradient(jnp.mean(jnp.abs(z_contrib)))
                factor = jnp.where(
                    z_scale > c.gradient_clip, c.gradient_clip / z_scale, 1.0
                )
                z_contrib = z_contrib * factor
            y = y + z_contrib
        if c.use_layer_norm:
            y = nn.LayerNorm(param_dtype=jnp.float32, name="norm")(y)
        if c.activation == "softplus":
            return jax.nn.softplus(y)
        return jax.nn.celu(y)


class SingleCellICNN(nn.Module):
    """Scalar convex potential Psi(x) over (B, input_dim), fp32."""

    cfg: ICNNConfig

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        c = self.cfg
        x = x.astype(jnp.float32)
        if c.use_layer_norm:
            # input LN (2_icnn_core.py:144) — note it makes Psi convex in the
            # *normalized* input only; disable use_layer_norm for a potential
            # that is convex in x itself (the strict Brenier setting)
            x = nn.LayerNorm(param_dtype=jnp.float32, name="input_norm")(x)
        z = None
        for i, hidden in enumerate(c.hidden_dims):
            z = ConvexLayer(cfg=c, output_dim=hidden, name=f"layer_{i}")(
                x, z, train=train
            )
        if c.strict_convex:
            w_raw = self.param(
                "final_pos_weights", nn.initializers.constant(0.0),
                (z.shape[-1], 1), jnp.float32,
            )
            bias = self.param("final_bias", nn.initializers.zeros, (1,),
                              jnp.float32)
            out = z @ jax.nn.softplus(w_raw + c.eps) + bias
        else:
            out = nn.Dense(1, param_dtype=jnp.float32, name="final")(z)
        return out


def icnn_gradient(
    icnn: SingleCellICNN, variables, x: jax.Array, *,
    train: bool = False, clip: Optional[float] = None,
) -> jax.Array:
    """T(x) = grad Psi(x) as a plain function of (variables, x) — for use
    outside linen modules. fp32 throughout."""

    def psi(xx):
        return icnn.apply(variables, xx, train=train).sum()

    g = jax.grad(psi)(x.astype(jnp.float32))
    if train and clip:
        norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
        g = jnp.where(norm > clip, g * clip / jnp.maximum(norm, 1e-12), g)
    return g


def icnn_hessian(
    icnn: SingleCellICNN, variables, x: jax.Array, reg: float = 0.0
) -> jax.Array:
    """Per-sample Hessian (B, d, d) of Psi for convexity verification
    (2_icnn_core.py:213-241). jacfwd-of-grad: one forward sweep per input dim."""

    def psi_single(xx):
        return icnn.apply(variables, xx[None], train=False)[0, 0]

    hess = jax.vmap(jax.jacfwd(jax.grad(psi_single)))(x.astype(jnp.float32))
    if reg:
        hess = hess + reg * jnp.eye(x.shape[-1])
    return hess


def transport_cost(
    transported: jax.Array, target: jax.Array, sparsity_weight: float = 0.01
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Mean L2 + L1 sparsity (TransportCost, 4_transport_maps.py:46-87)."""
    w2 = jnp.linalg.norm(transported - target, axis=-1).mean()
    sparsity = sparsity_weight * (
        jnp.abs(transported).sum(-1).mean() + jnp.abs(target).sum(-1).mean()
    )
    total = w2 + sparsity
    return total, {"w2_cost": w2, "sparsity_cost": sparsity}


class SingleCellTransport(nn.Module):
    """input LN -> T = grad Psi -> output LN (4_transport_maps.py:89-145)."""

    cfg: ICNNConfig
    input_dim: int
    output_dim: int

    def setup(self):
        self.transport_net = SingleCellICNN(self.cfg)
        self.input_norm = nn.LayerNorm(param_dtype=jnp.float32)
        self.output_norm = nn.LayerNorm(param_dtype=jnp.float32)

    def __call__(self, source, target=None, *, train: bool = False):
        src = self.input_norm(source.astype(jnp.float32))
        # lifted grad: d/dx of the scalar potential, through this module's own
        # parameters (fp32 island — triple_flow/2_icnn_core.py:195)
        (grads,) = nn.grad(
            lambda mdl, xx: mdl.transport_net(xx, train=train).sum(), self, src
        )
        if train and self.cfg.gradient_clip:
            norm = jnp.linalg.norm(grads, axis=-1, keepdims=True)
            grads = jnp.where(
                norm > self.cfg.gradient_clip,
                grads * self.cfg.gradient_clip / jnp.maximum(norm, 1e-12),
                grads,
            )
        transported = self.output_norm(grads)
        if target is not None:
            tgt = self.output_norm(target.astype(jnp.float32))
            cost, metrics = transport_cost(
                transported, tgt, self.cfg.sparsity_weight
            )
            return {"transported": transported, "cost": cost, "metrics": metrics}
        return {"transported": transported}

    def transport(self, source):
        return self(source)["transported"]


class TripleTransportMaps(nn.Module):
    """Three Brenier maps cell->pert (T_CP), cell->protein (T_CE),
    pert->protein (T_PE) with composition consistency
    (4_transport_maps.py:147-246, intent)."""

    cfg: ICNNConfig
    cell_dim: int
    pert_dim: int
    protein_dim: int

    def setup(self):
        mk = lambda din, dout, name: SingleCellTransport(
            cfg=self.cfg, input_dim=din, output_dim=dout, name=name
        )
        self.cell_to_pert = mk(self.cell_dim, self.pert_dim, "cell_to_pert")
        self.cell_to_protein = mk(self.cell_dim, self.protein_dim, "cell_to_protein")
        self.pert_to_protein = mk(self.pert_dim, self.protein_dim, "pert_to_protein")

    def __call__(
        self,
        cell_states,
        pert_states=None,
        protein_states=None,
        *,
        train: bool = False,
    ) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if pert_states is not None:
            out["cell_to_pert"] = self.cell_to_pert(
                cell_states, pert_states, train=train
            )
        if protein_states is not None:
            out["cell_to_protein"] = self.cell_to_protein(
                cell_states, protein_states, train=train
            )
        if pert_states is not None and protein_states is not None:
            out["pert_to_protein"] = self.pert_to_protein(
                pert_states, protein_states, train=train
            )
            if train:
                # T_CE(x) ~= T_PE(T_CP(x)): compose the actual maps
                composed = self.pert_to_protein(
                    out["cell_to_pert"]["transported"], train=train
                )["transported"]
                direct = out["cell_to_protein"]["transported"]
                out["consistency_loss"] = jnp.mean((direct - composed) ** 2)
        return out


def total_transport_loss(
    outputs: Dict[str, Any], consistency_weight: float = 0.1
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sum of per-map costs + weighted consistency (triple_flow/5_training.py
    _compute_loss:265-279 semantics)."""
    total = jnp.zeros(())
    metrics: Dict[str, jax.Array] = {}
    for name in ("cell_to_pert", "cell_to_protein", "pert_to_protein"):
        if name in outputs and "cost" in outputs[name]:
            total = total + outputs[name]["cost"]
            metrics[f"{name}_w2"] = outputs[name]["metrics"]["w2_cost"]
    if "consistency_loss" in outputs:
        total = total + consistency_weight * outputs["consistency_loss"]
        metrics["consistency"] = outputs["consistency_loss"]
    return total, metrics
