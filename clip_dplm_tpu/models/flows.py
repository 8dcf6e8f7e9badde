"""OT conditional flow matching (OT-CFM) flows over the aligned latent spaces.

Capability match for tong/models/flows/ot_flow.py + triple_flow.py, with the
torchcfm matchers reimplemented natively (SURVEY.md section 2.6 row 5):

  * `sample_location_and_conditional_flow` — given a source/target batch,
    pair them with minibatch OT (exact Hungarian via host callback, entropic
    Sinkhorn fully on-device, or independent), draw t ~ U(0,1), and return
      exact_ot / independent:  x_t = (1-t) x0 + t x1 + sigma eps,
                               u_t = x1 - x0
      sb (Schrodinger bridge): sigma_t = sigma sqrt(t(1-t)),
                               x_t = mu_t + sigma_t eps,
                               u_t = (1-2t)/(2 t(1-t)) (x_t - mu_t) + x1 - x0
    (torchcfm ExactOptimalTransportConditionalFlowMatcher /
     SchrodingerBridgeConditionalFlowMatcher semantics, ot_flow.py:58-113;
     SB uses the entropic plan with reg = 2 sigma^2, ot_flow.py:92-96.)
  * `VectorFieldNet` — time encoder (1 -> time_dim -> latent) + MLP over
    [x_t, u_t, t_emb] with LN/GELU and a Tanh output layer
    (ot_flow.py:9-40).
  * regularizers — path length ||v||^2 and Jacobian Frobenius norm via
    jax.jacrev on a single sample (ot_flow.py:41-56).
  * `TripleFlow` — flows cell->pert, cell->protein, pert->protein selected by
    flow_type, optional feature-mixing guidance, pert flows skipped when the
    modality is absent (triple_flow.py:5-82).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_dplm_tpu.config import FlowConfig
from clip_dplm_tpu.ops.sinkhorn import ot_pairing


def sample_location_and_conditional_flow(
    key: jax.Array,
    x0: jax.Array,
    x1: jax.Array,
    flow_type: str = "exact_ot",
    sigma: float = 0.1,
    sinkhorn_iters: int = 100,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (t, x_t, u_t); see module docstring for the math."""
    k_pair, k_t, k_eps = jax.random.split(key, 3)
    B = x0.shape[0]
    if flow_type == "exact_ot":
        idx = ot_pairing(k_pair, x0, x1, method="exact")
    elif flow_type == "sb":
        idx = ot_pairing(
            k_pair, x0, x1, method="sinkhorn",
            epsilon=2.0 * sigma * sigma, num_iters=sinkhorn_iters,
        )
    elif flow_type == "independent":
        idx = ot_pairing(k_pair, x0, x1, method="independent")
    else:
        raise ValueError(f"unknown flow_type {flow_type!r}")
    x1 = x1[idx]

    t = jax.random.uniform(k_t, (B,), jnp.float32)
    eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
    tt = t[:, None]
    mu_t = (1.0 - tt) * x0 + tt * x1
    if flow_type == "sb":
        sigma_t = sigma * jnp.sqrt(jnp.clip(tt * (1.0 - tt), 1e-6))
        xt = mu_t + sigma_t * eps
        ut = (1.0 - 2.0 * tt) / (2.0 * jnp.clip(tt * (1.0 - tt), 1e-6)) * (
            xt - mu_t
        ) + (x1 - x0)
    else:
        xt = mu_t + sigma * eps
        ut = x1 - x0
    return t, xt, ut


class VectorFieldNet(nn.Module):
    """v_theta(x_t, u_t, t): MLP with time embedding (ot_flow.py:9-40)."""

    cfg: FlowConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xt, ut, t, *, deterministic: bool = True):
        c = self.cfg
        parts = [xt.astype(self.dtype), ut.astype(self.dtype)]
        if c.use_time_embedding:
            t_emb = nn.Dense(c.time_embed_dim, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="time_fc0")(
                t[:, None].astype(self.dtype))
            t_emb = nn.LayerNorm(dtype=jnp.float32,
                                 param_dtype=self.param_dtype,
                                 name="time_ln")(t_emb).astype(self.dtype)
            t_emb = nn.gelu(t_emb)
            t_emb = nn.Dense(c.latent_dim, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="time_fc1")(t_emb)
            parts.append(t_emb)
        h = jnp.concatenate(parts, axis=-1)
        for i in range(c.n_layers):
            h = nn.Dense(c.hidden_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"fc{i}")(h)
            h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                             name=f"ln{i}")(h).astype(self.dtype)
            h = nn.gelu(h)
            h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.Dense(c.latent_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="out")(h)
        return jnp.tanh(h)

    def velocity(self, x, t, *, deterministic: bool = True):
        """Inference-time vector field v(x, t) with u_t = 0 (the conditional
        input is unavailable at generation time)."""
        return self(x, jnp.zeros_like(x), t, deterministic=deterministic)


def path_length_regularization(v: jax.Array) -> jax.Array:
    """mean ||v||^2 (tong/utils/losses.py:21-23)."""
    return jnp.mean(jnp.sum(v * v, axis=-1))


def jacobian_regularization(net_fn, xt: jax.Array) -> jax.Array:
    """Frobenius norm of the Jacobian of the net at the first sample
    (ot_flow.py:50-55 computes it at xt[0:1])."""
    jac = jax.jacrev(lambda x: net_fn(x[None])[0])(xt[0])
    return jnp.sqrt(jnp.sum(jac * jac))


def flow_matching_loss(v: jax.Array, target_v: jax.Array) -> jax.Array:
    """MSE (tong/utils/losses.py:30-32)."""
    return jnp.mean((v - target_v) ** 2)


class OTFlow(nn.Module):
    """One source->target CFM flow: sample (t, x_t, u_t), predict v."""

    cfg: FlowConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.net = VectorFieldNet(cfg=self.cfg, dtype=self.dtype,
                                  param_dtype=self.param_dtype)

    def __call__(
        self, key, source, target, *,
        deterministic: bool = True, return_regularization: bool = False,
    ):
        c = self.cfg
        t, xt, ut = sample_location_and_conditional_flow(
            key, source.astype(jnp.float32), target.astype(jnp.float32),
            flow_type=c.flow_type, sigma=c.sigma,
            sinkhorn_iters=c.sinkhorn_iters,
        )
        v = self.net(xt, ut, t, deterministic=deterministic)
        out = {"v": v, "xt": xt, "t": t, "ut": ut}
        if return_regularization:
            reg = jnp.zeros(())
            if c.use_path_length_reg:
                reg = reg + path_length_regularization(v)
            if c.use_jacobian_reg:
                reg = reg + jacobian_regularization(
                    lambda x: self.net(
                        x, jnp.zeros_like(x),
                        jnp.zeros(x.shape[0]), deterministic=True,
                    ),
                    xt,
                )
            out["regularization"] = reg
        return out

    def velocity(self, x, t, *, deterministic: bool = True):
        return self.net.velocity(x, t, deterministic=deterministic)


class TripleFlow(nn.Module):
    """Flows cell->pert, cell->protein, pert->protein over the encoder latents
    (tong/models/flows/triple_flow.py:5-82). Pert flows are skipped when the
    perturbation modality is absent; optional feature mixing conditions each
    source on its target (triple_flow.py:32-35,59-60)."""

    cfg: FlowConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        mk = lambda name: OTFlow(cfg=self.cfg, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name=name)
        self.cell_to_pert = mk("cell_to_pert")
        self.cell_to_protein = mk("cell_to_protein")
        self.pert_to_protein = mk("pert_to_protein")
        if self.cfg.use_feature_mixing:
            self.feature_mixer = nn.Dense(
                self.cfg.latent_dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name="feature_mixer",
            )

    def _mix(self, source, target):
        if not self.cfg.use_feature_mixing:
            return source
        mixed = self.feature_mixer(
            jnp.concatenate([source, target], axis=-1).astype(self.dtype)
        )
        return source + mixed

    def __call__(
        self, key, embeddings: Dict[str, jax.Array], *,
        deterministic: bool = True, return_regularization: bool = False,
    ) -> Dict[str, Dict[str, jax.Array]]:
        keys = jax.random.split(key, 3)
        out: Dict[str, Dict[str, jax.Array]] = {}
        cell = embeddings.get("cell_emb")
        pert = embeddings.get("pert_emb")
        protein = embeddings.get("protein_emb")
        if cell is not None and pert is not None:
            out["cell_to_pert"] = self.cell_to_pert(
                keys[0], self._mix(cell, pert), pert,
                deterministic=deterministic,
                return_regularization=return_regularization,
            )
        if cell is not None and protein is not None:
            out["cell_to_protein"] = self.cell_to_protein(
                keys[1], self._mix(cell, protein), protein,
                deterministic=deterministic,
                return_regularization=return_regularization,
            )
        if pert is not None and protein is not None:
            out["pert_to_protein"] = self.pert_to_protein(
                keys[2], self._mix(pert, protein), protein,
                deterministic=deterministic,
                return_regularization=return_regularization,
            )
        return out
