"""TripleFlowModel — the top-level model owning encoders + flows.

The reference *imports* `TripleFlowModel` (tong/experiments/train.py:8) but
never defines it (the class that exists is the flows-only `TripleFlow`,
tong/models/flows/triple_flow.py:5 — a known gap, SURVEY.md section 2.5).
Its interface is implied by tong/tests/integration/test_generation.py:
`model.cell_encoder(...)`, `model.cell_to_cell(a, b)`,
`model.cell_to_protein(x)`; this module implements that intent:

  * owns CellStateEncoder / PerturbationEncoder / ProteinEncoder + TripleFlow
    (plus a cell->cell flow for trajectory generation between cell states)
  * `encode(batch)` -> modality embeddings
  * training forward -> embeddings + CFM flow outputs (for
    losses.compute_all_losses)
  * `generate_*` -> ODE integration of the learned vector fields
    (ops/integrate.py), realizing the generation path the reference
    specifies but never implements (tong/README.md:127-129).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_dplm_tpu.config import Config
from clip_dplm_tpu.models.flows import OTFlow, TripleFlow
from clip_dplm_tpu.models.tong_encoders import (
    CellStateEncoder,
    PerturbationEncoder,
    ProteinEncoder,
)
from clip_dplm_tpu.ops.integrate import integrate


class TripleFlowModel(nn.Module):
    cfg: Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.cell_encoder = CellStateEncoder(
            cfg=c.encoders, dtype=self.dtype, param_dtype=self.param_dtype)
        self.pert_encoder = PerturbationEncoder(
            cfg=c.encoders, dtype=self.dtype, param_dtype=self.param_dtype)
        self.protein_encoder = ProteinEncoder(
            cfg=c.encoders, dtype=self.dtype, param_dtype=self.param_dtype)
        self.flows = TripleFlow(
            cfg=c.flow, dtype=self.dtype, param_dtype=self.param_dtype)
        self.cell_to_cell = OTFlow(
            cfg=c.flow, dtype=self.dtype, param_dtype=self.param_dtype,
            name="cell_to_cell")

    def encode(self, batch: Dict[str, jax.Array], *,
               deterministic: bool = True) -> Dict[str, jax.Array]:
        embs: Dict[str, jax.Array] = {}
        if "gene_expr" in batch:
            embs["cell_emb"] = self.cell_encoder(
                batch["gene_expr"], batch.get("dpt"), batch["edge_index"],
                batch["batch_idx"], batch.get("edge_mask"),
                batch.get("node_mask"), batch.get("num_graphs", 1),
                deterministic=deterministic,
            )
        if "pert_esm" in batch and "pert_values" in batch:
            embs["pert_emb"] = self.pert_encoder(
                batch["pert_esm"], batch["pert_values"],
                deterministic=deterministic,
            )
        if "protein_emb_raw" in batch:
            embs["protein_emb"] = self.protein_encoder(
                batch["protein_emb_raw"], deterministic=deterministic,
            )
        return embs

    def __call__(
        self, key: jax.Array, batch: Dict[str, jax.Array], *,
        deterministic: bool = True, return_regularization: bool = True,
    ):
        embs = self.encode(batch, deterministic=deterministic)
        # per-cell embeddings -> per-sample pairs: cells and proteins/perts
        # are matched by index in the batch
        key, cc_key = jax.random.split(key)
        flows = self.flows(
            key, embs, deterministic=deterministic,
            return_regularization=return_regularization,
        )
        if "cell_emb" in embs:
            # cell->cell trajectory flow: target is a second cell state when
            # provided (e.g. later pseudotime), else the batch itself — OT
            # pairing then matches each cell to its nearest evolution.
            target = batch.get("cell_target_emb", embs["cell_emb"])
            flows["cell_to_cell"] = self.cell_to_cell(
                cc_key, embs["cell_emb"], target,
                deterministic=deterministic,
                return_regularization=return_regularization,
            )
        return {"embeddings": embs, "flows": flows}

    # -- generation API (tong/tests/integration/test_generation.py intent) --

    def generate_cell_trajectory(
        self, cell_emb_1: jax.Array, cell_emb_2: jax.Array,
        num_steps: int = 50, method: str = "heun",
    ):
        """Integrate the cell->cell flow from state 1 toward state 2; the
        flow field is conditioned only on (x, t) at inference."""
        del cell_emb_2  # the learned field defines the trajectory from x0
        vf = lambda x, t: self.cell_to_cell.velocity(x, t)
        return integrate(vf, cell_emb_1, num_steps=num_steps, method=method)

    def generate_protein_from_cell(
        self, cell_emb: jax.Array, num_steps: int = 50, method: str = "heun",
    ):
        """Map a cell-state latent into protein space by integrating the
        cell->protein flow."""
        vf = lambda x, t: self.flows.cell_to_protein.velocity(x, t)
        return integrate(vf, cell_emb, num_steps=num_steps, method=method)

    def generate_pert_from_cell(
        self, cell_emb: jax.Array, num_steps: int = 50, method: str = "heun",
    ):
        vf = lambda x, t: self.flows.cell_to_pert.velocity(x, t)
        return integrate(vf, cell_emb, num_steps=num_steps, method=method)


def compute_all_losses(
    outputs: Dict[str, Any], cfg: Config, logit_scale: Optional[jax.Array] = None,
):
    """Weighted sum of contrastive + flow-matching + regularization losses
    (tong/utils/losses.py:34-80 semantics over the TripleFlowModel outputs)."""
    from clip_dplm_tpu.models.flows import flow_matching_loss
    from clip_dplm_tpu.ops.infonce import multiway_clip_loss

    w = cfg.train.loss_weights
    total = jnp.zeros(())
    metrics: Dict[str, jax.Array] = {}

    if w.contrastive > 0:
        ls = (
            logit_scale
            if logit_scale is not None
            else jnp.log(1.0 / cfg.contrastive.temperature)
        )
        closs, cmetrics = multiway_clip_loss(outputs["embeddings"], ls)
        total = total + w.contrastive * closs
        metrics.update(cmetrics)

    if w.flow > 0:
        for name, f in outputs["flows"].items():
            loss = flow_matching_loss(f["v"], f["ut"])
            total = total + w.flow * loss
            metrics[f"flow_{name}"] = loss

    if w.regularization > 0:
        for name, f in outputs["flows"].items():
            if "regularization" in f:
                total = total + w.regularization * f["regularization"]
                metrics[f"reg_{name}"] = f["regularization"]

    return total, metrics
