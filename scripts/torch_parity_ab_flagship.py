"""Flagship convergence A/B: the token-transformer RNA<->RBP CLIP class.

JAX `RNARBPCLIP` (models/token_towers.py) vs a faithful PyTorch replica of the
reference's 71.6M-param model class (current/rna_clip_codes.ipynb cell 28):

  torch arm (reference semantics, small geometry):
    * RNARBPCLIPEncoder — nn.TransformerEncoderLayer stack at the RAW token
      dim (d_model == input_dim), nhead, 4x FFN, dropout 0.1, final LN
      (batch_first=True so the (B, S, E) batches are actually consumed as
      batches — the reference left the default False, one of its defects)
    * position-0 pooling of the encoder output (cell 28 `rna_enc[:, 0]`)
    * RNARBPCLIPProjectionHead — skip + layer_scale(1e-4) * deep projection
      (Linear-LN-GELU-Drop x2 at 2x width, Linear-LN)
    * F.normalize + learned logit_scale exp, symmetric CE
    * NaN-pad -> key-padding masks (cell 24 create_padding_mask semantics;
      here masks come precomputed from the collate layer, same information)
  recipe (cell 29): AdamW lr=1e-4 wd=0.01, batch 32, fixed epoch budget
    (early stopping dropped for determinism of the A/B).

The JAX arm is the framework's intentional redesign of the same class
(input_proj to d_model, learned CLS token, pre-LN blocks) trained by the
registry Trainer loss on the identical data/seeds/recipe. The BASELINE.json
gate: converged retrieval R@1 within 0.5% (or JAX better).

Usage:  python scripts/torch_parity_ab_flagship.py [--epochs 15] [--seeds 3]
Writes evidence/parity_ab_flagship.json (tracked).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# small geometry for a CPU-trainable A/B of the same model CLASS
DIM_A, DIM_B = 32, 48          # raw token dims (reference: 120 / 1280)
S_A, S_B = 24, 32              # padded sequence lengths
D_MODEL, LAYERS, HEADS = 64, 2, 4
PROJ = 64
BS, LR, WD = 32, 1e-4, 0.01


def make_data(seed: int):
    from clip_dplm_tpu.data.collate import TokenPairDataset

    ds = TokenPairDataset.synthetic(
        1200, dim_a=DIM_A, dim_b=DIM_B,
        len_range_a=(6, S_A), len_range_b=(8, S_B),
        latent_dim=8, noise=0.6, seed=seed,
    )
    cut = int(len(ds) * 0.85)
    tr = TokenPairDataset(ds.seqs_a[:cut], ds.seqs_b[:cut])
    va = TokenPairDataset(ds.seqs_a[cut:], ds.seqs_b[cut:])
    return tr, va


def batches(ds, seed, shuffle=True):
    return ds.batches(BS, seed=seed, shuffle=shuffle, pad_to_a=S_A, pad_to_b=S_B)


def retrieval_r_at_1(za: np.ndarray, zb: np.ndarray) -> float:
    za = za / np.linalg.norm(za, axis=1, keepdims=True)
    zb = zb / np.linalg.norm(zb, axis=1, keepdims=True)
    sim = za @ zb.T
    hits_a = (sim.argmax(1) == np.arange(len(za))).mean()
    hits_b = (sim.argmax(0) == np.arange(len(za))).mean()
    return float(0.5 * (hits_a + hits_b))


# ---------------------------------------------------------------------------
# torch replica (rna nb cell 28 classes at small geometry)
# ---------------------------------------------------------------------------


def run_torch(tr, va, epochs: int, seed: int):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)

    class Encoder(nn.Module):  # RNARBPCLIPEncoder, cell 28
        def __init__(self, dim):
            super().__init__()
            self.layers = nn.ModuleList([
                nn.TransformerEncoderLayer(
                    d_model=dim, nhead=HEADS, dim_feedforward=dim * 4,
                    dropout=0.1, batch_first=True,
                )
                for _ in range(LAYERS)
            ])
            self.layernorm = nn.LayerNorm(dim)

        def forward(self, x, pad_mask):
            for layer in self.layers:
                x = layer(x, src_key_padding_mask=pad_mask)
            return self.layernorm(x)

    class ProjHead(nn.Module):  # RNARBPCLIPProjectionHead, cell 28
        def __init__(self, din, dout):
            super().__init__()
            self.skip = nn.Linear(din, dout)
            self.layer_scale = nn.Parameter(torch.ones(1) * 1e-4)
            self.projection = nn.Sequential(
                nn.Linear(din, din * 2), nn.LayerNorm(din * 2), nn.GELU(),
                nn.Dropout(0.1),
                nn.Linear(din * 2, din * 2), nn.LayerNorm(din * 2), nn.GELU(),
                nn.Dropout(0.1),
                nn.Linear(din * 2, dout), nn.LayerNorm(dout),
            )

        def forward(self, x):
            return self.skip(x) + self.layer_scale * self.projection(x)

    class Model(nn.Module):  # RNARBPCLIPModel, cell 28
        def __init__(self):
            super().__init__()
            self.enc_a, self.enc_b = Encoder(DIM_A), Encoder(DIM_B)
            self.proj_a = ProjHead(DIM_A, PROJ)
            self.proj_b = ProjHead(DIM_B, PROJ)
            self.logit_scale = nn.Parameter(torch.ones([]) * np.log(1 / 0.07))

        def forward(self, a, am, b, bm):
            ha = self.enc_a(a, ~am)  # True == pad in torch semantics
            hb = self.enc_b(b, ~bm)
            za = F.normalize(self.proj_a(ha[:, 0]), dim=-1)
            zb = F.normalize(self.proj_b(hb[:, 0]), dim=-1)
            return za, zb, self.logit_scale.exp() * za @ zb.T

    model = Model()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    for epoch in range(epochs):
        model.train()
        for bt in batches(tr, seed * 1000 + epoch):
            a = torch.from_numpy(bt["rna_tokens"])
            am = torch.from_numpy(bt["rna_mask"])
            b = torch.from_numpy(bt["rbp_tokens"])
            bm = torch.from_numpy(bt["rbp_mask"])
            _, _, logits = model(a, am, b, bm)
            labels = torch.arange(len(a))
            loss = 0.5 * (
                torch.nn.functional.cross_entropy(logits, labels)
                + torch.nn.functional.cross_entropy(logits.T, labels)
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
    model.eval()
    zas, zbs = [], []
    for bt in batches(va, 0, shuffle=False):
        with torch.no_grad():
            za, zb, _ = model(
                torch.from_numpy(bt["rna_tokens"]),
                torch.from_numpy(bt["rna_mask"]),
                torch.from_numpy(bt["rbp_tokens"]),
                torch.from_numpy(bt["rbp_mask"]),
            )
        zas.append(za.numpy())
        zbs.append(zb.numpy())
    return {"r_at_1": retrieval_r_at_1(np.concatenate(zas), np.concatenate(zbs))}


# ---------------------------------------------------------------------------
# jax arm (the framework under test, registry-style)
# ---------------------------------------------------------------------------


def run_jax(tr, va, epochs: int, seed: int):
    import jax
    import jax.numpy as jnp

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models.token_towers import RNARBPCLIP
    from clip_dplm_tpu.train import create_train_state, make_train_step

    cfg = apply_overrides(
        Config(),
        [
            "experiment=rna_rbp",
            f"rna_tower.input_dim={DIM_A}", f"rbp_tower.input_dim={DIM_B}",
            f"rna_tower.d_model={D_MODEL}", f"rbp_tower.d_model={D_MODEL}",
            f"rna_tower.num_layers={LAYERS}", f"rbp_tower.num_layers={LAYERS}",
            f"rna_tower.num_heads={HEADS}", f"rbp_tower.num_heads={HEADS}",
            f"rna_tower.max_len={S_A}", f"rbp_tower.max_len={S_B}",
            f"projection.dim={PROJ}", "projection.kind=optimized",
            f"projection.hidden_dim={2 * D_MODEL}",
            f"train.batch_size={BS}", f"train.seed={seed}",
            f"train.optim.learning_rate={LR}",
            f"train.optim.weight_decay={WD}",
            "train.optim.schedule=constant",
            "train.optim.grad_clip_norm=0",
        ],
    )
    model = RNARBPCLIP(cfg=cfg, dtype=jnp.float32)
    ex = next(iter(batches(tr, 0)))
    ex = {k: jnp.asarray(v) for k, v in ex.items()}
    state = create_train_state(model, cfg, ex)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    for epoch in range(epochs):
        for bt in batches(tr, seed * 1000 + epoch):
            state, _ = step(state, {k: jnp.asarray(v) for k, v in bt.items()})
    zas, zbs = [], []
    for bt in batches(va, 0, shuffle=False):
        out = model.apply(
            {"params": state.params},
            {k: jnp.asarray(v) for k, v in bt.items()},
            deterministic=True,
        )
        zas.append(np.asarray(out["emb_a"]))
        zbs.append(np.asarray(out["emb_b"]))
    return {"r_at_1": retrieval_r_at_1(np.concatenate(zas), np.concatenate(zbs))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    results = {"torch": [], "jax": []}
    for seed in range(args.seeds):
        tr, va = make_data(seed)
        t0 = time.time()
        rt = run_torch(tr, va, args.epochs, seed)
        t1 = time.time()
        rj = run_jax(tr, va, args.epochs, seed)
        t2 = time.time()
        results["torch"].append(rt)
        results["jax"].append(rj)
        print(
            f"seed {seed}: torch R@1={rt['r_at_1']:.4f} ({t1 - t0:.0f}s)  "
            f"jax R@1={rj['r_at_1']:.4f} ({t2 - t1:.0f}s)",
            flush=True,
        )

    summary = {}
    for side in results:
        r1 = [r["r_at_1"] for r in results[side]]
        summary[side] = {
            "r_at_1_mean": float(np.mean(r1)),
            "r_at_1_std": float(np.std(r1)),
        }
    summary["delta_r_at_1"] = (
        summary["jax"]["r_at_1_mean"] - summary["torch"]["r_at_1_mean"]
    )
    # gate: JAX within 0.5% of torch, or better
    summary["gate_within_0.5pct"] = bool(
        summary["jax"]["r_at_1_mean"]
        >= summary["torch"]["r_at_1_mean"] - 0.005
    )
    os.makedirs("evidence", exist_ok=True)
    with open("evidence/parity_ab_flagship.json", "w") as f:
        json.dump({"summary": summary, "results": results,
                   "config": vars(args)}, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
