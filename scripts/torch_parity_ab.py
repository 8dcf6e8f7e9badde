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

Statistical design (paired, matched everything that can be matched):
  * per seed, BOTH arms train on the identical data, identical batch order
    (numpy permutation seeded outside either framework) and — for the
    matched-init arm — the identical initial weights (torch init transferred
    into the flax tree). Residual noise is dropout-mask RNG only.
  * the JAX matched arm runs the reference protocol EXACTLY: erf-GELU
    (projection.act=gelu_exact; torch.nn.GELU default — flax defaults to the
    tanh approximation) and torch's per-EPOCH CosineAnnealingLR staircase
    (optax cosine decays per step; the custom schedule below reproduces the
    staircase bit-for-bit), so the measured delta isolates framework
    numerics, not recipe drift.
  * the gated metric follows the reference's best-checkpoint protocol
    (run1/full.py:177-180 tracks best-val and evaluates at best): R@1 at the
    best-val-accuracy epoch, not at the (noisier) final epoch.
  * the gate is on the 95% t-CI of the per-seed paired deltas: pass iff the
    CI is entirely inside +/-0.5%, or entirely above -0.5% (JAX not worse) —
    BASELINE.json "R@1 within 0.5%".

Usage:  python scripts/torch_parity_ab.py [--epochs 40] [--seeds 20]
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
    curve, r1_curve = [], []
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
        r1_curve.append(retrieval_r_at_1(za, zb))
    best = int(np.argmax(curve))
    return {
        "val_acc_curve": curve, "r_at_1_curve": r1_curve,
        "r_at_1": r1_curve[-1], "r_at_1_best": r1_curve[best],
        "best_epoch": best,
    }, init_flax


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
            init_params=None, match_recipe: bool = True):
    import jax
    import jax.numpy as jnp

    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models import TwoTowerCLIP
    from clip_dplm_tpu.train import create_train_state, make_train_step
    from clip_dplm_tpu.train.state import fused_adamw
    from clip_dplm_tpu.train.trainer import make_eval_step

    (ta, tb), (va_a, va_b) = train, val
    steps_per_epoch = (len(ta) - bs) // bs + 1
    overrides = [
        f"tower_a.input_dim={ta.shape[1]}", f"tower_b.input_dim={tb.shape[1]}",
        "tower_a.hidden_size=512", "tower_b.hidden_size=512",
        "projection.dim=512", "projection.kind=base",
        f"train.batch_size={bs}", f"train.seed={seed}",
        f"train.optim.learning_rate={lr}",
        "train.optim.schedule=cosine",
        f"train.optim.total_steps={steps_per_epoch * epochs}",
    ]
    if match_recipe:
        # erf-GELU == torch.nn.GELU() (flax defaults to the tanh approx)
        overrides.append("projection.act=gelu_exact")
    cfg = apply_overrides(Config(), overrides)
    tx = None
    if match_recipe:
        # torch steps CosineAnnealingLR once per EPOCH (run1/full.py:174-177);
        # reproduce the staircase exactly instead of optax's per-step decay
        def staircase(count):
            e = jnp.floor_divide(count, steps_per_epoch).astype(jnp.float32)
            return lr * 0.5 * (1.0 + jnp.cos(jnp.pi * e / epochs))

        tx = fused_adamw(staircase, weight_decay=0.01, clip_norm=1.0)
    model = TwoTowerCLIP(cfg=cfg, dtype=jnp.float32)
    ex = {"a": jnp.asarray(ta[:bs]), "b": jnp.asarray(tb[:bs])}
    state = create_train_state(model, cfg, ex, tx=tx)
    if init_params is not None:  # matched-init arm: start from torch's init
        p = jax.tree_util.tree_map(jnp.asarray, init_params)
        chex_struct = jax.tree_util.tree_structure(state.params)
        assert jax.tree_util.tree_structure(p) == chex_struct, (
            jax.tree_util.tree_structure(p), chex_struct)
        state = state.replace(params=p, opt_state=state.tx.init(p))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(cfg))
    embed = jax.jit(
        lambda params, batch: model.apply(
            {"params": params}, batch, deterministic=True)
    )

    full_val = {"a": jnp.asarray(va_a), "b": jnp.asarray(va_b)}
    curve, r1_curve = [], []
    for epoch in range(epochs):
        for xa, xb in batches(ta, tb, bs, seed * 1000 + epoch):
            state, _ = step(state, {"a": jnp.asarray(xa), "b": jnp.asarray(xb)})
        accs = [
            float(eval_step(state, {"a": jnp.asarray(xa), "b": jnp.asarray(xb)})["accuracy"])
            for xa, xb in batches(va_a, va_b, bs, 0, shuffle=False)
        ]
        curve.append(float(np.mean(accs)))
        out = embed(state.params, full_val)
        r1_curve.append(
            retrieval_r_at_1(np.asarray(out["emb_a"]), np.asarray(out["emb_b"]))
        )
    best = int(np.argmax(curve))
    return {
        "val_acc_curve": curve, "r_at_1_curve": r1_curve,
        "r_at_1": r1_curve[-1], "r_at_1_best": r1_curve[best],
        "best_epoch": best,
    }


def t_critical_95(df: int) -> float:
    """Two-sided 95% Student-t critical value."""
    try:
        from scipy import stats

        return float(stats.t.ppf(0.975, df))
    except Exception:
        table = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
                 7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228, 12: 2.179, 14: 2.145,
                 16: 2.120, 18: 2.101, 19: 2.093, 21: 2.080, 23: 2.069,
                 25: 2.060, 29: 2.045, 39: 2.023, 59: 2.001}
        ks = sorted(table)
        for k in ks:
            if df <= k:
                return table[k]
        return 1.96


def paired_delta_stats(deltas) -> dict:
    """Mean, std, and 95% t-CI of per-seed paired deltas, plus both gate
    readings: two-sided (CI inside +/-0.5%) and the BASELINE one-sided
    'within 0.5% or better' (CI entirely above -0.5%)."""
    d = np.asarray(deltas, dtype=np.float64)
    n = len(d)
    mean = float(d.mean())
    std = float(d.std(ddof=1)) if n > 1 else 0.0
    sem = std / math.sqrt(n) if n > 1 else 0.0
    hw = t_critical_95(n - 1) * sem if n > 1 else float("inf")
    lo, hi = mean - hw, mean + hw
    return {
        "per_seed": [float(x) for x in d],
        "n": n, "mean": mean, "std": std, "sem": sem,
        "ci95": [lo, hi], "ci95_halfwidth": hw,
        "gate_ci_inside_pm_0.5pct": bool(lo >= -0.005 and hi <= 0.005),
        "gate_ci_not_worse_than_0.5pct": bool(lo >= -0.005),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--unmatched-seeds", type=int, default=5,
                    help="seeds that ALSO run the framework-default-init arm "
                         "(context only; the gate is on the matched arm)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    results = {"torch": [], "jax": [], "jax_matched_init": []}
    for seed in range(args.seeds):
        train, val = make_data(seed)
        t0 = time.time()
        rt, torch_init = run_torch(train, val, args.epochs, seed)
        t1 = time.time()
        if seed < args.unmatched_seeds:
            results["jax"].append(
                run_jax(train, val, args.epochs, seed, match_recipe=False))
        rm = run_jax(train, val, args.epochs, seed, init_params=torch_init)
        t2 = time.time()
        results["torch"].append(rt)
        results["jax_matched_init"].append(rm)
        print(
            f"seed {seed}: torch R@1(best)={rt['r_at_1_best']:.4f} ({t1-t0:.0f}s)  "
            f"jax(matched) R@1(best)={rm['r_at_1_best']:.4f} ({t2-t1:.0f}s)  "
            f"paired delta={rm['r_at_1_best'] - rt['r_at_1_best']:+.4f}",
            flush=True,
        )

    summary = {}
    for side in results:
        if not results[side]:
            continue
        for metric in ("r_at_1_best", "r_at_1"):
            r1 = [r[metric] for r in results[side]]
            summary.setdefault(side, {})[f"{metric}_mean"] = float(np.mean(r1))
            summary[side][f"{metric}_std"] = float(np.std(r1))
        acc = [r["val_acc_curve"][-1] for r in results[side]]
        summary[side]["val_acc_mean"] = float(np.mean(acc))
        summary[side]["val_acc_std"] = float(np.std(acc))

    # the gated statistic: per-seed paired deltas, matched arm, best-epoch R@1
    deltas_best = [
        m["r_at_1_best"] - t["r_at_1_best"]
        for m, t in zip(results["jax_matched_init"], results["torch"])
    ]
    deltas_final = [
        m["r_at_1"] - t["r_at_1"]
        for m, t in zip(results["jax_matched_init"], results["torch"])
    ]
    summary["paired_matched_init_best"] = paired_delta_stats(deltas_best)
    summary["paired_matched_init_final"] = paired_delta_stats(deltas_final)
    g = summary["paired_matched_init_best"]
    summary["delta_r_at_1_matched_init"] = g["mean"]
    summary["gate_within_0.5pct"] = bool(
        g["gate_ci_inside_pm_0.5pct"] or g["gate_ci_not_worse_than_0.5pct"]
    )
    os.makedirs("evidence", exist_ok=True)
    with open("evidence/parity_ab.json", "w") as f:
        json.dump({"summary": summary, "results": results,
                   "config": vars(args)}, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
