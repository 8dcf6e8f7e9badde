"""OT-CFM convergence A/B: the last family without a matched-init gate
(VERDICT r4 item 4).

A torch TWIN of the repo's `VectorFieldNet` (models/flows.py, itself the
capability match for tong/models/flows/ot_flow.py:9-40) plus the exact-OT /
Schrodinger-bridge matchers (ot_flow.py:58-113 semantics: torchcfm
ExactOptimalTransportConditionalFlowMatcher / SchrodingerBridge with
reg = 2 sigma^2), trained against the JAX arm (the framework's `OTFlow`)
with torch->flax INIT TRANSFER and paired seeds — same data, same batch
order, same initial point. Per-seed randomness that cannot be paired across
frameworks (t ~ U(0,1), eps ~ N(0,1), the SB plan sample) is identically
distributed on both sides; the paired delta isolates framework numerics the
same way the two CLIP A/Bs do (scripts/torch_parity_ab*.py).

Task: source N(0, I_D) -> target = 8-mode Gaussian mixture on a scaled
hypersphere shell (a multi-modal transport the independent coupling smears
but minibatch OT resolves). Two gated statistics per seed, both computed on
SHARED numpy eval fixtures so the comparison is exact:

  * final flow-matching eval loss — (t, eps, Hungarian pairing) precomputed
    on the host once per seed and fed to BOTH nets, so the eval loss is a
    deterministic function of the trained weights alone;
  * generated-distribution sliced-W2 — Euler integration of dx/dt =
    v(x, u=0, t) from shared source samples, sliced-W2 against shared
    target samples over shared projection directions.

Gate (stated, matching the CLIP A/Bs' discipline): 95% t-CI of the paired
relative delta inside +/-5% for the eval loss and the sliced-W2 (relative,
because neither metric has R@1's natural 0-1 scale; 5% is ~1/4 of the
across-seed spread measured at calibration). A one-sided "not worse than
+5%" reading is also recorded.

Usage: python scripts/torch_parity_ab_cfm.py [--seeds 12] [--epochs 30]
Writes evidence/parity_ab_cfm.json (tracked).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# small geometry, CPU-trainable (reference scale: latent 512, hidden 1024)
D = 16                 # latent dim
HIDDEN, N_LAYERS = 128, 2
TIME_DIM = 32
BS, LR, WD = 256, 1e-3, 0.01
SIGMA = 0.1
N_TRAIN, N_EVAL = 4096, 2048
EULER_STEPS = 100
N_PROJ = 256           # sliced-W2 projection directions


def make_data(seed: int):
    """source N(0, I); target: 8-mode isotropic GMM on a radius-3 shell in a
    random 2-plane (multi-modal, so minibatch-OT pairing matters)."""
    rng = np.random.default_rng(seed)
    basis, _ = np.linalg.qr(rng.normal(size=(D, 2)))
    angles = 2 * np.pi * np.arange(8) / 8
    centers = 3.0 * (np.cos(angles)[:, None] * basis[:, 0]
                     + np.sin(angles)[:, None] * basis[:, 1])  # (8, D)

    def draw(n, rr):
        comp = rr.integers(0, 8, n)
        return (centers[comp] + 0.3 * rr.normal(size=(n, D))).astype(
            np.float32)

    x0_train = rng.normal(size=(N_TRAIN, D)).astype(np.float32)
    x1_train = draw(N_TRAIN, rng)
    x0_eval = rng.normal(size=(N_EVAL, D)).astype(np.float32)
    x1_eval = draw(N_EVAL, rng)
    return x0_train, x1_train, x0_eval, x1_eval


def train_batches(n: int, seed: int):
    """Shared batch order for both arms (paired seeds discipline)."""
    rng = np.random.default_rng(seed)
    idx0, idx1 = rng.permutation(n), rng.permutation(n)
    for s in range(0, n - BS + 1, BS):
        yield idx0[s:s + BS], idx1[s:s + BS]


def hungarian(x0: np.ndarray, x1: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    d2 = ((x0[:, None, :] - x1[None, :, :]) ** 2).sum(-1)
    _, col = linear_sum_assignment(d2)
    return col


def numpy_sinkhorn_plan(x0, x1, epsilon, iters=100):
    """Log-domain Sinkhorn (mirrors ops/sinkhorn.py) for the torch twin's SB
    matcher — POT is absent from this image, so the twin carries its own."""
    d2 = ((x0[:, None, :] - x1[None, :, :]) ** 2).sum(-1).astype(np.float64)
    n, m = d2.shape
    loga, logb = np.log(np.full(n, 1.0 / n)), np.log(np.full(m, 1.0 / m))
    f, g = np.zeros(n), np.zeros(m)
    for _ in range(iters):
        mat = (g[None, :] - d2) / epsilon
        f = epsilon * loga - epsilon * (
            mat.max(1) + np.log(np.exp(mat - mat.max(1, keepdims=True)).sum(1)))
        mat = (f[:, None] - d2) / epsilon
        g = epsilon * logb - epsilon * (
            mat.max(0) + np.log(np.exp(mat - mat.max(0, keepdims=True)).sum(0)))
    return np.exp((f[:, None] + g[None, :] - d2) / epsilon)


def make_eval_fixture(x0_eval, x1_eval, seed: int, flow_type: str):
    """Shared (xt, ut, t) eval tensors: deterministic given the seed, so the
    eval loss depends on the trained weights only. Uses the exact_ot formula
    for both flow types (a fixed yardstick; the TRAINING matcher is what
    differs between flow types)."""
    rng = np.random.default_rng(10_000 + seed)
    xts, uts, ts = [], [], []
    for s in range(0, N_EVAL - BS + 1, BS):
        x0 = x0_eval[s:s + BS]
        x1 = x1_eval[s:s + BS][hungarian(x0, x1_eval[s:s + BS])]
        t = rng.uniform(size=(BS,)).astype(np.float32)
        eps = rng.normal(size=x0.shape).astype(np.float32)
        tt = t[:, None]
        xts.append(((1 - tt) * x0 + tt * x1 + SIGMA * eps).astype(np.float32))
        uts.append((x1 - x0).astype(np.float32))
        ts.append(t)
    return np.stack(xts), np.stack(uts), np.stack(ts)


def sliced_w2_np(x: np.ndarray, y: np.ndarray, proj: np.ndarray) -> float:
    px, py = x @ proj, y @ proj  # (n, P)
    px.sort(axis=0)
    py.sort(axis=0)
    return float(np.sqrt(np.mean((px - py) ** 2)))


# ---------------------------------------------------------------------------
# torch twin (VectorFieldNet op-for-op + host matchers)
# ---------------------------------------------------------------------------


def _twin_module():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class TwinVF(nn.Module):
        """models/flows.py::VectorFieldNet mirrored op-for-op: time encoder
        Linear(1,time_dim)-LN-GELU(tanh)-Linear(latent); body fc-LN-GELU-Drop
        x n_layers over [xt, ut, t_emb]; Tanh(out)."""

        def __init__(self):
            super().__init__()
            self.time_fc0 = nn.Linear(1, TIME_DIM)
            self.time_ln = nn.LayerNorm(TIME_DIM, eps=1e-6)
            self.time_fc1 = nn.Linear(TIME_DIM, D)
            dims = [3 * D] + [HIDDEN] * N_LAYERS
            self.fcs = nn.ModuleList(
                [nn.Linear(dims[i], HIDDEN) for i in range(N_LAYERS)])
            self.lns = nn.ModuleList(
                [nn.LayerNorm(HIDDEN, eps=1e-6) for _ in range(N_LAYERS)])
            self.out = nn.Linear(HIDDEN, D)
            self.drop = nn.Dropout(0.1)

        def forward(self, xt, ut, t):
            t_emb = self.time_fc1(F.gelu(
                self.time_ln(self.time_fc0(t[:, None])), approximate="tanh"))
            h = torch.cat([xt, ut, t_emb], dim=-1)
            for fc, ln in zip(self.fcs, self.lns):
                h = self.drop(F.gelu(ln(fc(h)), approximate="tanh"))
            return torch.tanh(self.out(h))

    return TwinVF


def run_torch(data, epochs: int, seed: int, flow_type: str):
    import torch

    x0_train, x1_train, x0_eval, x1_eval = data
    torch.manual_seed(seed)
    model = _twin_module()()
    init_sd = {k: v.detach().numpy().copy()
               for k, v in model.state_dict().items()}
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    rng = np.random.default_rng(seed + 77)
    for epoch in range(epochs):
        model.train()
        for i0, i1 in train_batches(N_TRAIN, seed * 1000 + epoch):
            x0, x1 = x0_train[i0], x1_train[i1]
            if flow_type == "exact_ot":
                x1 = x1[hungarian(x0, x1)]
            else:  # sb: sample the entropic plan row-wise
                plan = numpy_sinkhorn_plan(x0, x1, 2.0 * SIGMA * SIGMA)
                p = plan / plan.sum(1, keepdims=True)
                x1 = x1[[rng.choice(BS, p=row) for row in p]]
            t = rng.uniform(size=(BS,)).astype(np.float32)
            eps = rng.normal(size=x0.shape).astype(np.float32)
            tt = t[:, None]
            mu = (1 - tt) * x0 + tt * x1
            if flow_type == "sb":
                st = SIGMA * np.sqrt(np.clip(tt * (1 - tt), 1e-6, None))
                xt = mu + st * eps
                ut = ((1 - 2 * tt) / (2 * np.clip(tt * (1 - tt), 1e-6, None))
                      * (xt - mu) + (x1 - x0))
            else:
                xt = mu + SIGMA * eps
                ut = x1 - x0
            v = model(torch.from_numpy(xt.astype(np.float32)),
                      torch.from_numpy(ut.astype(np.float32)),
                      torch.from_numpy(t))
            loss = ((v - torch.from_numpy(ut.astype(np.float32))) ** 2).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
    model.eval()
    return model, init_sd


def torch_eval(model, fixture, x0_eval, x1_eval, proj):
    import torch

    xts, uts, ts = fixture
    losses = []
    with torch.no_grad():
        for xt, ut, t in zip(xts, uts, ts):
            v = model(torch.from_numpy(xt), torch.from_numpy(ut),
                      torch.from_numpy(t))
            losses.append(float(((v - torch.from_numpy(ut)) ** 2).mean()))
        # generate: Euler integrate v(x, u=0, t)
        x = torch.from_numpy(x0_eval.copy())
        zeros = torch.zeros_like(x)
        dt = 1.0 / EULER_STEPS
        for k in range(EULER_STEPS):
            tv = torch.full((len(x),), (k + 0.5) * dt)
            x = x + dt * model(x, zeros, tv)
    return float(np.mean(losses)), sliced_w2_np(x.numpy(), x1_eval, proj)


# ---------------------------------------------------------------------------
# jax arm (the framework under test: models/flows.py OTFlow)
# ---------------------------------------------------------------------------


def _twin_sd_to_flax(sd):
    import jax.numpy as jnp

    net = {
        "time_fc0": {"kernel": sd["time_fc0.weight"].T,
                     "bias": sd["time_fc0.bias"]},
        "time_ln": {"scale": sd["time_ln.weight"], "bias": sd["time_ln.bias"]},
        "time_fc1": {"kernel": sd["time_fc1.weight"].T,
                     "bias": sd["time_fc1.bias"]},
        "out": {"kernel": sd["out.weight"].T, "bias": sd["out.bias"]},
    }
    for i in range(N_LAYERS):
        net[f"fc{i}"] = {"kernel": sd[f"fcs.{i}.weight"].T,
                         "bias": sd[f"fcs.{i}.bias"]}
        net[f"ln{i}"] = {"scale": sd[f"lns.{i}.weight"],
                         "bias": sd[f"lns.{i}.bias"]}
    return {"net": jaxify(net)}


def jaxify(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), tree)


def run_jax(data, epochs: int, seed: int, flow_type: str, init_sd):
    import jax
    import jax.numpy as jnp
    import optax

    from clip_dplm_tpu.config import FlowConfig
    from clip_dplm_tpu.models.flows import OTFlow

    x0_train, x1_train, x0_eval, x1_eval = data
    cfg = FlowConfig(
        flow_type=flow_type, sigma=SIGMA, latent_dim=D, hidden_dim=HIDDEN,
        n_layers=N_LAYERS, dropout=0.1, use_time_embedding=True,
        time_embed_dim=TIME_DIM, use_path_length_reg=False,
    )
    model = OTFlow(cfg=cfg)
    params = _twin_sd_to_flax(init_sd)
    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, key, x0, x1):
        def loss_fn(p):
            k_flow, k_drop = jax.random.split(key)
            out = model.apply({"params": p}, k_flow, x0, x1,
                              deterministic=False,
                              rngs={"dropout": k_drop})
            return jnp.mean((out["v"] - out["ut"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed)
    for epoch in range(epochs):
        for i0, i1 in train_batches(N_TRAIN, seed * 1000 + epoch):
            key, sub = jax.random.split(key)
            params, opt_state, _ = train_step(
                params, opt_state, sub,
                jnp.asarray(x0_train[i0]), jnp.asarray(x1_train[i1]))
    return model, params


def jax_eval(model, params, fixture, x0_eval, x1_eval, proj):
    import jax
    import jax.numpy as jnp

    xts, uts, ts = fixture
    net_apply = jax.jit(lambda p, xt, ut, t: model.apply(
        {"params": p}, xt, ut, t, deterministic=True,
        method=lambda m, xt, ut, t, deterministic: m.net(
            xt, ut, t, deterministic=deterministic)))
    losses = []
    for xt, ut, t in zip(xts, uts, ts):
        v = net_apply(params, jnp.asarray(xt), jnp.asarray(ut),
                      jnp.asarray(t))
        losses.append(float(jnp.mean((v - ut) ** 2)))

    @jax.jit
    def generate(p, x):
        dt = 1.0 / EULER_STEPS

        def body(x, k):
            tv = jnp.full((x.shape[0],), (k + 0.5) * dt)
            v = model.apply({"params": p}, x, tv, deterministic=True,
                            method="velocity")
            return x + dt * v, ()

        x, _ = jax.lax.scan(body, x, jnp.arange(EULER_STEPS))
        return x

    gen = np.asarray(generate(params, jnp.asarray(x0_eval)))
    return float(np.mean(losses)), sliced_w2_np(gen, x1_eval, proj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seeds", type=int, default=12)
    ap.add_argument("--flow-types", default="exact_ot,sb")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_parity_ab import paired_delta_stats

    out = {"config": vars(args), "arms": {}}
    for flow_type in args.flow_types.split(","):
        rows, d_loss, d_sw2 = [], [], []
        for seed in range(args.seeds):
            data = make_data(seed)
            fixture = make_eval_fixture(data[2], data[3], seed, flow_type)
            proj = np.random.default_rng(20_000 + seed).normal(
                size=(D, N_PROJ)).astype(np.float32)
            proj /= np.linalg.norm(proj, axis=0, keepdims=True)
            t0 = time.time()
            tm, init_sd = run_torch(data, args.epochs, seed, flow_type)
            t_loss, t_sw2 = torch_eval(tm, fixture, data[2], data[3], proj)
            t1 = time.time()
            jm, jp = run_jax(data, args.epochs, seed, flow_type, init_sd)
            j_loss, j_sw2 = jax_eval(jm, jp, fixture, data[2], data[3], proj)
            t2 = time.time()
            rows.append({"seed": seed,
                         "torch": {"fm_loss": t_loss, "sliced_w2": t_sw2},
                         "jax": {"fm_loss": j_loss, "sliced_w2": j_sw2}})
            d_loss.append((j_loss - t_loss) / t_loss)
            d_sw2.append((j_sw2 - t_sw2) / t_sw2)
            print(f"[{flow_type}] seed {seed}: torch loss={t_loss:.5f} "
                  f"sW2={t_sw2:.4f} ({t1 - t0:.0f}s)  jax loss={j_loss:.5f} "
                  f"sW2={j_sw2:.4f} ({t2 - t1:.0f}s)  "
                  f"dloss={d_loss[-1]:+.3%} dsW2={d_sw2[-1]:+.3%}",
                  flush=True)
        stats_loss = paired_delta_stats(d_loss)
        stats_sw2 = paired_delta_stats(d_sw2)
        # the CLIP stats helper reads its gates at the 0.5% R@1 scale; restate
        # at this A/B's stated +/-5% relative gate
        for st in (stats_loss, stats_sw2):
            lo, hi = st["ci95"]
            st["gate_ci_inside_pm_5pct"] = bool(lo >= -0.05 and hi <= 0.05)
            st["gate_ci_not_worse_than_5pct"] = bool(hi <= 0.05)
            del st["gate_ci_inside_pm_0.5pct"]
            del st["gate_ci_not_worse_than_0.5pct"]
        out["arms"][flow_type] = {
            "per_seed": rows,
            "paired_rel_delta_fm_loss": stats_loss,
            "paired_rel_delta_sliced_w2": stats_sw2,
        }
        print(f"[{flow_type}] fm_loss rel delta CI95="
              f"{stats_loss['ci95']}  sliced_w2 rel delta CI95="
              f"{stats_sw2['ci95']}", flush=True)

    os.makedirs("evidence", exist_ok=True)
    with open("evidence/parity_ab_cfm.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {m: v[m]["ci95"] for m in (
        "paired_rel_delta_fm_loss", "paired_rel_delta_sliced_w2")}
        for k, v in out["arms"].items()}, indent=1))


if __name__ == "__main__":
    main()
