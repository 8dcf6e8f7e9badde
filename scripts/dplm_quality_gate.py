"""DPLM quality gate: does a trained DPLM generate sequences that are RIGHT?

VERDICT r4 item 3 — the DPLM subsystem (BASELINE.json config 5, new-build
territory: the reference names DPLM but contains no sampler) had throughput
certificates and op-level tests but no convergence/quality evidence. This
script defines what "works" means and measures it:

  (a) masked-CE trajectory reproducibility — train the same small DPLM on a
      synthetic motif grammar from 3 seeds; the plateau losses must agree
      (relative std) and sit far below the initial loss.
  (b) grammar recovery — the language is (codebook of 16 four-mers)^8 over
      the 20 standard residues; a uniform-random 32-mer parses with
      probability (16/20^4)^8 ~= 1e-32, so ANY measurable full-parse rate is
      model-learned structure. Gates: full-parse >= 0.5, chunk-validity
      >= 0.8 over 512 samples.
  (c) guided-vs-unguided CLIP-score shift at the d=640 serving geometry
      (evidence/guided_flatten_r4.json config): best-of-K rerank guidance
      must shift the per-slot CLIP score with a paired 95% CI strictly
      above zero.

Writes evidence/dplm_quality_r5.json; tests/test_dplm_quality.py asserts the
gates on the evidence file and smoke-runs a tiny CPU variant.

Env: QG_PARTS=train,guided (default both), QG_STEPS/QG_B/QG_SEEDS to shrink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _enable_compile_cache

_enable_compile_cache()

EVIDENCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "evidence")

# grammar: 16 four-mers over the 20 standard residues (ids 4..23)
N_CODES, CHUNK, N_CHUNKS = 16, 4, 8
SEQ_LEN = CHUNK * N_CHUNKS  # 32 residues


def make_codebook(seed: int = 0) -> np.ndarray:
    """(N_CODES, CHUNK) residue-id codebook, distinct rows."""
    rng = np.random.default_rng(seed)
    seen, rows = set(), []
    while len(rows) < N_CODES:
        c = tuple(rng.integers(4, 24, CHUNK).tolist())
        if c not in seen:
            seen.add(c)
            rows.append(c)
    return np.asarray(rows, np.int32)


def grammar_batch(rng: np.random.Generator, codebook: np.ndarray, B: int):
    """(B, SEQ_LEN+2) [cls] chunks [eos] token batch from the grammar."""
    picks = rng.integers(0, N_CODES, (B, N_CHUNKS))
    resid = codebook[picks].reshape(B, SEQ_LEN)
    from clip_dplm_tpu.models.dplm import CLS_IDX, EOS_IDX

    out = np.concatenate(
        [np.full((B, 1), CLS_IDX, np.int32), resid,
         np.full((B, 1), EOS_IDX, np.int32)], axis=1)
    return out


def parse_stats(tokens: np.ndarray, codebook: np.ndarray) -> dict:
    """Fraction of sequences that fully parse / of chunks in the codebook."""
    resid = tokens[:, 1:1 + SEQ_LEN]  # strip cls; eos sits at 1+SEQ_LEN
    chunks = resid.reshape(len(resid), N_CHUNKS, CHUNK)
    codes = {tuple(r.tolist()) for r in codebook}
    chunk_ok = np.array(
        [[tuple(c.tolist()) in codes for c in row] for row in chunks])
    return {
        "full_parse_frac": float(chunk_ok.all(axis=1).mean()),
        "chunk_valid_frac": float(chunk_ok.mean()),
    }


def run_training_gates(steps: int, B: int, seeds: int, d_model: int,
                       num_layers: int) -> dict:
    import optax

    from clip_dplm_tpu.config import DPLMConfig
    from clip_dplm_tpu.models.dplm import DPLM, diffusion_loss, sample

    codebook = make_codebook()
    cfg = DPLMConfig(d_model=d_model, num_layers=num_layers,
                     num_heads=max(2, d_model // 32), max_len=SEQ_LEN + 2)
    model = DPLM(cfg=cfg)
    record_every = max(1, steps // 30)
    tx = optax.adamw(3e-4, weight_decay=0.01)

    @jax.jit
    def chunk_steps(params, opt_state, key, tokens):
        """record_every train steps chained in one jit (honest timing +
        one host fetch per record, CLAUDE.md). Defined ONCE outside the
        seed loop — per-seed redefinition retraced the identical program
        every seed (r5 review finding). Fresh grammar batches are fed per
        chunk; inside the chunk the same batch is reused with a fresh
        corruption draw per step (the corruption IS the data augmentation
        in absorbing-state diffusion)."""

        def body(carry, _):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)

            def loss_fn(p):
                loss, _ = diffusion_loss(model, p, sub, tokens)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=record_every)
        return params, opt_state, key, losses.mean()

    curves, samples_stats = [], []
    for seed in range(seeds):
        rng = np.random.default_rng(seed)
        tokens0 = grammar_batch(rng, codebook, B)
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.asarray(tokens0))["params"]
        opt_state = tx.init(params)
        key = jax.random.PRNGKey(1000 + seed)
        # true step-0 loss, measured directly (the first recorded point is
        # a mean over the first record chunk, which understates the start
        # at large record_every and made the plateau/init gate unstable)
        init_loss = float(np.mean([
            diffusion_loss(model, params, jax.random.PRNGKey(50 + j),
                           jnp.asarray(tokens0))[0]
            for j in range(4)]))

        curve = [init_loss]
        t0 = time.time()
        for s in range(0, steps, record_every):
            batch = jnp.asarray(grammar_batch(rng, codebook, B))
            params, opt_state, key, loss = chunk_steps(
                params, opt_state, key, batch)
            curve.append(float(loss))
        train_s = time.time() - t0

        # 2 denoising steps per generated token: at num_steps == SEQ_LEN the
        # cosine schedule's late steps commit many positions from their
        # INDEPENDENT marginals at once and chunks come out inconsistent
        # (measured on-chip: full-parse 0.02 at 32 steps vs 0.76-0.79 at
        # 64, with teacher-forcing accuracy 1.0 — a sampler-budget
        # property, not a model-quality one; temperature 0.5-1.0 is a
        # no-op). A hard-constraint grammar needs a denser refinement
        # budget than natural sequence tasks, where the serving default
        # (100 steps at length 126) suffices.
        toks, _ = sample(model, params, jax.random.PRNGKey(7_000 + seed),
                         512, SEQ_LEN, num_steps=2 * SEQ_LEN)
        st = parse_stats(np.asarray(toks), codebook)
        st["train_seconds"] = round(train_s, 1)
        curves.append(curve)
        samples_stats.append(st)
        print(f"seed {seed}: loss {curve[0]:.3f} -> {curve[-1]:.3f} "
              f"({train_s:.0f}s)  full_parse={st['full_parse_frac']:.3f} "
              f"chunk_valid={st['chunk_valid_frac']:.3f}", flush=True)

    plateaus = [float(np.mean(c[-5:])) for c in curves]
    inits = [c[0] for c in curves]
    # random-residue baseline, measured (analytic: (16/20^4)^8 ~= 1e-32)
    rng = np.random.default_rng(99)
    rand_tokens = grammar_batch(rng, codebook, 512)
    rand_tokens[:, 1:1 + SEQ_LEN] = rng.integers(4, 24, (512, SEQ_LEN))
    baseline = parse_stats(rand_tokens, codebook)
    return {
        "geometry": {"d_model": d_model, "num_layers": num_layers,
                     "batch": B, "steps": steps, "seeds": seeds,
                     "seq_len": SEQ_LEN, "codebook": N_CODES,
                     "platform": jax.devices()[0].platform},
        "loss_curves": curves,
        "plateau_losses": plateaus,
        "initial_losses": inits,
        "plateau_rel_std": float(np.std(plateaus) / np.mean(plateaus)),
        "plateau_over_init": float(np.mean(plateaus) / np.mean(inits)),
        "per_seed_samples": samples_stats,
        "random_baseline": baseline,
        "analytic_random_full_parse": (N_CODES / 20.0 ** CHUNK) ** N_CHUNKS,
        "gates": {
            "reproducible_rel_std_lt_0.15":
                bool(np.std(plateaus) / np.mean(plateaus) < 0.15),
            "plateau_below_quarter_of_init":
                bool(np.mean(plateaus) < 0.25 * np.mean(inits)),
            "full_parse_ge_0.5": bool(min(
                s["full_parse_frac"] for s in samples_stats) >= 0.5),
            "chunk_valid_ge_0.8": bool(min(
                s["chunk_valid_frac"] for s in samples_stats) >= 0.8),
        },
    }


def run_guided_gate(B: int, K: int, length: int, steps: int,
                    n_batches: int) -> dict:
    """Paired guided-vs-unguided CLIP-score shift at the d=640 serving
    geometry (the guided_flatten_r4 config). Per output slot the paired
    delta is score(best-of-K) - score(single chain) from independent keys;
    gate: 95% t-CI of the mean delta strictly above 0."""
    from clip_dplm_tpu.config import Config, apply_overrides
    from clip_dplm_tpu.models.dplm import DPLM, clip_guided_sample, sample
    from clip_dplm_tpu.models.esm import ESMTower, esm_config_from_name
    from clip_dplm_tpu.models.guided_generation import make_clip_scorer
    from clip_dplm_tpu.models.layers import OptimizedProjectionHead

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_parity_ab import paired_delta_stats

    cfg = apply_overrides(Config(), [
        "dplm.d_model=640", "dplm.num_layers=12", "dplm.num_heads=10",
        "dplm.scan_layers=true", "projection.dim=128",
    ])
    model = DPLM(cfg=cfg.dplm)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8), jnp.int32))["params"]

    # scorer: ESM-8M tower + projection (the protein side of ESMProteinCLIP),
    # same wiring as scripts/tpu_guided_probe.py
    esm_cfg = esm_config_from_name("esm2_t6_8M")
    tower = ESMTower(cfg=esm_cfg)
    proj = OptimizedProjectionHead(cfg=cfg.projection)
    toks0 = jnp.zeros((2, 8), jnp.int32)
    tp = tower.init(jax.random.PRNGKey(1), toks0)["params"]
    emb0 = tower.apply({"params": tp}, toks0, pooling="mean_residues")
    pp = proj.init(jax.random.PRNGKey(2), emb0)["params"]

    def encode(tokens, mask):
        e = tower.apply({"params": tp}, tokens, mask,
                        pooling="mean_residues")
        return proj.apply({"params": pp}, e)

    # conditioning: the CLIP embedding of one reference grammar sequence
    codebook = make_codebook()
    ref = grammar_batch(np.random.default_rng(3), codebook, 1)
    cond = encode(jnp.asarray(ref), jnp.asarray(ref != 1))[0]

    # ALL param trees as runtime args, not jit-closure constants (tunnel
    # upload cost): the trunk AND the scorer tower/projection (the r5
    # review caught tp/pp riding the closure while the comment claimed
    # otherwise)
    @jax.jit
    def one_round(key, p, tp_, pp_):
        def enc(tokens, mask):
            e = tower.apply({"params": tp_}, tokens, mask,
                            pooling="mean_residues")
            return proj.apply({"params": pp_}, e)

        sc = make_clip_scorer(enc, cond)
        k_g, k_u = jax.random.split(key)
        guided_toks, guided_scores = clip_guided_sample(
            model, p, k_g, sc, B, length,
            num_candidates=K, num_steps=steps)
        unguided_toks, _ = sample(model, p, k_u, B, length,
                                  num_steps=steps)
        return guided_scores, sc(unguided_toks)

    deltas, g_means, u_means = [], [], []
    t0 = time.time()
    for i in range(n_batches):
        g, u = one_round(jax.random.PRNGKey(500 + i), params, tp, pp)
        g, u = np.asarray(g), np.asarray(u)
        deltas.extend((g - u).tolist())
        g_means.append(float(g.mean()))
        u_means.append(float(u.mean()))
        print(f"guided batch {i}: guided={g.mean():.4f} "
              f"unguided={u.mean():.4f}", flush=True)
    stats = paired_delta_stats(deltas)
    for k in ("gate_ci_inside_pm_0.5pct", "gate_ci_not_worse_than_0.5pct"):
        stats.pop(k, None)
    stats.pop("per_seed", None)  # B*n_batches entries; keep the summary
    return {
        "geometry": {"d": 640, "layers": 12, "heads": 10, "batch": B,
                     "candidates": K, "length": length, "steps": steps,
                     "n_batches": n_batches,
                     "platform": jax.devices()[0].platform},
        "guided_mean": float(np.mean(g_means)),
        "unguided_mean": float(np.mean(u_means)),
        "paired_delta": stats,
        "seconds": round(time.time() - t0, 1),
        "gates": {"shift_ci_above_zero": bool(stats["ci95"][0] > 0)},
    }


def main():
    parts = os.environ.get("QG_PARTS", "train,guided").split(",")
    out = {}
    if "train" in parts:
        out["training"] = run_training_gates(
            steps=int(os.environ.get("QG_STEPS", 12000)),
            B=int(os.environ.get("QG_B", 256)),
            seeds=int(os.environ.get("QG_SEEDS", 3)),
            d_model=int(os.environ.get("QG_D", 128)),
            num_layers=int(os.environ.get("QG_L", 2)),
        )
    if "guided" in parts:
        out["guided_shift"] = run_guided_gate(
            B=int(os.environ.get("QG_GB", 64)),
            K=int(os.environ.get("QG_K", 4)),
            length=int(os.environ.get("QG_LEN", 126)),
            steps=int(os.environ.get("QG_GSTEPS", 50)),
            n_batches=int(os.environ.get("QG_NB", 4)),
        )
    os.makedirs(EVIDENCE, exist_ok=True)
    path = os.path.join(EVIDENCE, "dplm_quality_r5.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    gates = {k: v["gates"] for k, v in prev.items() if "gates" in v}
    print(json.dumps(gates, indent=1))


if __name__ == "__main__":
    main()
