"""DPLM discrete diffusion: corruption, loss, lax.scan sampler, CLIP-guided
best-of-K reranking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import DPLMConfig
from clip_dplm_tpu.data import protein
from clip_dplm_tpu.models.dplm import (
    CLS_IDX,
    EOS_IDX,
    MASK_IDX,
    RESIDUE_HI,
    RESIDUE_LO,
    DPLM,
    clip_guided_sample,
    corrupt,
    diffusion_loss,
    sample,
)


def tiny_dplm():
    cfg = DPLMConfig(vocab_size=33, d_model=32, num_layers=1, num_heads=2,
                     max_len=32, num_diffusion_steps=6, num_candidates=3)
    return DPLM(cfg=cfg, dtype=jnp.float32)


def _tokens(rng, B=4, L=10):
    seqs = [protein.random_protein(rng, L) for _ in range(B)]
    toks, mask = protein.tokenize_batch(seqs, pad_multiple=4)
    return jnp.asarray(toks), jnp.asarray(mask)


def test_corrupt_respects_special_tokens(rng):
    toks, valid = _tokens(rng)
    x_t, corrupted, t = corrupt(
        jax.random.PRNGKey(0), toks, valid, t=jnp.ones(toks.shape[0])
    )
    x = np.asarray(x_t)
    c = np.asarray(corrupted)
    # t=1: every corruptible position masked
    assert (x[c] == MASK_IDX).all()
    # specials untouched
    assert (x[np.asarray(toks) == CLS_IDX] == CLS_IDX).all()
    assert (x[np.asarray(toks) == EOS_IDX] == EOS_IDX).all()
    assert not c[~np.asarray(valid)].any()


@pytest.mark.slow
def test_diffusion_loss_finite_and_trains(rng):
    import optax

    model = tiny_dplm()
    toks, valid = _tokens(rng, B=8, L=12)
    params = model.init(jax.random.PRNGKey(0), toks, valid)["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        (l, aux), g = jax.value_and_grad(
            lambda p: diffusion_loss(model, p, key, toks, valid), has_aux=True
        )(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, l

    key = jax.random.PRNGKey(1)
    first = None
    for _ in range(30):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < first, (first, float(loss))


def test_sampler_produces_valid_proteins(rng):
    model = tiny_dplm()
    toks, valid = _tokens(rng)
    params = model.init(jax.random.PRNGKey(0), toks, valid)["params"]
    out, conf = sample(model, params, jax.random.PRNGKey(2), batch_size=3,
                       length=8)
    out = np.asarray(out)
    assert out.shape == (3, 10)
    assert (out[:, 0] == CLS_IDX).all() and (out[:, -1] == EOS_IDX).all()
    inner = out[:, 1:-1]
    assert ((inner >= RESIDUE_LO) & (inner <= RESIDUE_HI)).all(), inner
    assert (inner != MASK_IDX).all()  # fully unmasked at the end


def test_sampler_under_dp_mesh_matches_single_device(rng):
    """Serving at scale: the sampler jitted with batch-sharded outputs over
    the (data, model) mesh — XLA back-propagates the sharding through the
    whole lax.scan denoising chain (every sampler op is row-local, so the
    sharded run is bitwise identical to the single-device one)."""
    from clip_dplm_tpu.parallel.mesh import batch_sharding, create_mesh

    model = tiny_dplm()
    toks, valid = _tokens(rng)
    params = model.init(jax.random.PRNGKey(0), toks, valid)["params"]
    B = 2 * len(jax.devices())

    def run(k):
        return sample(model, params, k, B, 8, num_steps=4)

    ref_toks, ref_conf = jax.jit(run)(jax.random.PRNGKey(5))

    ctx = create_mesh()
    sh = batch_sharding(ctx)
    sharded = jax.jit(run, out_shardings=(sh, sh))
    out_toks, out_conf = sharded(jax.random.PRNGKey(5))
    assert out_toks.sharding.is_equivalent_to(sh, out_toks.ndim)
    np.testing.assert_array_equal(np.asarray(out_toks), np.asarray(ref_toks))
    np.testing.assert_allclose(np.asarray(out_conf), np.asarray(ref_conf),
                               rtol=1e-6, atol=1e-6)


def test_sampler_deterministic_at_zero_temperature(rng):
    model = tiny_dplm()
    toks, valid = _tokens(rng)
    params = model.init(jax.random.PRNGKey(0), toks, valid)["params"]
    o1, _ = sample(model, params, jax.random.PRNGKey(3), 2, 6, temperature=0.0)
    o2, _ = sample(model, params, jax.random.PRNGKey(4), 2, 6, temperature=0.0)
    # temperature 0 -> greedy; different keys only affect tie-break noise at
    # keep-ratio>0, so at least the fully-kept final step must be greedy
    assert np.asarray(o1).shape == (2, 8)


def test_clip_guided_sample_picks_high_scores(rng):
    """score_fn rewards alanine content -> guided output has more A than the
    per-candidate average."""
    model = tiny_dplm()
    toks, valid = _tokens(rng)
    params = model.init(jax.random.PRNGKey(0), toks, valid)["params"]
    A = protein.TOKEN_TO_ID["A"]

    def score_fn(tokens):
        return (tokens == A).sum(axis=-1).astype(jnp.float32)

    picked, scores = clip_guided_sample(
        model, params, jax.random.PRNGKey(5), score_fn,
        batch_size=4, length=10, num_candidates=4,
    )
    assert picked.shape == (4, 12)
    # the reranker's reported score equals the recomputed score of the pick
    np.testing.assert_array_equal(
        np.asarray(scores), np.asarray(score_fn(picked))
    )
    # and it's the max over a fresh sample of candidates' mean (weak check)
    assert float(scores.mean()) >= 0.0


def test_clip_guided_flatten_modes_agree(rng):
    """flatten_chains=True (default, one K*B-row chain) and the vmapped
    fallback satisfy the same contracts with PER-ROW conditioning: score_fn
    and logit_bias_fn see (B, ...) arrays in both modes (under flattening
    they are vmapped over chain views), rows are reranked per slot, and the
    per-row guidance steers each row toward ITS OWN target residue."""
    model = tiny_dplm()
    toks, valid = _tokens(rng)
    params = model.init(jax.random.PRNGKey(0), toks, valid)["params"]
    B, K = 2, 3
    targets = jnp.asarray(
        [protein.TOKEN_TO_ID["A"], protein.TOKEN_TO_ID["G"]])  # per row

    def score_fn(tokens):  # (B, S) -> (B,): count of the row's own target
        assert tokens.shape[0] == B, tokens.shape
        return (tokens == targets[:, None]).sum(-1).astype(jnp.float32)

    def logit_bias_fn(tokens, logits):  # per-row bias toward targets[b]
        assert tokens.shape[0] == B, tokens.shape
        onehot = jax.nn.one_hot(targets, logits.shape[-1])  # (B, V)
        return 50.0 * onehot[:, None, :]

    for flatten in (True, False):
        picked, scores = clip_guided_sample(
            model, params, jax.random.PRNGKey(5), score_fn,
            batch_size=B, length=8, num_candidates=K,
            logit_bias_fn=logit_bias_fn, flatten_chains=flatten,
        )
        assert picked.shape == (B, 10)
        np.testing.assert_array_equal(
            np.asarray(scores), np.asarray(score_fn(picked)))
        inner = np.asarray(picked)[:, 1:-1]
        for b in range(B):  # row-b guidance floods row b with targets[b]
            assert (inner[b] == int(targets[b])).mean() > 0.9, (flatten, b)


def test_guided_sampling_with_logit_bias(rng):
    """Soft guidance: biasing logits toward glycine floods the output."""
    model = tiny_dplm()
    toks, valid = _tokens(rng)
    params = model.init(jax.random.PRNGKey(0), toks, valid)["params"]
    G = protein.TOKEN_TO_ID["G"]
    bias = jnp.zeros((33,)).at[G].set(50.0)

    out, _ = sample(
        model, params, jax.random.PRNGKey(6), 2, 8,
        logit_bias_fn=lambda tokens, logits: bias[None, None, :],
    )
    inner = np.asarray(out)[:, 1:-1]
    assert (inner == G).mean() > 0.9


@pytest.mark.slow
def test_init_from_esm_checkpoint(rng):
    """DPLM trunk warm-started from a converted HF ESM checkpoint produces
    the SAME hidden representations as the ESM tower (before the LM head)."""
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import EsmConfig as HFEsmConfig, EsmModel

    from clip_dplm_tpu.config import ESMConfig
    from clip_dplm_tpu.models.dplm import init_dplm_from_esm
    from clip_dplm_tpu.models.esm import ESMTower, convert_esm_torch_params

    torch.manual_seed(0)
    hf = EsmModel(HFEsmConfig(
        vocab_size=33, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=64, position_embedding_type="rotary",
        token_dropout=False, emb_layer_norm_before=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=1, mask_token_id=32,
    ), add_pooling_layer=False)
    esm_cfg = ESMConfig(name="tiny", vocab_size=33, d_model=32, num_layers=2,
                        num_heads=2, max_len=64, token_dropout=False,
                        layer_norm_eps=1e-12)
    esm_params = convert_esm_torch_params(hf.state_dict(), esm_cfg)

    dcfg = DPLMConfig(vocab_size=33, d_model=32, num_layers=2, num_heads=2,
                      max_len=64, num_diffusion_steps=4, layer_norm_eps=1e-12)
    dplm = DPLM(cfg=dcfg, dtype=jnp.float32)
    toks, valid = _tokens(rng, B=2, L=10)
    fresh = dplm.init(jax.random.PRNGKey(0), toks, valid)["params"]
    warm = init_dplm_from_esm(esm_params, fresh)

    # trunk equivalence: ESM tower token output == DPLM pre-head hidden
    esm_tower = ESMTower(cfg=esm_cfg, dtype=jnp.float32)
    esm_out = esm_tower.apply({"params": esm_params}, toks, valid,
                              pooling="tokens")
    logits = dplm.apply({"params": warm}, toks, valid)
    # tied head: logits = hidden @ embedding.T -> recover parity by comparing
    # against esm_out @ embedding.T
    emb = np.asarray(esm_params["embed_tokens"]["embedding"])
    expected = np.asarray(esm_out) @ emb.T
    np.testing.assert_allclose(
        np.asarray(logits), expected, atol=1e-4, rtol=1e-4
    )


def test_esm_tower_soft_path_matches_hard(rng):
    """ESMTower(token_probs=one_hot(tokens)) == ESMTower(tokens) exactly (the
    relaxation used by soft CLIP guidance is consistent at the corners)."""
    from clip_dplm_tpu.config import ESMConfig
    from clip_dplm_tpu.models.esm import ESMTower

    cfg = ESMConfig(name="tiny", vocab_size=33, d_model=32, num_layers=2,
                    num_heads=2, max_len=64, token_dropout=True)
    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    toks, valid = _tokens(rng, B=3, L=9)
    # include a <mask> token so the token-dropout rescale path is exercised
    toks = toks.at[0, 2].set(MASK_IDX)
    params = tower.init(jax.random.PRNGKey(0), toks, valid)["params"]
    hard = tower.apply({"params": params}, toks, valid, pooling="mean_residues")
    probs = jax.nn.one_hot(toks, 33, dtype=jnp.float32)
    soft = tower.apply({"params": params}, toks, valid,
                       pooling="mean_residues", token_probs=probs)
    np.testing.assert_allclose(np.asarray(soft), np.asarray(hard),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_soft_guidance_beats_rerank_at_equal_compute(rng):
    """Per-step soft (gradient) guidance on a synthetic differentiable scorer
    steers single chains above best-of-3 reranked unguided chains — the
    guided chain spends ~1 extra scorer fwd+bwd per step, the reranker 3x the
    sampler compute, so the comparison favors the reranker on raw FLOPs."""
    from clip_dplm_tpu.models.guided_generation import make_soft_logit_bias_fn

    model = tiny_dplm()
    toks, valid = _tokens(rng)
    params = model.init(jax.random.PRNGKey(0), toks, valid)["params"]
    A = protein.TOKEN_TO_ID["A"]

    def hard_score(tokens):
        return (tokens == A).sum(axis=-1).astype(jnp.float32)

    def soft_score(probs, tokens):
        gen = (tokens != CLS_IDX) & (tokens != EOS_IDX)
        return jnp.sum(probs[..., A] * gen, axis=-1)

    bias_fn = make_soft_logit_bias_fn(soft_score, guidance_scale=20.0)
    guided, _ = sample(model, params, jax.random.PRNGKey(7), 4, 10,
                       logit_bias_fn=bias_fn)
    reranked, _ = clip_guided_sample(
        model, params, jax.random.PRNGKey(7), hard_score,
        batch_size=4, length=10, num_candidates=3,
    )
    g = float(hard_score(guided).mean())
    r = float(hard_score(reranked).mean())
    assert g > r, (g, r)
    # guided output is still a valid protein
    inner = np.asarray(guided)[:, 1:-1]
    assert ((inner >= RESIDUE_LO) & (inner <= RESIDUE_HI)).all()


def test_scan_layers_matches_unrolled(rng):
    """dplm.scan_layers: one scanned block over stacked params computes the
    same function as the unrolled trunk (param conversion via
    stack_dplm_layers); sampling works under the scanned trunk."""
    from clip_dplm_tpu.models.dplm import stack_dplm_layers

    cfg = DPLMConfig(vocab_size=33, d_model=32, num_layers=3, num_heads=2,
                     max_len=32, num_diffusion_steps=4)
    cfg_s = DPLMConfig(**{**cfg.__dict__, "scan_layers": True})
    m = DPLM(cfg=cfg, dtype=jnp.float32)
    ms = DPLM(cfg=cfg_s, dtype=jnp.float32)
    toks, valid = _tokens(rng)
    p = m.init(jax.random.PRNGKey(0), toks)["params"]
    ps = stack_dplm_layers(p, cfg.num_layers)
    init_s = ms.init(jax.random.PRNGKey(0), toks)["params"]
    assert jax.tree_util.tree_structure(init_s) == \
        jax.tree_util.tree_structure(ps)
    a = m.apply({"params": p}, toks, valid)
    b = ms.apply({"params": ps}, toks, valid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
    seqs, _ = sample(ms, ps, jax.random.PRNGKey(1), batch_size=2, length=8,
                     num_steps=3)
    assert seqs.shape == (2, 10)
    assert bool(jnp.all(seqs[:, 0] == CLS_IDX))
