"""ESM tower: numerical parity against HF transformers' EsmModel (rotary,
random weights — the checkpoint-conversion gate of BASELINE.json), tokenizer
round-trip, pooling semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import ESMConfig
from clip_dplm_tpu.data import protein
from clip_dplm_tpu.models.esm import (
    ESMTower,
    convert_esm_torch_params,
    esm_config_from_name,
    rotary_embed,
)


def test_tokenizer_basic():
    ids = protein.tokenize("LAGV")
    assert ids[0] == protein.CLS_IDX and ids[-1] == protein.EOS_IDX
    assert len(ids) == 6
    # unknown residue -> unk
    ids2 = protein.tokenize("LAJ")  # J is not in the alphabet
    assert ids2[3] == protein.UNK_IDX


def test_tokenizer_uzob_replacement():
    ids = protein.tokenize("LUZB", replace_uzob=True)
    x = protein.TOKEN_TO_ID["X"]
    assert ids[2] == x and ids[3] == x and ids[4] == x


def test_tokenize_batch_shapes():
    toks, mask = protein.tokenize_batch(["LAGV", "LA"], pad_multiple=8)
    assert toks.shape == (2, 8)
    assert mask[0].sum() == 6 and mask[1].sum() == 4
    assert (toks[1, 4:] == protein.PAD_IDX).all()


def test_tokenizer_truncation():
    ids = protein.tokenize("L" * 100, max_len=16)
    assert len(ids) == 16
    assert ids[0] == protein.CLS_IDX and ids[-1] == protein.EOS_IDX


def test_rotary_identity_at_zero():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 4, 8)).astype(np.float32))
    out = rotary_embed(x[:, :, :1], jnp.arange(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[:, :, :1]), atol=1e-6)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import EsmConfig as HFEsmConfig, EsmModel

    torch.manual_seed(0)
    hf_cfg = HFEsmConfig(
        vocab_size=33, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=128, position_embedding_type="rotary",
        token_dropout=True, emb_layer_norm_before=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=1, mask_token_id=32,
    )
    hf = EsmModel(hf_cfg, add_pooling_layer=False)
    hf.eval()
    cfg = ESMConfig(name="tiny", vocab_size=33, d_model=64, num_layers=2,
                    num_heads=4, max_len=128, token_dropout=True,
                    layer_norm_eps=1e-12)  # HF EsmConfig default
    params = convert_esm_torch_params(hf.state_dict(), cfg)
    return hf, cfg, params


def test_parity_with_hf_esm(hf_pair, rng):
    torch = pytest.importorskip("torch")
    hf, cfg, params = hf_pair

    seqs = [protein.random_protein(rng, 20), protein.random_protein(rng, 13)]
    toks, mask = protein.tokenize_batch(seqs, pad_multiple=8)

    with torch.no_grad():
        out_hf = hf(
            input_ids=torch.tensor(np.asarray(toks, dtype=np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    out = tower.apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask), pooling="tokens"
    )
    out = np.asarray(out)
    # compare valid positions only
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(
            out[b, :n], out_hf[b, :n], atol=1e-5, rtol=1e-4,
            err_msg=f"sequence {b} token embeddings diverge from HF ESM",
        )


def test_parity_mean_residue_pooling(hf_pair, rng):
    torch = pytest.importorskip("torch")
    hf, cfg, params = hf_pair
    seqs = [protein.random_protein(rng, 17)]
    toks, mask = protein.tokenize_batch(seqs, pad_multiple=8)
    with torch.no_grad():
        h = hf(
            input_ids=torch.tensor(np.asarray(toks, dtype=np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    n = int(mask[0].sum())
    expected = h[0, 1 : n - 1].mean(axis=0)  # excl BOS/EOS (tf nb cell 21)

    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    got = tower.apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask),
        pooling="mean_residues",
    )
    np.testing.assert_allclose(np.asarray(got)[0], expected, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_esm_mask_invariance(hf_pair, rng):
    """Padding must not leak into real positions."""
    _, cfg, params = hf_pair
    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    toks, mask = protein.tokenize_batch([protein.random_protein(rng, 10)], pad_multiple=16)
    out1 = tower.apply({"params": params}, jnp.asarray(toks), jnp.asarray(mask),
                       pooling="mean_residues")
    toks2 = toks.copy()
    toks2[0, mask[0].sum():] = 7  # garbage token ids in padded region
    out2 = tower.apply({"params": params}, jnp.asarray(toks2), jnp.asarray(mask),
                       pooling="mean_residues")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_esm_config_family():
    cfg = esm_config_from_name("esm2_t33_650M")
    assert cfg.d_model == 1280 and cfg.num_layers == 33 and cfg.num_heads == 20
    cfg8 = esm_config_from_name("esm2_t6_8M")
    assert cfg8.d_model == 320 and cfg8.num_layers == 6


@pytest.mark.slow
def test_bf16_tower_close_to_fp32(hf_pair, rng):
    """The bf16 compute policy (production path) stays within bf16 tolerance
    of the fp32 tower — the 'bf16 numerics' parity gate of SURVEY.md sec 7."""
    _, cfg, params = hf_pair
    toks, mask = protein.tokenize_batch([protein.random_protein(rng, 25)])
    f32 = ESMTower(cfg=cfg, dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask),
        pooling="mean_residues",
    )
    bf16 = ESMTower(cfg=cfg, dtype=jnp.bfloat16).apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask),
        pooling="mean_residues",
    )
    a = np.asarray(bf16, np.float32)[0]
    b = np.asarray(f32)[0]
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos  # direction preserved (what retrieval uses)
    # per-component error small relative to the embedding norm
    assert np.abs(a - b).max() / np.linalg.norm(b) < 0.02
