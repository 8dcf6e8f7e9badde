"""RNABERT tower: numerical parity against HF transformers' BertModel
(random weights at RNABERT geometry), tokenizer conventions, pooling."""

import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import RNABertConfig
from clip_dplm_tpu.models.rnabert import (
    RNABertTower,
    convert_bert_torch_params,
    tokenize_rna,
    tokenize_rna_batch,
)


def test_rna_tokenizer():
    ids = tokenize_rna("AUGC")
    assert len(ids) == 4 and len(set(ids.tolist())) == 4
    # DNA input normalizes T -> U
    np.testing.assert_array_equal(tokenize_rna("ATGC"), tokenize_rna("AUGC"))
    assert tokenize_rna("AN")[1] == 8  # unknown base


def test_rna_batch_shapes():
    toks, mask = tokenize_rna_batch(["AUGCAUGC", "AU"], pad_multiple=8)
    assert toks.shape == (2, 8)
    assert mask[1].sum() == 2 and (toks[1, 2:] == 0).all()


@pytest.fixture(scope="module")
def hf_bert_pair():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    cfg = RNABertConfig(num_layers=2)  # RNABERT dims, 2 layers for speed
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.d_model,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.d_ff, max_position_embeddings=cfg.max_len,
        type_vocab_size=cfg.type_vocab_size, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=cfg.layer_norm_eps,
        pad_token_id=0,
    )
    hf = BertModel(hf_cfg, add_pooling_layer=False)
    hf.eval()
    params = convert_bert_torch_params(hf.state_dict(), cfg)
    return hf, cfg, params


def test_parity_with_hf_bert(hf_bert_pair):
    torch = pytest.importorskip("torch")
    hf, cfg, params = hf_bert_pair

    toks, mask = tokenize_rna_batch(["AUGGCUACGUA", "AUGC"], pad_multiple=8)
    with torch.no_grad():
        out_hf = hf(
            input_ids=torch.tensor(np.asarray(toks, dtype=np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    tower = RNABertTower(cfg=cfg, dtype=jnp.float32)
    out = np.asarray(
        tower.apply({"params": params}, jnp.asarray(toks), jnp.asarray(mask)))
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(
            out[b, :n], out_hf[b, :n], atol=1e-5, rtol=1e-4,
            err_msg=f"sequence {b} diverges from HF BertModel",
        )


def test_embeddings_feed_rna_tower(hf_bert_pair):
    """The (B, S, 120) output slots into the RNA token tower input contract
    (rna nb cell 28: input_dim=120)."""
    _, cfg, params = hf_bert_pair
    toks, mask = tokenize_rna_batch(["AUGGCUACGUA"], pad_multiple=8)
    tower = RNABertTower(cfg=cfg, dtype=jnp.float32)
    emb = tower.apply({"params": params}, jnp.asarray(toks), jnp.asarray(mask))
    assert emb.shape == (1, 16, 120)
    pooled = tower.apply({"params": params}, jnp.asarray(toks),
                         jnp.asarray(mask), pooling="mean")
    assert pooled.shape == (1, 120)
    np.testing.assert_allclose(
        np.asarray(pooled[0]),
        np.asarray(emb[0][np.asarray(mask[0])]).mean(axis=0), atol=1e-6)


def test_export_roundtrips_converter(hf_bert_pair):
    """export_bert_torch_params inverts convert_bert_torch_params
    bit-exactly for every key the tower owns."""
    import numpy as np

    from clip_dplm_tpu.models.rnabert import export_bert_torch_params

    hf, cfg, params = hf_bert_pair
    sd = export_bert_torch_params(params, cfg)
    ref = {k: np.asarray(v.detach().numpy(), np.float32)
           for k, v in hf.state_dict().items()}
    for k, v in sd.items():
        np.testing.assert_array_equal(v, ref[k], err_msg=k)
