"""ProtT5 tower: numerical parity against HF transformers' T5EncoderModel
(relative position bias, RMSNorm, unscaled attention — random weights, the
checkpoint-conversion gate), tokenizer conventions, pooling semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import ProtT5Config
from clip_dplm_tpu.data import protein
from clip_dplm_tpu.models.t5 import (
    ProtT5Tower,
    convert_t5_torch_params,
    prot_t5_config_from_name,
    relative_position_bucket,
)


def test_prot_t5_tokenizer():
    ids = protein.tokenize_prot_t5("M K T")  # spaced input is normalized
    assert ids[-1] == protein.T5_EOS_IDX
    assert len(ids) == 4
    # UZOB -> X replacement is always on for ProtT5 (old/encoders.py:22)
    ids2 = protein.tokenize_prot_t5("MU")
    assert ids2[1] == protein.PROT_T5_TOKEN_TO_ID["X"]


def test_prot_t5_batch_shapes():
    toks, mask = protein.tokenize_prot_t5_batch(["MKT", "M"], pad_multiple=8)
    assert toks.shape == (2, 8)
    assert mask[0].sum() == 4 and mask[1].sum() == 2
    assert (toks[1, 2:] == protein.T5_PAD_IDX).all()


def test_bucket_function_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = np.arange(-50, 50, dtype=np.int64)
    got = np.asarray(
        relative_position_bucket(jnp.asarray(rel), num_buckets=32,
                                 max_distance=128))
    want = T5Attention._relative_position_bucket(
        torch.tensor(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(got, want)


def test_presets():
    xl = prot_t5_config_from_name("prot_t5_xl")
    assert xl.d_ff == 16384 and xl.num_layers == 24 and xl.d_kv == 128
    with pytest.raises(ValueError):
        prot_t5_config_from_name("nope")


@pytest.fixture(scope="module")
def hf_t5_pair():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5EncoderModel

    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=28, d_model=48, d_kv=12, d_ff=96, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="relu", is_encoder_decoder=False, use_cache=False,
    )
    hf = T5EncoderModel(hf_cfg)
    hf.eval()
    cfg = ProtT5Config(name="tiny", vocab_size=28, d_model=48, d_kv=12,
                       d_ff=96, num_layers=2, num_heads=4)
    params = convert_t5_torch_params(hf.state_dict(), cfg)
    return hf, cfg, params


def test_parity_with_hf_t5(hf_t5_pair, rng):
    torch = pytest.importorskip("torch")
    hf, cfg, params = hf_t5_pair

    seqs = [protein.random_protein(rng, 21), protein.random_protein(rng, 11)]
    toks, mask = protein.tokenize_prot_t5_batch(seqs, pad_multiple=8)

    with torch.no_grad():
        out_hf = hf(
            input_ids=torch.tensor(np.asarray(toks, dtype=np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    tower = ProtT5Tower(cfg=cfg, dtype=jnp.float32)
    out = np.asarray(
        tower.apply({"params": params}, jnp.asarray(toks), jnp.asarray(mask))
    )
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(
            out[b, :n], out_hf[b, :n], atol=1e-5, rtol=1e-4,
            err_msg=f"sequence {b} diverges from HF T5EncoderModel",
        )


def test_mean_residue_pooling(hf_t5_pair, rng):
    _, cfg, params = hf_t5_pair
    seqs = [protein.random_protein(rng, 9)]
    toks, mask = protein.tokenize_prot_t5_batch(seqs, pad_multiple=8)
    tower = ProtT5Tower(cfg=cfg, dtype=jnp.float32)
    tok_emb = np.asarray(
        tower.apply({"params": params}, jnp.asarray(toks), jnp.asarray(mask)))
    pooled = np.asarray(
        tower.apply({"params": params}, jnp.asarray(toks), jnp.asarray(mask),
                    pooling="mean_residues"))
    # mean over the 9 residues, excluding </s> and padding
    np.testing.assert_allclose(pooled[0], tok_emb[0, :9].mean(axis=0),
                               atol=1e-6)


def test_export_roundtrips_converter(hf_t5_pair):
    """export_t5_torch_params inverts convert_t5_torch_params bit-exactly
    for every key the tower owns."""
    import numpy as np

    from clip_dplm_tpu.models.t5 import export_t5_torch_params

    hf, cfg, params = hf_t5_pair
    sd = export_t5_torch_params(params, cfg)
    ref = {k: np.asarray(v.detach().numpy(), np.float32)
           for k, v in hf.state_dict().items()}
    for k, v in sd.items():
        np.testing.assert_array_equal(v, ref[k], err_msg=k)
