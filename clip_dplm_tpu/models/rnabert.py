"""RNABERT-compatible RNA base encoder in flax.

The reference gets per-base RNA motif embeddings by shelling out to the
external RNABERT repo and re-reading a text file
(old/encoders.py:53-74 RNABERTEncodingModule -> `python MLM_SFP.py ...` ->
pandas parse). Here the encoder is native: a post-LN BERT stack at the
published RNABERT geometry (hidden 120, 6 layers, 12 heads — the 120-dim
embeddings the RNA tower consumes, rna nb cell 28 `input_dim=120`), with a
converter for HF `BertModel` state_dicts so trained checkpoints in the
standard BERT layout load 1:1 (parity-tested on random weights,
tests/test_rnabert.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clip_dplm_tpu.config import RNABertConfig

_NEG_INF = -1e9

# base vocabulary: specials then nucleotides (T is normalized to U)
RNA_VOCAB: List[str] = ["<pad>", "<mask>", "<cls>", "<eos>", "A", "U", "G", "C", "<unk>"]
RNA_TOKEN_TO_ID = {t: i for i, t in enumerate(RNA_VOCAB)}
RNA_PAD_IDX = 0
RNA_UNK_IDX = RNA_TOKEN_TO_ID["<unk>"]


def tokenize_rna(seq: str, max_len: Optional[int] = None) -> np.ndarray:
    """RNA sequence -> int32 base ids (DNA T mapped to U, no specials —
    RNABERT embeds raw bases)."""
    seq = "".join(seq.split()).upper().replace("T", "U")
    ids = [RNA_TOKEN_TO_ID.get(c, RNA_UNK_IDX) for c in seq]
    if max_len is not None:
        ids = ids[:max_len]
    return np.asarray(ids, dtype=np.int32)


def tokenize_rna_batch(
    seqs: Sequence[str], max_len: Optional[int] = None, pad_multiple: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    toks = [tokenize_rna(s, max_len) for s in seqs]
    L = max(len(t) for t in toks)
    S = ((L + pad_multiple - 1) // pad_multiple) * pad_multiple
    out = np.full((len(toks), S), RNA_PAD_IDX, dtype=np.int32)
    mask = np.zeros((len(toks), S), dtype=bool)
    for i, t in enumerate(toks):
        out[i, : len(t)] = t
        mask[i, : len(t)] = True
    return out, mask


class BertBlock(nn.Module):
    """Post-LN BERT encoder layer (HF BertLayer semantics)."""

    cfg: RNABertConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        H, Dh = c.num_heads, c.d_model // c.num_heads
        B, S, _ = x.shape
        dense = lambda n, d: nn.Dense(d, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=n)
        q, k, v = (dense(n, c.d_model)(x) for n in ("q", "k", "v"))

        def heads(t):
            return t.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", heads(q), heads(k),
            preferred_element_type=jnp.float32) / np.sqrt(Dh)
        if mask is not None:
            logits = logits + jnp.where(mask[:, None, None, :], 0.0, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, heads(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, c.d_model)
        attn = dense("attn_out", c.d_model)(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype,
                         name="ln_attn")(x + attn).astype(self.dtype)

        h = dense("ffn_in", c.d_ff)(x)
        h = nn.gelu(h, approximate=False)
        h = dense("ffn_out", c.d_model)(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                            param_dtype=self.param_dtype,
                            name="ln_ffn")(x + h).astype(self.dtype)


class RNABertTower(nn.Module):
    """BERT encoder over RNA base ids (B, S) with (B, S) validity mask;
    returns (B, S, 120) per-base embeddings (the RNABERTEncodingModule
    contract) or a masked mean."""

    cfg: RNABertConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        mask: Optional[jax.Array] = None,
        pooling: str = "tokens",
    ) -> jax.Array:
        c = self.cfg
        B, S = tokens.shape
        if mask is None:
            mask = tokens != RNA_PAD_IDX
        emb = nn.Embed(c.vocab_size, c.d_model, param_dtype=self.param_dtype,
                       name="word_embeddings")(tokens)
        pos = nn.Embed(c.max_len, c.d_model, param_dtype=self.param_dtype,
                       name="position_embeddings")(jnp.arange(S)[None])
        typ = nn.Embed(c.type_vocab_size, c.d_model,
                       param_dtype=self.param_dtype,
                       name="token_type_embeddings")(
            jnp.zeros((B, S), jnp.int32))
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="embed_ln")(
            emb + pos + typ)
        h = jnp.where(mask[..., None], h, 0.0).astype(self.dtype)
        for i in range(c.num_layers):
            h = BertBlock(cfg=c, dtype=self.dtype,
                          param_dtype=self.param_dtype, name=f"layer_{i}")(
                h, mask)
        if pooling == "tokens":
            return h.astype(jnp.float32)
        if pooling == "mean":
            w = mask[..., None].astype(jnp.float32)
            return (h.astype(jnp.float32) * w).sum(axis=1) / jnp.maximum(
                w.sum(axis=1), 1.0)
        raise ValueError(f"unknown pooling {pooling!r}")


def convert_bert_torch_params(state_dict: Dict[str, Any], cfg: RNABertConfig):
    """HF `BertModel.state_dict()` -> RNABertTower params pytree."""

    def t(name):
        w = state_dict[name]
        if hasattr(w, "detach"):
            w = w.detach().cpu().numpy()
        return jnp.asarray(np.asarray(w, dtype=np.float32))

    def dense(name):
        return {"kernel": t(f"{name}.weight").T, "bias": t(f"{name}.bias")}

    def ln(name):
        return {"scale": t(f"{name}.weight"), "bias": t(f"{name}.bias")}

    params = {
        "word_embeddings": {"embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": t("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {
            "embedding": t("embeddings.token_type_embeddings.weight")},
        "embed_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": dense(f"{pre}.attention.self.query"),
            "k": dense(f"{pre}.attention.self.key"),
            "v": dense(f"{pre}.attention.self.value"),
            "attn_out": dense(f"{pre}.attention.output.dense"),
            "ln_attn": ln(f"{pre}.attention.output.LayerNorm"),
            "ffn_in": dense(f"{pre}.intermediate.dense"),
            "ffn_out": dense(f"{pre}.output.dense"),
            "ln_ffn": ln(f"{pre}.output.LayerNorm"),
        }
    return params


def export_bert_torch_params(params, cfg: RNABertConfig) -> Dict[str, Any]:
    """Inverse of convert_bert_torch_params: RNABertTower flax params -> an
    HF `BertModel` state_dict (numpy fp32). Exact roundtrip
    (test_rnabert::test_export_roundtrips_converter)."""

    def arr(x):
        return np.asarray(x, dtype=np.float32)

    def dense(name, leaf):
        return {f"{name}.weight": arr(leaf["kernel"]).T,
                f"{name}.bias": arr(leaf["bias"])}

    def ln(name, leaf):
        return {f"{name}.weight": arr(leaf["scale"]),
                f"{name}.bias": arr(leaf["bias"])}

    sd: Dict[str, Any] = {
        "embeddings.word_embeddings.weight":
            arr(params["word_embeddings"]["embedding"]),
        "embeddings.position_embeddings.weight":
            arr(params["position_embeddings"]["embedding"]),
        "embeddings.token_type_embeddings.weight":
            arr(params["token_type_embeddings"]["embedding"]),
    }
    sd.update(ln("embeddings.LayerNorm", params["embed_ln"]))
    for i in range(cfg.num_layers):
        blk = params[f"layer_{i}"]
        pre = f"encoder.layer.{i}"
        sd.update(dense(f"{pre}.attention.self.query", blk["q"]))
        sd.update(dense(f"{pre}.attention.self.key", blk["k"]))
        sd.update(dense(f"{pre}.attention.self.value", blk["v"]))
        sd.update(dense(f"{pre}.attention.output.dense", blk["attn_out"]))
        sd.update(ln(f"{pre}.attention.output.LayerNorm", blk["ln_attn"]))
        sd.update(dense(f"{pre}.intermediate.dense", blk["ffn_in"]))
        sd.update(dense(f"{pre}.output.dense", blk["ffn_out"]))
        sd.update(ln(f"{pre}.output.LayerNorm", blk["ln_ffn"]))
    return sd
