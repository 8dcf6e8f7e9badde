"""Real-pretrained-weights runbook: fetch, convert, verify — one command.

Closes the last parity gap between "random-weight HF parity" (the in-repo
tests) and "real-weight gate closed": the reference actually runs ESM-2 650M
(tf nb cell 21) and ProtT5-XL (old/encoders.py:15-31) with published weights,
which this image cannot reach (no network egress). The moment egress exists:

    python scripts/fetch_and_verify_pretrained.py            # esm + prot_t5
    python scripts/fetch_and_verify_pretrained.py --models esm
    python scripts/fetch_and_verify_pretrained.py --esm-name esm2_t33_650M

per model it
  1. downloads the published checkpoint from the HF hub,
  2. converts it with the in-repo converter (convert_esm_torch_params /
     convert_t5_torch_params / convert_bert_torch_params),
  3. verifies token-embedding parity vs the HF torch forward on a probe
     sequence set (gate: max abs diff < 1e-4 in fp32),
  4. measures bf16 drift (our bf16 tower vs HF fp32) — informational, this
     is the frozen-tower numeric the BASELINE gate cares about,
  5. writes evidence/pretrained_parity.json + the probe embeddings.

Without egress it FAILS FAST (socket probe, 5 s) with a clear message.

`--offline-selftest` needs NO egress: it writes synthetic checkpoints in the
HF on-disk format (save_pretrained) for all three families and pushes them
through the exact same from_pretrained -> convert -> parity-gate ->
publish-back pipeline, so every runbook step except the download itself is
exercised in CI (tests/test_pretrained_runbook.py).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HUB_HOST = "huggingface.co"

PROBE_PROTEINS = [
    "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQVKVKALPDAQFEVVHSLAKWKRQTLGQHDFSAGEGLYTHMKALRPDEDRLSPLHSVYVDQWDWE",
    "MSDNGPQNQRNAPRITFGGPSDSTGSNQNGERSGARSKQRRPQGLPNNTASWFTALTQHGKEDL",
    "MAHHHHHHVGTGSNGDDDLKRELEELRKEAGIS",
]
PROBE_RNAS = ["AUGGCUACGUAGCUAGCUAGGCAU", "GGGAAACCCUUU", "AUGCAUGCAUGC"]


def check_egress() -> None:
    try:
        with socket.create_connection((HUB_HOST, 443), timeout=5):
            return
    except OSError as e:
        raise SystemExit(
            f"NO NETWORK EGRESS: cannot reach {HUB_HOST}:443 ({e}).\n"
            "This runbook needs internet access to download published "
            "checkpoints. Re-run it from an environment with egress; "
            "nothing was downloaded or verified."
        )


def _max_diff(a: np.ndarray, b: np.ndarray, mask: np.ndarray) -> float:
    diffs = [
        float(np.abs(a[i, : int(mask[i].sum())]
                     - b[i, : int(mask[i].sum())]).max())
        for i in range(len(a))
    ]
    return max(diffs)


def verify_esm(name: str, out: dict, src: str = None, cfg=None) -> None:
    """`src` (a local HF checkpoint dir) + `cfg` replace the hub download —
    the offline selftest path; everything downstream of from_pretrained is
    identical to the real-weights run."""
    import jax.numpy as jnp
    import torch
    from transformers import EsmModel

    from clip_dplm_tpu.data import protein
    from clip_dplm_tpu.models.esm import (
        ESMTower, convert_esm_torch_params, esm_config_from_name,
    )

    hf_id = src or {
        "esm2_t6_8M": "facebook/esm2_t6_8M_UR50D",
        "esm2_t12_35M": "facebook/esm2_t12_35M_UR50D",
        "esm2_t30_150M": "facebook/esm2_t30_150M_UR50D",
        "esm2_t33_650M": "facebook/esm2_t33_650M_UR50D",
    }[name]
    print(f"[esm] {'loading' if src else 'downloading'} {hf_id} ...",
          flush=True)
    hf = EsmModel.from_pretrained(hf_id, add_pooling_layer=False)
    hf.eval()
    if cfg is None:
        cfg = esm_config_from_name(
            name, layer_norm_eps=hf.config.layer_norm_eps)
    params = convert_esm_torch_params(hf.state_dict(), cfg)

    toks, mask = protein.tokenize_batch(PROBE_PROTEINS, pad_multiple=8)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(np.asarray(toks, dtype=np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    tower = ESMTower(cfg=cfg, dtype=jnp.float32)
    got = np.asarray(tower.apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask),
        pooling="tokens"))
    diff = _max_diff(got, want, mask)

    tower_bf16 = ESMTower(cfg=cfg, dtype=jnp.bfloat16)
    got_bf16 = np.asarray(tower_bf16.apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask),
        pooling="tokens"), np.float32)
    drift = _max_diff(got_bf16, want, mask)
    rel_drift = drift / max(float(np.abs(want).max()), 1e-9)

    pooled = np.asarray(tower.apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask),
        pooling="mean_residues"))
    out["esm"] = {
        "hf_id": hf_id, "max_abs_diff_fp32": diff,
        "bf16_max_abs_drift": drift, "bf16_rel_drift": rel_drift,
        "gate_fp32_lt_1e-4": bool(diff < 1e-4),
        "probe_embedding_norms": np.linalg.norm(pooled, axis=1).tolist(),
    }
    print(f"[esm] fp32 max abs diff {diff:.2e} "
          f"(gate {'PASS' if diff < 1e-4 else 'FAIL'}); "
          f"bf16 drift {drift:.2e} ({rel_drift:.1%} of output range)")


def verify_prot_t5(out: dict, src: str = None, cfg=None) -> None:
    import jax.numpy as jnp
    import torch
    from transformers import T5EncoderModel

    from clip_dplm_tpu.data import protein
    from clip_dplm_tpu.models.t5 import (
        ProtT5Tower, convert_t5_torch_params, prot_t5_config_from_name,
    )

    hf_id = src or "Rostlab/prot_t5_xl_half_uniref50-enc"
    print(f"[prot_t5] {'loading' if src else 'downloading (~5.5 GB)'} "
          f"{hf_id} ...", flush=True)
    hf = T5EncoderModel.from_pretrained(hf_id, torch_dtype=torch.float32)
    hf.eval()
    if cfg is None:
        cfg = prot_t5_config_from_name("prot_t5_xl")
    params = convert_t5_torch_params(hf.state_dict(), cfg)

    toks, mask = protein.tokenize_prot_t5_batch(PROBE_PROTEINS, pad_multiple=8)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(np.asarray(toks, dtype=np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    tower = ProtT5Tower(cfg=cfg, dtype=jnp.float32)
    got = np.asarray(tower.apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask)))
    diff = _max_diff(got, want, mask)
    out["prot_t5"] = {
        "hf_id": hf_id, "max_abs_diff_fp32": diff,
        "gate_fp32_lt_1e-4": bool(diff < 1e-4),
    }
    print(f"[prot_t5] fp32 max abs diff {diff:.2e} "
          f"(gate {'PASS' if diff < 1e-4 else 'FAIL'})")


def verify_rnabert(out: dict, src: str = None, cfg=None) -> None:
    import jax.numpy as jnp
    import torch

    from clip_dplm_tpu.models.rnabert import (
        RNABertConfig, RNABertTower, convert_bert_torch_params,
        tokenize_rna_batch,
    )

    # RNABERT's published weights live in the multimolecule hub org; the
    # checkpoint is a BERT state_dict at d=120/L=6/H=12
    hf_id = src or "multimolecule/rnabert"
    print(f"[rnabert] {'loading' if src else 'downloading'} {hf_id} ...",
          flush=True)
    try:
        from transformers import AutoModel

        hf = AutoModel.from_pretrained(hf_id, trust_remote_code=src is None)
    except Exception as e:  # model card needs the multimolecule package
        out["rnabert"] = {"hf_id": hf_id, "error": str(e)}
        print(f"[rnabert] SKIPPED: {e}\n"
              "  (pip install multimolecule, or export the original "
              "RNABERT torch checkpoint and pass it through "
              "convert_bert_torch_params manually)")
        return
    hf.eval()
    if cfg is None:
        cfg = RNABertConfig()
    params = convert_bert_torch_params(hf.state_dict(), cfg)
    toks, mask = tokenize_rna_batch(PROBE_RNAS, pad_multiple=8)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(np.asarray(toks, dtype=np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    tower = RNABertTower(cfg=cfg, dtype=jnp.float32)
    got = np.asarray(tower.apply(
        {"params": params}, jnp.asarray(toks), jnp.asarray(mask)))
    diff = _max_diff(got, want, mask)
    out["rnabert"] = {
        "hf_id": hf_id, "max_abs_diff_fp32": diff,
        "gate_fp32_lt_1e-4": bool(diff < 1e-4),
    }
    print(f"[rnabert] fp32 max abs diff {diff:.2e} "
          f"(gate {'PASS' if diff < 1e-4 else 'FAIL'})")


def _roundtrip_publish_back(kind: str, hf, params, cfg, out: dict) -> None:
    """Exercise the publish-back exporter against the loaded checkpoint:
    HF sd -> flax -> HF sd must be bit-identical for every exported key,
    i.e. a user can re-publish converted weights to the hub losslessly."""
    if kind == "esm":
        from clip_dplm_tpu.models.esm import export_esm_torch_params as exp
    elif kind == "prot_t5":
        from clip_dplm_tpu.models.t5 import export_t5_torch_params as exp
    else:
        from clip_dplm_tpu.models.rnabert import (
            export_bert_torch_params as exp,
        )
    sd = exp(params, cfg)
    ref = {k: np.asarray(v.detach().numpy(), np.float32)
           for k, v in hf.state_dict().items()}
    worst = 0.0
    for k, v in sd.items():
        if k not in ref:
            raise SystemExit(f"[{kind}] exporter emits unknown key {k}")
        worst = max(worst, float(np.abs(np.asarray(v) - ref[k]).max()))
    out[kind]["publish_back_bit_identical"] = worst == 0.0
    out[kind]["publish_back_keys"] = len(sd)
    print(f"[{kind}] publish-back roundtrip: {len(sd)} keys, "
          f"max abs diff {worst:.1e} "
          f"({'bit-identical' if worst == 0.0 else 'DIVERGED'})")
    if worst != 0.0:
        raise SystemExit(f"[{kind}] publish-back roundtrip diverged")


def offline_selftest() -> dict:
    """No-egress dress rehearsal of the runbook: write synthetic checkpoints
    in the HF ON-DISK format (save_pretrained), then run the exact verify_*
    code paths on them — from_pretrained(disk) -> converter -> fp32 parity
    gate -> bf16 drift -> publish-back roundtrip. After this passes, the
    only step the image cannot test is the download itself."""
    import tempfile

    import torch
    from transformers import (
        BertConfig as HFBertConfig, BertModel,
        EsmConfig as HFEsmConfig, EsmModel,
        T5Config as HFT5Config, T5EncoderModel,
    )

    from clip_dplm_tpu.config import ESMConfig, ProtT5Config, RNABertConfig
    from clip_dplm_tpu.models.esm import convert_esm_torch_params
    from clip_dplm_tpu.models.rnabert import convert_bert_torch_params
    from clip_dplm_tpu.models.t5 import convert_t5_torch_params

    out: dict = {"mode": "offline_selftest",
                 "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S")}
    torch.manual_seed(0)
    with tempfile.TemporaryDirectory() as tmp:
        # --- ESM-2 (rotary attention, token dropout) ------------------
        hf_cfg = HFEsmConfig(
            vocab_size=33, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=256,
            max_position_embeddings=128, position_embedding_type="rotary",
            token_dropout=True, emb_layer_norm_before=False,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            pad_token_id=1, mask_token_id=32,
        )
        d = os.path.join(tmp, "esm")
        EsmModel(hf_cfg, add_pooling_layer=False).save_pretrained(d)
        cfg = ESMConfig(name="selftest", vocab_size=33, d_model=64,
                        num_layers=2, num_heads=4, max_len=128,
                        token_dropout=True, layer_norm_eps=1e-12)
        verify_esm("selftest", out, src=d, cfg=cfg)
        from transformers import EsmModel as _Esm

        hf = _Esm.from_pretrained(d, add_pooling_layer=False)
        _roundtrip_publish_back(
            "esm", hf, convert_esm_torch_params(hf.state_dict(), cfg),
            cfg, out)

        # --- ProtT5 (RMSNorm, relative bias, unscaled attention) ------
        hf_cfg = HFT5Config(
            vocab_size=128, d_model=48, d_kv=12, d_ff=96, num_layers=2,
            num_heads=4, relative_attention_num_buckets=32,
            relative_attention_max_distance=128, dropout_rate=0.0,
            feed_forward_proj="relu", is_encoder_decoder=False,
            use_cache=False,
        )
        d = os.path.join(tmp, "t5")
        T5EncoderModel(hf_cfg).save_pretrained(d)
        cfg = ProtT5Config(name="selftest", vocab_size=128, d_model=48,
                           d_kv=12, d_ff=96, num_layers=2, num_heads=4)
        verify_prot_t5(out, src=d, cfg=cfg)
        hf = T5EncoderModel.from_pretrained(d)
        _roundtrip_publish_back(
            "prot_t5", hf, convert_t5_torch_params(hf.state_dict(), cfg),
            cfg, out)

        # --- RNABERT (learned positions, token types) ------------------
        cfg = RNABertConfig(num_layers=2)
        hf_cfg = HFBertConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.d_model,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.d_ff,
            max_position_embeddings=cfg.max_len,
            type_vocab_size=cfg.type_vocab_size, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            layer_norm_eps=cfg.layer_norm_eps, pad_token_id=0,
        )
        d = os.path.join(tmp, "rnabert")
        BertModel(hf_cfg, add_pooling_layer=False).save_pretrained(d)
        verify_rnabert(out, src=d, cfg=cfg)
        if "error" in out.get("rnabert", {}):
            raise SystemExit(
                f"[rnabert] selftest must not skip: {out['rnabert']}")
        hf = BertModel.from_pretrained(d, add_pooling_layer=False)
        _roundtrip_publish_back(
            "rnabert", hf, convert_bert_torch_params(hf.state_dict(), cfg),
            cfg, out)

    gates = [v["gate_fp32_lt_1e-4"] for v in out.values()
             if isinstance(v, dict) and "gate_fp32_lt_1e-4" in v]
    assert len(gates) == 3
    if not all(gates):
        raise SystemExit("offline selftest parity gates FAILED — see JSON")
    print("OFFLINE SELFTEST: all converter + publish-back gates PASS "
          "(the only unexercised runbook step is the hub download)")
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", default="esm,prot_t5,rnabert",
                    help="comma list of esm,prot_t5,rnabert")
    ap.add_argument("--esm-name", default="esm2_t6_8M",
                    help="ESM-2 family member to verify "
                         "(esm2_t6_8M|esm2_t12_35M|esm2_t30_150M|esm2_t33_650M)")
    ap.add_argument("--offline-selftest", action="store_true",
                    help="no-egress dress rehearsal: synthetic checkpoints "
                         "in the HF on-disk format through the full "
                         "convert/verify/publish-back pipeline")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.offline_selftest:
        out = offline_selftest()
        os.makedirs("evidence", exist_ok=True)
        with open("evidence/pretrained_selftest.json", "w") as f:
            json.dump(out, f, indent=1)
        print("wrote evidence/pretrained_selftest.json")
        return

    check_egress()

    out = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%S")}
    models = [m.strip() for m in args.models.split(",") if m.strip()]
    for m in models:
        if m == "esm":
            verify_esm(args.esm_name, out)
        elif m == "prot_t5":
            verify_prot_t5(out)
        elif m == "rnabert":
            verify_rnabert(out)
        else:
            raise SystemExit(f"unknown model {m!r}")

    os.makedirs("evidence", exist_ok=True)
    with open("evidence/pretrained_parity.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote evidence/pretrained_parity.json")
    gates = [v.get("gate_fp32_lt_1e-4") for v in out.values()
             if isinstance(v, dict) and "gate_fp32_lt_1e-4" in v]
    if gates and all(gates):
        print("ALL REAL-WEIGHT PARITY GATES PASS")
    elif gates:
        raise SystemExit("some real-weight parity gates FAILED — see JSON")


if __name__ == "__main__":
    main()
