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


def verify_esm(name: str, out: dict) -> None:
    import jax.numpy as jnp
    import torch
    from transformers import EsmModel

    from clip_dplm_tpu.data import protein
    from clip_dplm_tpu.models.esm import (
        ESMTower, convert_esm_torch_params, esm_config_from_name,
    )

    hf_id = {
        "esm2_t6_8M": "facebook/esm2_t6_8M_UR50D",
        "esm2_t12_35M": "facebook/esm2_t12_35M_UR50D",
        "esm2_t30_150M": "facebook/esm2_t30_150M_UR50D",
        "esm2_t33_650M": "facebook/esm2_t33_650M_UR50D",
    }[name]
    print(f"[esm] downloading {hf_id} ...", flush=True)
    hf = EsmModel.from_pretrained(hf_id, add_pooling_layer=False)
    hf.eval()
    cfg = esm_config_from_name(name, layer_norm_eps=hf.config.layer_norm_eps)
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


def verify_prot_t5(out: dict) -> None:
    import jax.numpy as jnp
    import torch
    from transformers import T5EncoderModel

    from clip_dplm_tpu.data import protein
    from clip_dplm_tpu.models.t5 import (
        ProtT5Tower, convert_t5_torch_params, prot_t5_config_from_name,
    )

    hf_id = "Rostlab/prot_t5_xl_half_uniref50-enc"
    print(f"[prot_t5] downloading {hf_id} (~5.5 GB) ...", flush=True)
    hf = T5EncoderModel.from_pretrained(hf_id, torch_dtype=torch.float32)
    hf.eval()
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


def verify_rnabert(out: dict) -> None:
    import jax.numpy as jnp
    import torch

    from clip_dplm_tpu.models.rnabert import (
        RNABertConfig, RNABertTower, convert_bert_torch_params,
        tokenize_rna_batch,
    )

    # RNABERT's published weights live in the multimolecule hub org; the
    # checkpoint is a BERT state_dict at d=120/L=6/H=12
    hf_id = "multimolecule/rnabert"
    print(f"[rnabert] downloading {hf_id} ...", flush=True)
    try:
        from transformers import AutoModel

        hf = AutoModel.from_pretrained(hf_id, trust_remote_code=True)
    except Exception as e:  # model card needs the multimolecule package
        out["rnabert"] = {"hf_id": hf_id, "error": str(e)}
        print(f"[rnabert] SKIPPED: {e}\n"
              "  (pip install multimolecule, or export the original "
              "RNABERT torch checkpoint and pass it through "
              "convert_bert_torch_params manually)")
        return
    hf.eval()
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", default="esm,prot_t5,rnabert",
                    help="comma list of esm,prot_t5,rnabert")
    ap.add_argument("--esm-name", default="esm2_t6_8M",
                    help="ESM-2 family member to verify "
                         "(esm2_t6_8M|esm2_t12_35M|esm2_t30_150M|esm2_t33_650M)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    check_egress()

    out: dict = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%S")}
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
