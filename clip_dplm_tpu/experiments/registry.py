"""Experiment registry: config.experiment -> (model, data source).

One place that knows every model family the framework ships — the analog of
the reference's scattered entry points (tong/experiments/train.py,
run1/full.py main(), the two notebooks' drivers).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from clip_dplm_tpu.config import Config


def build_model(cfg: Config):
    name = cfg.experiment
    if name == "two_tower":
        from clip_dplm_tpu.models import TwoTowerCLIP

        return TwoTowerCLIP(cfg=cfg)
    if name == "rna_rbp":
        from clip_dplm_tpu.models.token_towers import RNARBPCLIP

        return RNARBPCLIP(cfg=cfg)
    if name == "esm_clip":
        from clip_dplm_tpu.models.protein_clip import ESMProteinCLIP

        return ESMProteinCLIP(cfg=cfg)
    if name == "tf_clip":
        from clip_dplm_tpu.models.tf_clip import TFContrastiveModel

        return TFContrastiveModel(cfg=cfg)
    if name == "triple_flow":
        from clip_dplm_tpu.models.triple_flow_model import TripleFlowModel

        return TripleFlowModel(cfg=cfg)
    if name == "dplm":
        from clip_dplm_tpu.models.dplm import DPLM

        return DPLM(cfg=cfg.dplm)
    raise ValueError(f"unknown experiment {name!r}")


def build_data(cfg: Config, split_seed: int = 0):
    """Returns (train_batches_fn, val_batches_fn): callables yielding fresh
    batch iterators. `dataset=synthetic` ships deterministic fixtures for
    every experiment; `dataset=embeddings` loads .npz pairs from cfg.data.path
    (the pickled-embedding path of run1/full.py:236-245)."""
    name = cfg.experiment
    d = cfg.data
    if name == "two_tower":
        from clip_dplm_tpu.data import PairedEmbeddingDataset

        if d.dataset == "embeddings" and d.path:
            z = np.load(d.path)
            ds = PairedEmbeddingDataset(
                a=z["a"].astype(np.float32), b=z["b"].astype(np.float32),
                labels=z.get("labels"),
                gaussian_noise=d.augment.gaussian_noise,
            )
        else:
            ds = PairedEmbeddingDataset.synthetic(
                2048, cfg.tower_a.input_dim, cfg.tower_b.input_dim,
                n_classes=8, seed=split_seed,
            )
        train, val = ds.split(0.85, seed=split_seed)
        B = cfg.train.batch_size

        def strip(b):
            return {k: v for k, v in b.items() if k != "labels"}

        return (
            lambda seed=0: (strip(b) for b in train.batches(B, seed=seed)),
            lambda: (strip(b) for b in val.batches(B, shuffle=False)),
        )
    if name == "rna_rbp":
        from clip_dplm_tpu.data.collate import TokenPairDataset

        ds = TokenPairDataset.synthetic(
            1024, dim_a=cfg.rna_tower.input_dim, dim_b=cfg.rbp_tower.input_dim,
            seed=split_seed,
        )
        cut = int(len(ds) * 0.85)
        train = TokenPairDataset(ds.seqs_a[:cut], ds.seqs_b[:cut])
        val = TokenPairDataset(ds.seqs_a[cut:], ds.seqs_b[cut:])
        B = cfg.train.batch_size
        pa, pb = 64, 128
        return (
            lambda seed=0: train.batches(B, seed=seed, pad_to_a=pa, pad_to_b=pb),
            lambda: val.batches(B, shuffle=False, pad_to_a=pa, pad_to_b=pb),
        )
    if name == "esm_clip":
        return _esm_clip_data(cfg, split_seed)
    if name == "tf_clip":
        return _tf_clip_data(cfg, split_seed)
    if name == "triple_flow":
        return _triple_flow_data(cfg, split_seed)
    if name == "dplm":
        return _dplm_data(cfg, split_seed)
    raise ValueError(f"unknown experiment {name!r}")


def _batch_iter(arrays: Dict[str, np.ndarray], batch_size: int, seed, shuffle=True):
    n = len(next(iter(arrays.values())))
    rng = np.random.default_rng(seed)
    order = rng.permutation(n) if shuffle else np.arange(n)
    for s in range(0, n - batch_size + 1, batch_size):
        sel = order[s : s + batch_size]
        yield {k: v[sel] for k, v in arrays.items()}


def _split(arrays: Dict[str, np.ndarray], frac: float = 0.85):
    n = len(next(iter(arrays.values())))
    cut = int(n * frac)
    return (
        {k: v[:cut] for k, v in arrays.items()},
        {k: v[cut:] for k, v in arrays.items()},
    )


def _esm_clip_data(cfg: Config, seed: int):
    """Synthetic RNA-token <-> protein-sequence pairs with class structure:
    each of n_classes proteins has a fixed residue sequence and an RNA token
    prototype, so the contrastive objective is learnable (the synthetic
    counterpart of the ATtRACT RNA<->RBP pairing, rna nb cells 5-22)."""
    from clip_dplm_tpu.models.dplm import CLS_IDX, EOS_IDX, PAD_IDX

    rng = np.random.default_rng(seed)
    n, n_classes = 1024, 32
    S_rna, S_prot = 32, min(64, cfg.esm.max_len)
    rna_dim = cfg.rna_tower.input_dim
    prot_class = np.full((n_classes, S_prot), PAD_IDX, np.int32)
    lens = rng.integers(S_prot // 2, S_prot - 2, n_classes)
    for c in range(n_classes):
        prot_class[c, 0] = CLS_IDX
        prot_class[c, 1 : 1 + lens[c]] = rng.integers(4, 24, lens[c])
        prot_class[c, 1 + lens[c]] = EOS_IDX
    rna_proto = rng.normal(size=(n_classes, S_rna, rna_dim)).astype(np.float32)
    labels = rng.integers(0, n_classes, n)
    arrays = {
        "rna_tokens": (rna_proto[labels]
                       + 0.3 * rng.normal(size=(n, S_rna, rna_dim))).astype(np.float32),
        "rna_mask": np.ones((n, S_rna), bool),
        "protein_tokens": prot_class[labels],
    }
    arrays["protein_mask"] = arrays["protein_tokens"] != PAD_IDX
    train, val = _split(arrays)
    B = cfg.train.batch_size
    return (
        lambda seed=0: _batch_iter(train, B, seed),
        lambda: _batch_iter(val, B, 0, shuffle=False),
    )


def _tf_clip_data(cfg: Config, seed: int):
    """Synthetic 3-way TF data: cell state / top-DEG perturbation tokens /
    TF protein embedding share a latent (tf nb cells 29+41 shapes); the
    per-batch dense connectivity is the kNN graph of the batch's cells."""
    enc = cfg.encoders
    rng = np.random.default_rng(seed)
    n, k, T = 1024, 16, enc.n_perturb_genes
    z = rng.normal(size=(n, k)).astype(np.float32)
    w_cell = rng.normal(size=(k, enc.gene_dim + 1)).astype(np.float32) / np.sqrt(k)
    w_esm = rng.normal(size=(k, T * enc.esm_dim)).astype(np.float32) / np.sqrt(k)
    w_prot = rng.normal(size=(k, enc.esm_dim)).astype(np.float32) / np.sqrt(k)
    noise = lambda *s: 0.1 * rng.normal(size=s).astype(np.float32)
    arrays = {
        "cell_state": z @ w_cell + noise(n, enc.gene_dim + 1),
        "gene_esm": (z @ w_esm).reshape(n, T, enc.esm_dim) + noise(n, T, enc.esm_dim),
        "gene_values": rng.uniform(-1, 1, (n, T)).astype(np.float32),
        "protein_emb": z @ w_prot + noise(n, enc.esm_dim),
    }
    train, val = _split(arrays)
    B = cfg.train.batch_size

    def with_connectivity(it):
        for b in it:
            x = b["cell_state"]
            d2 = ((x[:, None] - x[None, :]) ** 2).sum(-1)
            kth = np.partition(d2, min(8, len(x) - 1), axis=1)[:, min(8, len(x) - 1)]
            conn = (d2 <= kth[:, None]).astype(np.float32)
            np.fill_diagonal(conn, 0.0)
            b["connectivity"] = np.maximum(conn, conn.T)
            yield b

    return (
        lambda seed=0: with_connectivity(_batch_iter(train, B, seed)),
        lambda: with_connectivity(_batch_iter(val, B, 0, shuffle=False)),
    )


def _triple_flow_data(cfg: Config, seed: int):
    """Synthetic cells through the real host pipeline: CellData -> trajectory
    info (kNN/diffmap/DPT) -> TripleFlowDataset subgraph batches with
    augmentation (the tong/utils/data.py path, SURVEY.md section 2.5)."""
    from clip_dplm_tpu.data.cells import CellData
    from clip_dplm_tpu.data.multimodal import (
        DataAugmentation, TripleFlowDataset, get_dataloader,
    )

    enc = cfg.encoders
    rng = np.random.default_rng(seed)
    n = 1024
    cells = CellData.synthetic(n_cells=n, n_genes=enc.gene_dim, seed=seed)
    gene_to_esm = {
        g: rng.normal(size=enc.esm_dim).astype(np.float32)
        for g in range(enc.gene_dim)
    }
    prot = rng.normal(size=(n, enc.esm_dim)).astype(np.float32)
    cut = int(n * 0.85)
    mk = lambda ids: TripleFlowDataset(
        CellData(
            X=cells.X[ids],
            obs={k: v[ids] for k, v in cells.obs.items()},
            layers={k: v[ids] for k, v in cells.layers.items()},
        ),
        gene_to_esm=gene_to_esm,
        protein_embeddings=prot[ids],
        n_top_degs=enc.n_perturb_genes,
    )
    train_ds, val_ds = mk(np.arange(cut)), mk(np.arange(cut, n))
    aug = DataAugmentation(cfg.data.augment, seed=seed)
    B = cfg.train.batch_size
    return (
        lambda seed=0: get_dataloader(train_ds, B, augment=aug, seed=seed),
        lambda: get_dataloader(val_ds, B, shuffle=False),
    )


def _dplm_data(cfg: Config, seed: int):
    """Synthetic protein corpora for the diffusion denoiser: motif-tiled
    residue sequences (learnable local structure) with cls/eos framing and
    pad masks."""
    from clip_dplm_tpu.models.dplm import CLS_IDX, EOS_IDX, PAD_IDX

    rng = np.random.default_rng(seed)
    n = 1024
    S = min(64, cfg.dplm.max_len)
    n_motifs, motif_len = 24, 8
    motifs = rng.integers(4, 24, (n_motifs, motif_len))
    tokens = np.full((n, S), PAD_IDX, np.int32)
    lens = rng.integers(S // 2, S - 2, n)
    for i in range(n):
        seq = np.tile(motifs[rng.integers(n_motifs)], S // motif_len + 1)[: lens[i]]
        tokens[i, 0] = CLS_IDX
        tokens[i, 1 : 1 + lens[i]] = seq
        tokens[i, 1 + lens[i]] = EOS_IDX
    arrays = {"tokens": tokens, "mask": tokens != PAD_IDX}
    train, val = _split(arrays)
    B = cfg.train.batch_size
    return (
        lambda seed=0: _batch_iter(train, B, seed),
        lambda: _batch_iter(val, B, 0, shuffle=False),
    )
