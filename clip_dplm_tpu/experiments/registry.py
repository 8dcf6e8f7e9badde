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
    raise ValueError(
        f"no data source wired for experiment {name!r}; "
        "use the library API (see tests/) for this model family"
    )
