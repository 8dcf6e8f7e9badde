import dataclasses

from clip_dplm_tpu.config import (
    Config,
    apply_overrides,
    create_experiment_configs,
    from_dict,
    load_config,
    save_config,
    to_dict,
)


def test_yaml_roundtrip(tmp_path):
    cfg = Config()
    path = tmp_path / "cfg.yaml"
    save_config(cfg, str(path))
    loaded = load_config(str(path))
    assert loaded == cfg


def test_overrides():
    cfg = Config()
    cfg2 = apply_overrides(
        cfg,
        [
            "train.optim.learning_rate=1e-4",
            "train.batch_size=64",
            "projection.kind=base",
            "precision.remat=true",
            "icnn.hidden_dims=[256, 128]",
        ],
    )
    assert cfg2.train.optim.learning_rate == 1e-4
    assert cfg2.train.batch_size == 64
    assert cfg2.projection.kind == "base"
    assert cfg2.precision.remat is True
    assert cfg2.icnn.hidden_dims == (256, 128)
    # original untouched (frozen dataclasses)
    assert cfg.train.batch_size == 128


def test_dict_roundtrip():
    cfg = Config()
    d = to_dict(cfg)
    assert from_dict(Config, d) == cfg


def test_sweeps():
    base = Config()
    for sweep, expected in [
        ("embedding_sweep", 5),
        ("architecture_search", 4),
        ("training_sweep", 7),
        ("temperature_sweep", 4),
    ]:
        variants = create_experiment_configs(base, sweep)
        assert len(variants) == expected
        for name, cfg in variants:
            assert isinstance(cfg, Config)
            assert name


def test_frozen():
    cfg = Config()
    try:
        cfg.train = None  # type: ignore[misc]
        raise AssertionError("config should be frozen")
    except dataclasses.FrozenInstanceError:
        pass
