"""Sweep CLI: --parallel spreads variants over the mesh devices and yields
the same per-variant results as the serial path (same seeds, same math)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two short sweep trainings


def _run(parallel: bool, tmp_path, tag: str):
    from clip_dplm_tpu.experiments.sweep import main

    argv = [
        "--sweep", "temperature_sweep",
        "--epochs", "1",
        "-o", "experiment=two_tower",
        "-o", "train.batch_size=32",
        "-o", "train.num_epochs=1",
        "-o", "tower_a.input_dim=24",
        "-o", "tower_a.hidden_size=32",
        "-o", "tower_a.num_hidden_layers=1",
        "-o", "tower_b.input_dim=20",
        "-o", "tower_b.hidden_size=32",
        "-o", "tower_b.num_hidden_layers=1",
        "-o", "projection.dim=16",
        "-o", f"logging.log_dir={tmp_path}/{tag}",
    ]
    if parallel:
        argv.append("--parallel")
    return main(argv)


def test_parallel_sweep_matches_serial(tmp_path):
    import jax

    assert len(jax.devices()) > 1  # the conftest 8-device CPU mesh
    serial = _run(False, tmp_path, "serial")
    parallel = _run(True, tmp_path, "parallel")
    assert set(serial) == set(parallel) and len(serial) == 4
    for name in serial:
        np.testing.assert_allclose(
            parallel[name]["final_train_loss"],
            serial[name]["final_train_loss"],
            rtol=1e-4, err_msg=name,
        )
