import numpy as np
import pytest

from clip_dplm_tpu.utils.system import (
    DataValidationError,
    get_memory_status,
    validate_data,
)


def test_memory_status_runs():
    out = get_memory_status()
    assert isinstance(out, dict)


def test_validate_data_clean(rng):
    stats = validate_data(rng.normal(size=(50, 10)).astype(np.float32))
    assert stats["missing_fraction"] == 0.0


def test_validate_data_nan():
    x = np.ones((10, 4), np.float32)
    x[0, 0] = np.nan
    with pytest.raises(DataValidationError, match="non-finite"):
        validate_data(x)
    stats = validate_data(x, max_missing_fraction=0.1)
    assert stats["missing_fraction"] > 0


def test_validate_data_range():
    x = np.full((5, 2), 10.0, np.float32)
    with pytest.raises(DataValidationError, match="max"):
        validate_data(x, max_value=5.0)
