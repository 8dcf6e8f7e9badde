"""Native C++ tokenizer/collator parity + the device prefetcher."""

import numpy as np
import pytest

from clip_dplm_tpu.data import protein
from clip_dplm_tpu.data.collate import pad_token_batch
from clip_dplm_tpu.native import (
    available,
    pad_embedding_batch_native,
    tokenize_batch_native,
)

needs_native = pytest.mark.skipif(not available(), reason="no C++ compiler")


@needs_native
def test_tokenize_parity_with_python(rng):
    seqs = [protein.random_protein(rng, int(rng.integers(5, 40))) for _ in range(16)]
    seqs.append("lagv UZOB .-x")  # lowercase + spaces + specials
    ids_py, mask_py = protein.tokenize_batch(seqs, pad_multiple=8)
    ids_c, mask_c = tokenize_batch_native(seqs, pad_multiple=8)
    np.testing.assert_array_equal(ids_c, ids_py)
    np.testing.assert_array_equal(mask_c, mask_py)


@needs_native
def test_tokenize_parity_uzob_and_truncation(rng):
    seqs = ["LUZOBX" * 10, "LA"]
    ids_py, mask_py = protein.tokenize_batch(
        seqs, max_len=16, pad_multiple=8, replace_uzob=True
    )
    ids_c, mask_c = tokenize_batch_native(
        seqs, max_len=16, pad_multiple=8, replace_uzob=True
    )
    np.testing.assert_array_equal(ids_c, ids_py)
    np.testing.assert_array_equal(mask_c, mask_py)


@needs_native
def test_pad_embedding_parity(rng):
    seqs = [rng.normal(size=(int(rng.integers(3, 20)), 12)).astype(np.float32)
            for _ in range(8)]
    out_py, mask_py = pad_token_batch(seqs, pad_multiple=8)
    out_c, mask_c = pad_embedding_batch_native(seqs, pad_multiple=8)
    np.testing.assert_array_equal(mask_c, mask_py)
    np.testing.assert_allclose(out_c, out_py)


@needs_native
def test_native_faster_than_python(rng):
    """Sanity: the native path should beat the python loop on a big batch."""
    import time

    seqs = [protein.random_protein(rng, 500) for _ in range(512)]
    t0 = time.perf_counter()
    protein.tokenize_batch(seqs)
    t_py = time.perf_counter() - t0
    tokenize_batch_native(seqs)  # warm (lib load)
    t0 = time.perf_counter()
    tokenize_batch_native(seqs)
    t_c = time.perf_counter() - t0
    assert t_c < t_py, (t_c, t_py)


def test_prefetcher_yields_all_batches(rng):
    from clip_dplm_tpu.data.prefetch import prefetch_to_device

    batches = [{"x": rng.normal(size=(4, 8)).astype(np.float32)} for _ in range(5)]
    got = list(prefetch_to_device(iter(batches), depth=2))
    assert len(got) == 5
    for orig, dev in zip(batches, got):
        np.testing.assert_allclose(np.asarray(dev["x"]), orig["x"])


def test_prefetcher_propagates_errors():
    from clip_dplm_tpu.data.prefetch import prefetch_to_device

    def gen():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        for _ in it:
            pass
