"""ctypes bindings for the native tokenizer/collator (tokenizer.cpp).

Compiled lazily with g++ -O3 into the package directory; all callers must
handle `available() == False` (no compiler) by falling back to
data/protein.py / data/collate.py — the numerical contract is identical and
covered by parity tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tokenizer.cpp")
_LIB = os.path.join(_DIR, "_tokenizer.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build(force: bool = False) -> bool:
    """Compile tokenizer.cpp -> _tokenizer.so. Returns success."""
    global _build_failed
    if os.path.exists(_LIB) and not force:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        _build_failed = True
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) and not build():
            return None
        lib = ctypes.CDLL(_LIB)
        lib.tokenize_batch.restype = ctypes.c_int32
        lib.tokenize_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
        ]
        lib.pad_embedding_batch.restype = None
        lib.pad_embedding_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def tokenize_batch_native(
    seqs: Sequence[str],
    max_len: Optional[int] = None,
    pad_multiple: int = 8,
    replace_uzob: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native equivalent of data.protein.tokenize_batch (same contract)."""
    lib = _load()
    if lib is None:
        from clip_dplm_tpu.data.protein import tokenize_batch

        return tokenize_batch(seqs, max_len, pad_multiple, replace_uzob)

    blob = "".join(seqs).encode("ascii", errors="replace")
    offsets = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    B = len(seqs)
    cap = max_len if max_len is not None else max(len(s) for s in seqs) + 2
    padded_cap = ((cap + pad_multiple - 1) // pad_multiple) * pad_multiple
    ids = np.empty((B, padded_cap), np.int32)
    mask = np.empty((B, padded_cap), np.uint8)
    used = lib.tokenize_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, cap, pad_multiple, int(replace_uzob),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        padded_cap,
    )
    return ids[:, :used], mask[:, :used].astype(bool)


def pad_embedding_batch_native(
    seqs: Sequence[np.ndarray], max_len: Optional[int] = None,
    pad_multiple: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native equivalent of data.collate.pad_token_batch (same contract)."""
    lib = _load()
    if lib is None:
        from clip_dplm_tpu.data.collate import pad_token_batch

        return pad_token_batch(seqs, max_len, pad_multiple)

    B = len(seqs)
    dim = seqs[0].shape[1]
    L = max(s.shape[0] for s in seqs)
    if max_len is not None:
        L = min(L, max_len)
    S = ((L + pad_multiple - 1) // pad_multiple) * pad_multiple
    src = np.ascontiguousarray(
        np.concatenate([s[:S].astype(np.float32, copy=False) for s in seqs])
    )
    offsets = np.zeros(B + 1, np.int64)
    np.cumsum([min(s.shape[0], S) for s in seqs], out=offsets[1:])
    out = np.empty((B, S, dim), np.float32)
    mask = np.empty((B, S), np.uint8)
    lib.pad_embedding_batch(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, dim, S,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, mask.astype(bool)
