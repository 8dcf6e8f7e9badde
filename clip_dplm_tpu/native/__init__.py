"""Native (C++) host-side runtime components, bound via ctypes.

Build on first use with the system g++ (no pybind11 in this image):
`clip_dplm_tpu.native.build()` or automatically on import of the bindings.
Falls back to the pure-python implementations when a compiler is missing.
"""

from clip_dplm_tpu.native.bindings import (  # noqa: F401
    available,
    build,
    tokenize_batch_native,
    pad_embedding_batch_native,
)
