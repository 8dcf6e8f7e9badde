"""Test config: force an 8-device virtual CPU mesh so collective code paths
(the global-batch all-gather InfoNCE, pjit shardings) are exercised without
TPU hardware. Must run before jax initializes its backends."""

import os

# The outer environment may pin JAX_PLATFORMS to the real TPU ('axon');
# tests always run on a virtual 8-device CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already have been imported by a pytest plugin before this conftest
# ran, in which case the env var was read too early — force via config too
# (safe as long as no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# The suite is compile-bound (every test jits fresh programs on the 8-device
# mesh); a persistent compilation cache makes warm reruns ~2x faster. Keyed
# by HLO hash, so code changes miss safely; >1s compiles only, to bound disk.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from clip_dplm_tpu.parallel import create_mesh

    assert len(jax.devices()) == 8, jax.devices()
    return create_mesh()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
