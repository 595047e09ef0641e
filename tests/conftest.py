"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so sharding/mesh tests exercise
real multi-device SPMD partitioning without TPU hardware (the driver
separately dry-runs the multi-chip path; bench.py runs on the real chip).
Environment must be set before jax is imported anywhere.
"""

import os

# Force CPU even if the session environment points JAX at real TPU hardware
# (e.g. JAX_PLATFORMS=axon): unit tests must not contend for the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The session's axon sitecustomize registers the TPU backend and overrides
# jax_platforms in config, so the env var alone does not stick — force it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Persistent compilation cache: the parametrized matrix compiles hundreds of
# small executables; caching makes re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def synthetic_image(width: int, height: int) -> np.ndarray:
    """The reference's synthetic fixture: pixel = (x*y) as u8 (lib.rs:36-43)."""
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    return ((y[:, None] * x[None, :]) & 0xFF).astype(np.uint8)


@pytest.fixture
def lena() -> np.ndarray:
    from rustyhgi_tpu.utils.imageio import load_luma

    path = "/root/reference/res/LENA.TIF"
    if not os.path.exists(path):
        pytest.skip("LENA.TIF fixture not available")
    return load_luma(path)
