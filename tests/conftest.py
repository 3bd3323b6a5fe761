"""Test harness setup.

Tests run on an emulated 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4). Env vars must be set before JAX
initializes, hence this happens at conftest import time.
"""

import os

# Force CPU regardless of the ambient platform. The dev box registers a TPU
# PJRT plugin via sitecustomize and pins jax_platforms at import time, so a
# plain env var is not enough — override the jax config directly (the backend
# is not yet initialized at conftest import time).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU tests deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compile cache: backbone contract tests are dominated by
# model compiles (swin nano alone ~65 s cold); caching makes repeat suite
# runs substantially faster. Safe across processes (content-addressed).
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 emulated devices, got {len(devs)}"
    return devs[:8]
