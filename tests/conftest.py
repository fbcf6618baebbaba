"""Test configuration: force an 8-device virtual-CPU mesh.

The environment may pre-import jax (e.g. a sitecustomize that registers a
remote-TPU PJRT plugin), so env vars alone are not enough; we also flip
``jax_platforms`` before any backend is instantiated. Tests then exercise
sharding on 8 virtual CPU devices; real-TPU kernel paths are covered by
bench.py and ``benchmarks/``.
"""

import os

# Effective when this conftest runs before jax is imported...
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# ...and this path handles jax having been imported already (backends are
# created lazily, so the platform override still applies).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def devices():
  return jax.devices()
