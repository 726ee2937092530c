"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers a TPU PJRT plugin at interpreter
startup (before conftest runs) and force-selects it via jax config, so env
vars alone cannot redirect tests to CPU.  Instead we import jax here —
before any test module — and override the platform + CPU device count
through jax.config (both take effect because backends initialize lazily).
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA flag above handles it

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
