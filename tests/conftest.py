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

# Build the native IO library if absent so tests/test_native_io.py (and the
# native reader fast path) run by default instead of silently skipping.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "native", "libgdbn_io.so")
if not os.path.exists(_SO):
    import subprocess

    try:
        subprocess.run(
            ["sh", os.path.join(_REPO, "native", "build.sh")],
            check=True, capture_output=True, timeout=120,
        )
    except Exception as e:  # toolchain absent: the skipif marker handles it
        print(f"[conftest] native build failed ({e}); native tests will skip")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
