"""Test configuration: force the CPU backend with a virtual 8-device mesh.

On this host, jax is pre-imported at interpreter startup by the TPU init hook,
so env vars set here are too late; ``jax.config.update`` before first backend
use still works (and XLA_FLAGS is read lazily at client creation).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()
# Interpreter-mode kernel tests assert exact-f32 parity vs the numpy oracle;
# pin the MXU strategy to 6-pass HIGHEST there (the default bf16x3 fast path
# gets its own error-bound test in a subprocess: test_pallas.py).
os.environ.setdefault("WTT_MXU_PRECISION", "highest")

import jax  # noqa: E402  (already imported by the host hook; harmless)

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
