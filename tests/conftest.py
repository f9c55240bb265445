"""Test session config.

Mirrors the reference's backend-matrix strategy (reference:
src/pyxu_tests/conftest.py:15-84): tests run on a **virtual 8-device CPU
mesh** so sharding/collective code paths are exercised without TPU hardware,
exactly as SURVEY §4 prescribes.  FP64 is enabled so double-precision
conformance legs run alongside FP32.

NOTE: the hosted environment force-registers a TPU PJRT plugin at interpreter
startup (JAX_PLATFORMS=axon), so plain env vars are too late here —
``jax.config.update`` wins regardless of import order.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(params=[np.float32, np.float64], ids=["f32", "f64"])
def fdtype(request):
    return np.dtype(request.param)


def atol_for(dtype) -> float:
    """Width-aware tolerance (reference: src/pyxu_tests/conftest.py:44-54)."""
    return {4: 2e-4, 8: 1e-8}[np.dtype(dtype).itemsize]


@pytest.fixture
def rng():
    return np.random.default_rng(17)
