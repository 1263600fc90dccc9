"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU analogue of a fake backend — sharding/collective code paths
compile and execute against 8 XLA host devices (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins "axon"
# Persistent compile cache makes repeated pytest runs cheap on 1 CPU core.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# With the TPU plugin registered, the default matmul/conv precision emulates
# bf16 even on the CPU backend; numeric tests compare against fp32 references.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
