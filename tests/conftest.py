"""Test harness configuration.

All tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(pjit over a Mesh) is exercised without TPU hardware.  This must happen
before jax is imported anywhere.
"""

import os

# QAIG_TEST_TPU=1 opts out of the CPU pin so the TPU-gated kernel tests
# (tests/test_decode_attention_kernel.py etc.) can run on real hardware:
#   QAIG_TEST_TPU=1 python -m pytest tests/test_decode_attention_kernel.py
_USE_TPU = os.environ.get("QAIG_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize force-updates jax_platforms to "axon,cpu" in every
# process; pin it back to cpu for the test suite (must happen before any
# backend is initialized).
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
