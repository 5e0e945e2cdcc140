"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding correctness is validated
on XLA's host-platform virtual devices, which exercise the same partitioner
and collectives as real ICI meshes.
"""

import os

# The session environment pins the platform to axon (the tunneled TPU) via a
# sitecustomize that calls jax.config.update("jax_platforms", "axon,cpu"),
# which overrides the env var. Unit tests must run on virtual CPU devices, so
# override the *config* unless the user explicitly requests TPU tests via
# MICKEY_TEST_TPU=1.
_FORCE_CPU = not os.environ.get("MICKEY_TEST_TPU")
if _FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# never attempt the DINOv2 weight download inside tests (zero-egress CI)
os.environ.setdefault("MICKEY_NO_DOWNLOAD", "1")

import jax  # noqa: E402

if _FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
