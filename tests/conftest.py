"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference framework has no multi-device tests at all; here every test run
exercises the sharding paths on 8 virtual CPU devices (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

# Force CPU even when the session pre-sets a TPU platform (e.g. the axon TPU
# tunnel, whose sitecustomize sets jax_platforms directly): tests validate
# numerics and sharding on an 8-device virtual CPU mesh; bench.py uses the
# real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
