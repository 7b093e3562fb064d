"""Test configuration: force an 8-virtual-device CPU platform.

Tests must run without TPU hardware; multi-chip sharding tests use 8 virtual
CPU devices (the driver validates the real multi-chip path separately via
__graft_entry__.dryrun_multichip).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The environment's sitecustomize registers the axon TPU PJRT plugin and
# overrides jax_platforms via jax.config (so plain env vars lose). Force it
# back to CPU before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
