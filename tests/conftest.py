"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initialises its backends, hence the
module-level assignments (conftest is imported before any test module).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU runs deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's sitecustomize imports jax (registering the TPU plugin)
# before conftest runs, so the env vars above can be too late — force the
# config directly as well. Must happen before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
