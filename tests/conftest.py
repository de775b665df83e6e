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

# Persistent compilation cache: the e2e tests build several structurally
# identical pjit programs (every fit() re-jits its own closures); the disk
# cache collapses those to one compile within a run and across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/dino_pose_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
