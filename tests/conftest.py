"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends, so this executes at
conftest import time (pytest loads conftest before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# CLIs enable the persistent compilation cache on entry; keep test-run
# cache writes inside the repo (and shared across test processes)
os.environ.setdefault("ISI_JAX_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon site hook can force the TPU platform regardless of env vars;
# the config update below always wins
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20200117)
