"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware
(jax --xla_force_host_platform_device_count, see SURVEY.md §4).

Note: the environment's axon TPU plugin overrides JAX_PLATFORMS, so the
backend must be pinned via jax.config.update after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# BOTH pins are required: the config update fixes the default backend, but
# only the env var stops jax.backends() from eagerly INITIALIZING the axon
# TPU plugin — that init opens the TPU tunnel and blocks forever if any
# other process (a bench run) holds it.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def tmp_index_dir(tmp_path):
    return tmp_path / "index"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
