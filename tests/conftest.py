"""Test harness: CPU backend with 8 virtual devices (SURVEY.md §4).

Multi-device semantics (sharded step == unsharded step) are validated on a
virtual CPU mesh; real-TPU runs happen in bench.py / the driver. Must set
the flags before jax initializes, hence this conftest.
"""

import os

# NOTE: this image's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS, so env vars alone are not enough — the config
# update below (after import) is what actually pins tests to CPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
