"""Test environment: force CPU backend with 8 virtual devices so sharding /
collective tests run without TPU hardware, and keep goldens deterministic."""

import os

# set env first (effective when jax has not been imported yet); REPLACE any
# pre-existing device-count flag — tests require exactly 8 virtual devices
# (CLAUDE.md: "conftest forces the cpu backend + 8 virtual devices
# regardless"), so an inherited '=1' must not win
import re

flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# this image's sitecustomize imports jax at interpreter start (before
# pytest/conftest) to register the axon TPU backend, so the env var alone is
# too late — force the platform through the live config as well
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream, so
    # results never depend on test execution order or selection
    return np.random.default_rng(3008)
