"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed)."""
import os

# Force cpu for unit tests: the outer environment points JAX at the axon
# TPU tunnel (JAX_PLATFORMS=axon + remote compiles, minutes-slow), and the
# axon sitecustomize imports jax at interpreter startup — so env vars set
# here are too late; jax.config.update is the only effective override.
# Unit tests validate semantics on a virtual 8-device CPU mesh (the driver
# separately compile-checks the TPU path via __graft_entry__).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Compiles are relayed to a remote service here (PALLAS_AXON_REMOTE_COMPILE)
# and can take minutes cold; persist compiled executables across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
