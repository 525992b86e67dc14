"""Test config: force an 8-device virtual CPU platform.

The environment registers an `axon` TPU backend via sitecustomize and pins
JAX_PLATFORMS=axon, so the env var alone is not enough — we must override the
jax config after import. Multi-chip sharding is validated on this virtual
mesh (the driver separately dry-runs `__graft_entry__.dryrun_multichip`); the
real-TPU path is exercised by bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
