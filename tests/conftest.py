"""Test configuration: force a CPU backend with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware (the same
trick the driver uses for dryrun_multichip)."""

import os

# Hard override: the ambient environment may point JAX at a remote TPU
# (JAX_PLATFORMS=axon) and a sitecustomize may have imported jax already,
# so setting the env var alone is not enough — update the live config too.
# Unit tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: most test wall-time is XLA compiles of the
# modexp kernels; cache them across runs so repeat suites are fast.
# Scope it to the EXPENSIVE compiles only (>= 2 s, >= 64 KiB): r4's full
# suite segfaulted inside the cache writer (put_executable_and_time ->
# zstandard) with min_entry_size 0, which maximized write exposure by
# persisting thousands of trivial entries (VERDICT r4 weak #8).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 64 * 1024)

import random

import pytest


@pytest.fixture(scope="session")
def rng():
    return random.Random(0xC0FFEE)


@pytest.fixture(scope="session")
def keypair_128(rng):
    from paillier_tpu.core.keygen import keygen
    return keygen(128, rng)


@pytest.fixture(scope="session")
def keypair_256(rng):
    from paillier_tpu.core.keygen import keygen
    return keygen(256, rng)
