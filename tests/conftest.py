"""Test configuration: force an 8-virtual-device CPU mesh.

This is the standard JAX answer to testing multi-chip sharding without a
pod (SURVEY.md §4): every sharding/collective test runs against a real
8-device mesh, just on host CPU.

IMPORTANT environment quirk: this machine's sitecustomize registers the
axon TPU PJRT plugin and imports jax at interpreter startup with
JAX_PLATFORMS=axon, so setting the env var here is too late — and leaving
the platform on axon makes even tiny ops block for minutes on the TPU
tunnel.  ``jax.config.update("jax_platforms", "cpu")`` overrides the
already-read env and is the only reliable way to pin tests to CPU.
XLA_FLAGS is still read lazily at first CPU-backend init, so the
device-count flag below works from here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any late spawned subprocess

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeated pytest runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
