"""Test config: run everything on CPU with a virtual 8-device mesh.

This is the standard way to test pjit/shard_map sharding without a real TPU
slice (SURVEY.md §4).  The container's sitecustomize imports jax and pins
JAX_PLATFORMS=axon before pytest starts, so plain env vars are too late —
override through jax.config instead (backends initialize lazily, so this
takes effect as long as no computation ran yet).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def tmp_collection_path(tmp_path):
    return str(tmp_path / "test_collection.dat")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
