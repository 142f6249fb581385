"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the standard
JAX fake-backend trick)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# this jax build (axon plugin) ignores JAX_PLATFORMS; PLATFORM_NAME works
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
# persistent compile cache makes repeat suite runs much faster
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

FIXTURES = pathlib.Path("/root/reference/TestFiles")


@pytest.fixture(scope="session")
def fixture_dir():
    return FIXTURES


def fixture_path(name: str) -> str:
    return str(FIXTURES / name)
