"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the standard
JAX fake-backend trick)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
# persistent compile cache makes repeat suite runs much faster; keyed by
# machine features so a cache written on one host class never feeds
# AOT-mismatched executables (SIGILL risk) to another
from nvorbis_tpu.utils.jaxinit import machine_cache_dir  # jax-free import

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      machine_cache_dir("/root/repo/.jax_cache"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The TPU plugin in this image registers itself from sitecustomize and
# force-selects its platform via jax.config.update("jax_platforms", ...),
# which overrides the env vars above.  Pin the config value itself so the
# suite always runs on the 8-virtual-device CPU backend and never touches
# (or blocks on) the remote TPU link.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

FIXTURES = pathlib.Path("/root/reference/TestFiles")


@pytest.fixture(scope="session")
def fixture_dir():
    return FIXTURES


def fixture_path(name: str) -> str:
    return str(FIXTURES / name)
