"""Test config: force a CPU backend with 8 virtual devices.

Runs the whole suite without TPU hardware while still exercising the
multi-device mesh/sharding paths (SURVEY.md §4.4).

NOTE: pytest plugins (jaxtyping) import jax before this conftest runs, so
setting ``JAX_PLATFORMS`` in os.environ here is too late — the env default
was already captured at import.  ``jax.config.update`` works as long as no
backend has been initialised yet, which is the case at collection time.
``XLA_FLAGS`` is still read lazily at backend creation, so the fake-device
flag can go through the environment.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare fp32 numerics against torch CPU; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.devices()[0].platform}")
    assert len(jax.devices()) == 8
