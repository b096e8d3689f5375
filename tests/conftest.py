"""Test config: force a CPU backend with 8 virtual devices.

Runs the whole suite without TPU hardware while still exercising the
multi-device mesh/sharding paths (SURVEY.md §4.4).  Must run before the
first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Parity tests compare fp32 numerics against torch CPU; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")
