"""Test configuration: CPU backend with a virtual 8-device mesh, f64 physics.

Multi-chip sharding is validated on a host-platform virtual device mesh (the
analog of the reference's nprocs=2 CI runs, Examples/CMakeLists.txt:22).
NOTE: the env var JAX_PLATFORMS is ignored when an experimental TPU plugin is
present; jax.config.update('jax_platforms', ...) is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402,F401

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
