"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``); the env vars must be set
before jax is first imported, which conftest guarantees for pytest runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
