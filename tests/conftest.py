"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding paths are validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``). The XLA flag must be set
before jax initializes its backends. The TPU-tunnel sitecustomize can
pre-register an ``axon`` backend at interpreter start and force the platform
selection, so the env var alone is not enough — ``jax.config.update`` after
import overrides it reliably.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache for the suite: the fast lane's wall clock
# is dominated by hundreds of small CPU jit compiles; caching them makes
# repeat runs (the pre-commit case) several times faster. The cache dir
# is platform-keyed, so sharing .jax_cache with tunnel-TPU programs is
# safe. Threshold 0 — even 0.1 s compiles add up across ~350 tests.
from gulon_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
