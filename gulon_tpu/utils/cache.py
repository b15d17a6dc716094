"""Persistent XLA compilation cache.

Compiles through the remote-TPU tunnel in this environment cost seconds to
minutes per program; the on-disk cache cuts warm-start build+query setup by
~4x (measured 35.7s -> 9.7s for a train+encode pipeline). Call once before
heavy jit use; safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None) -> str:
    import jax

    if directory is None:
        directory = os.environ.get(
            "GULON_TPU_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
        )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return directory
