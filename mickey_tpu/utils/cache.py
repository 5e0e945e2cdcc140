"""Persistent XLA compilation cache setup.

Full-pipeline compiles take minutes (and the tunneled remote-compile service
is flaky under load); caching serialized executables across processes makes
every run after the first start in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "MICKEY_JAX_CACHE", os.path.expanduser("~/.cache/mickey_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
