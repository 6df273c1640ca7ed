"""Persistent XLA compilation cache.

Compiles of the stage-1/2 train graphs are expensive (minutes on small
hosts); caching them on disk makes every subsequent process start warm.
Call once at CLI startup (all repo CLIs do).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "KPVID_COMPILATION_CACHE", os.path.expanduser("~/.cache/kpvid_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
