"""Persistent XLA compilation cache.

Compiles of the stage-1/2 train graphs are expensive (minutes on small
hosts); caching them on disk makes every subsequent process start warm.
Call once at CLI startup (all repo CLIs do).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    apply_platform_overrides()
    import jax

    cache_dir = cache_dir or os.environ.get(
        "KPVID_COMPILATION_CACHE", os.path.expanduser("~/.cache/kpvid_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def apply_platform_overrides() -> None:
    """Honor KPVID_PLATFORM / KPVID_HOST_DEVICE_COUNT in CLI processes.

    Some images force-select a TPU platform from sitecustomize via
    jax.config, which silently overrides the standard JAX_PLATFORMS env
    var — so subprocess tests (and users wanting a CPU dry run) need an
    explicit hook. KPVID_HOST_DEVICE_COUNT=N exposes N virtual host
    devices (the standard trick for exercising multi-chip sharding
    without chips); it must be set before the first jax import in the
    process to take effect."""
    n = os.environ.get("KPVID_HOST_DEVICE_COUNT")
    if n:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
    platform = os.environ.get("KPVID_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
