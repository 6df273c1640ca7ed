"""Persistent XLA compilation cache.

Compiles of the stage-1/2 train graphs are expensive (minutes on small
hosts); caching them on disk makes every subsequent process start warm.
Call once at CLI startup (all repo CLIs do).

The cache directory is keyed by a HOST HARDWARE SIGNATURE (CPU model +
ISA feature flags): XLA:CPU compiles to the *build host's* CPU features,
and a cache entry produced on a wider-ISA host can carry instructions
(e.g. AVX-512) that SIGILL on a narrower execution host — XLA itself
warns "Machine type used for XLA:CPU compilation doesn't match the
machine type for execution". Nesting each host's entries under
``hw-<sig>/`` makes a cross-host hit impossible: a new host pays one
cold compile instead of risking an illegal-instruction crash mid-run.
Set KPVID_CACHE_NO_HWKEY=1 to disable the keying (single-host setups
that want to hand-share a cache dir).
"""

from __future__ import annotations

import hashlib
import os
import platform
from functools import lru_cache


@lru_cache(maxsize=1)
def host_signature() -> str:
    """Short stable hash of this host's CPU identity and ISA feature set.

    Sources (best effort, in order): /proc/cpuinfo "model name" +
    sorted "flags" of cpu0 (Linux), falling back to
    platform.machine()/platform.processor(). Only ISA-relevant data is
    hashed — core counts and frequencies don't affect codegen validity.
    """
    parts = [platform.machine(), platform.processor() or ""]
    try:
        with open("/proc/cpuinfo") as f:
            model, flags = "", ""
            for line in f:
                if ":" not in line:
                    if model or flags:
                        break  # end of first processor block
                    continue
                key, _, val = line.partition(":")
                key = key.strip()
                if key == "model name" and not model:
                    model = val.strip()
                elif key == "flags" and not flags:
                    flags = " ".join(sorted(val.split()))
            parts += [model, flags]
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    apply_platform_overrides()
    import jax

    cache_dir = cache_dir or os.environ.get(
        "KPVID_COMPILATION_CACHE", os.path.expanduser("~/.cache/kpvid_tpu_xla")
    )
    if os.environ.get("KPVID_CACHE_NO_HWKEY", "") != "1":
        cache_dir = os.path.join(cache_dir, f"hw-{host_signature()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def install_benign_aot_warning_filter() -> None:
    """Drop ONLY the known-benign XLA:CPU AOT cache-load warning lines.

    XLA appends the LLVM *tuning hints* ``+prefer-no-gather`` /
    ``+prefer-no-scatter`` to the compile-time feature list on CPUs where
    gather/scatter instructions are slow, but the load-time host feature
    probe (CPUID) can never report them — so cpu_aot_loader warns
    "Machine type ... doesn't match" on EVERY cache load, even for an
    entry compiled seconds earlier on the SAME host (verified
    empirically: a fresh hw-keyed dir reloaded on this host warns on
    exactly these two features and nothing else). They are safe by
    construction: "prefer-no-X" makes codegen AVOID an instruction
    family; the executable uses a subset of the host ISA, never a
    superset. Genuine mismatches are impossible here anyway — the cache
    dir is keyed by host_signature() — and would emit their own
    per-feature lines (e.g. "+avx512f is not supported"), which this
    filter forwards untouched.

    Installed by the multichip dryrun so the driver-visible tail stays
    clean; opt-in elsewhere (it splices a pipe+thread onto fd 2)."""
    import re
    import threading

    pat = re.compile(rb"Target machine feature \+prefer-no-(gather|scatter) is not")
    read_fd, write_fd = os.pipe()
    orig_fd = os.dup(2)
    os.dup2(write_fd, 2)
    os.close(write_fd)

    def pump() -> None:
        buf = b""
        while True:
            chunk = os.read(read_fd, 1 << 16)
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for line in lines:
                if b"cpu_aot_loader" in line and pat.search(line):
                    continue
                os.write(orig_fd, line + b"\n")
        if buf:
            os.write(orig_fd, buf)

    threading.Thread(target=pump, daemon=True, name="aot-warn-filter").start()


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
    plat = os.environ.get("KPVID_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
