"""Persistent-compile-cache hardening: host-ISA-keyed cache directory.

XLA:CPU executables embed the build host's ISA features; sharing one
cache dir across hosts can SIGILL (the round-4 MULTICHIP tail warning).
The cache dir is therefore keyed by a host-CPU signature."""

import os
import string

import jax

from kpvid_tpu.utils.cache import enable_compilation_cache, host_signature


def test_host_signature_stable_and_hex():
    sig = host_signature()
    assert len(sig) == 12
    assert all(c in string.hexdigits for c in sig)
    assert host_signature() == sig  # cached + deterministic


def test_cache_dir_is_hardware_keyed(tmp_path, monkeypatch):
    monkeypatch.delenv("KPVID_CACHE_NO_HWKEY", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(str(tmp_path))
        keyed = tmp_path / f"hw-{host_signature()}"
        assert keyed.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(keyed)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_benign_aot_warning_filter_is_surgical():
    """The fd-2 filter drops ONLY the prefer-no-gather/scatter false
    positive; a real feature-mismatch line passes through untouched."""
    import subprocess
    import sys

    code = (
        "import os, sys, time\n"
        "from kpvid_tpu.utils.cache import install_benign_aot_warning_filter\n"
        "install_benign_aot_warning_filter()\n"
        "benign = (b'E0820 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. '\n"
        "          b'Target machine feature +prefer-no-scatter is not  supported '\n"
        "          b'on the host machine.\\n')\n"
        "real = (b'E0820 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. '\n"
        "        b'Target machine feature +avx512f is not  supported '\n"
        "        b'on the host machine.\\n')\n"
        "os.write(2, benign)\n"
        "os.write(2, real)\n"
        "os.write(2, b'plain stderr line\\n')\n"
        "time.sleep(0.3)\n"  # let the pump thread forward
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        timeout=60,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    err = proc.stderr.decode()
    assert proc.returncode == 0, err
    assert "prefer-no-scatter" not in err
    assert "+avx512f is not" in err
    assert "plain stderr line" in err


def test_cache_hwkey_escape_hatch(tmp_path, monkeypatch):
    monkeypatch.setenv("KPVID_CACHE_NO_HWKEY", "1")
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(str(tmp_path))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
