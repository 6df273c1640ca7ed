"""Shared launcher for coordinated multi-process subprocess tests.

Used by tests/test_cli.py (2-process CLI runs) and
tests/test_multiprocess.py (2-process trainer workers): binds a free
localhost port for the jax.distributed coordinator, launches N copies of
the command with the KPVID_* env contract, and asserts every process
exits 0.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_coordinated(
    argv: list, logs: list, n_procs: int = 2, env_extra: dict | None = None,
    timeout: int = 900,
):
    """Launch `python *argv` in n_procs coordinated CPU processes against a
    localhost coordinator; assert all exit 0 (printing the failing
    process's log)."""
    port = free_port()
    procs = []
    for pid in range(n_procs):
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env.update(JAX_PLATFORMS="cpu", KPVID_PLATFORM="cpu")
        env.update(env_extra or {})
        env.update(
            KPVID_COORDINATOR=f"localhost:{port}",
            KPVID_NUM_PROCESSES=str(n_procs),
            KPVID_PROCESS_ID=str(pid),
        )
        # log to FILES: a filled stdout pipe would block a writer while the
        # parent waits on the other process (classic multi-proc deadlock)
        procs.append(subprocess.Popen(
            [sys.executable] + [str(a) for a in argv], cwd=REPO, env=env,
            stdout=Path(logs[pid]).open("w"), stderr=subprocess.STDOUT,
        ))
    for p in procs:
        try:
            p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for p, log in zip(procs, logs):
        assert p.returncode == 0, (
            f"coordinated {argv[0]} failed:\n{Path(log).read_text()}"
        )
