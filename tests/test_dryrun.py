"""Always-on guard for the driver's multichip dryrun budget.

Round 3 shipped a dryrun that outgrew the driver's wall-clock window
(MULTICHIP_r03.json rc=124, empty tail) because nothing in the suite ran it
end-to-end under a ceiling. This test runs `python __graft_entry__.py` as a
real subprocess — the exact command the driver runs — with a hard timeout,
and asserts the phase log streamed (so a future timeout leaves diagnostics,
never an empty tail).

It uses the default persistent compile cache on purpose: the first run on a
host pays the cold compiles (~330s measured on the 1-core host), every
later run is warm (~71s), and the driver's own dryrun gets the warm cache
for free.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CEILING_S = float(os.environ.get("KPVID_DRYRUN_TEST_CEILING_S", "480"))


def test_dryrun_multichip_completes_within_budget():
    env = dict(os.environ)
    # the subprocess must see the plain CLI environment, not the test
    # harness's 8-device XLA_FLAGS (it sets its own)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    # mandatory phases only: the fast tier guards the driver-critical path;
    # the extended phases (TP-heavy mesh / two_batch / ragged eval) are
    # covered by the slow-tier parallel+train batteries and still run in
    # the driver's own dryrun under its default 300s budget
    env["KPVID_DRYRUN_BUDGET_S"] = "0"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=CEILING_S,
    )
    assert proc.returncode == 0, (
        f"dryrun failed rc={proc.returncode}\n"
        f"--- stdout tail ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr tail ---\n{proc.stderr[-3000:]}"
    )
    out = proc.stdout
    # the phase log must stream: every mandatory phase leaves a line even
    # if a later one hangs
    for marker in (
        "compile cache on",
        "stage-1 sharded step on 8x1 mesh matches",
        "stage-1 sharded step on 4x2 mesh matches",
        "stage-2 sharded step on 4x2 mesh matches",
        "fused serving path on 4x2 mesh matches",
        "dryrun_multichip OK",
    ):
        assert marker in out, f"missing phase line {marker!r} in:\n{out}"
