"""Worker for tests/test_multiprocess.py: TP-sharded checkpoint save.

Two coordinated processes (1 CPU device each) build a 1x2 'model' mesh —
so a min_shard_dim-wide leaf is tensor-parallel ACROSS HOSTS and is NOT
fully addressable on either process. The collective save path
(utils/checkpoint.py _device_to_host_packed) must all-gather it with
multihost_utils.process_allgather before the packed host transfer; every
process then joins the Orbax restore (internal collective barrier) and
asserts the exact bytes came back.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

n_local = int(os.environ.get("MP_WORKER_LOCAL_DEVICES", "1"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("MP_WORKER_XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_local}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from kpvid_tpu.parallel import maybe_initialize  # noqa: E402

maybe_initialize()

from kpvid_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402

from kpvid_tpu.parallel import make_mesh, shard_state  # noqa: E402
from kpvid_tpu.utils.checkpoint import (  # noqa: E402
    AsyncCheckpointManager,
    latest_checkpoint,
    merge_restore,
    restore_checkpoint,
)


def reference_state() -> dict:
    return {
        "wide": (np.arange(8 * 16, dtype=np.float32).reshape(8, 16) / 7.0),
        "narrow": np.arange(4, dtype=np.float32),
        "step": np.asarray(5, np.int32),
    }


def main() -> None:
    ckpt_dir = sys.argv[1]
    assert jax.process_count() == 2, jax.process_count()
    # 1x2 mesh: the 'model' axis spans the two processes' devices
    mesh = make_mesh(n_model=2)
    state = reference_state()
    sh = shard_state(mesh, state, min_shard_dim=16)
    # the precondition the test exists for: a leaf this process cannot
    # fully address AND that is genuinely split (its other shard holds
    # different data, on the other host's device) — on a cross-host mesh
    # even replicated leaves are not fully addressable, so check both
    assert not sh["wide"].is_fully_addressable, sh["wide"].sharding
    assert not sh["wide"].is_fully_replicated, sh["wide"].sharding
    assert sh["narrow"].is_fully_replicated

    mgr = AsyncCheckpointManager(ckpt_dir, "tp")  # multi-proc -> sync save
    mgr.save(5, sh)
    mgr.wait()

    # every process joins the restore (Orbax runs internal barriers)
    restored = restore_checkpoint(latest_checkpoint(Path(ckpt_dir) / "tp"))
    for k, want in state.items():
        np.testing.assert_array_equal(np.asarray(restored[k]), want, err_msg=k)

    # the resume path: merge into a fresh tree and land back on the mesh
    merged, n = merge_restore(jax.tree.map(np.zeros_like, state), restored)
    assert n == len(state), n
    resh = shard_state(mesh, merged, min_shard_dim=16)
    assert not resh["wide"].is_fully_replicated

    print(
        f"mp_ckpt_worker proc {jax.process_index()}/{jax.process_count()}: done",
        flush=True,
    )


if __name__ == "__main__":
    main()
