"""Multi-process (multi-host) execution wiring.

The reference is strictly single-process, single-device (one tf.Session;
reference train.py:25-29) — multi-host is this rebuild's own scaling axis
(SURVEY §5.8): `jax.distributed.initialize` + per-host data sharding.

Contract:
- every process calls :func:`maybe_initialize` BEFORE any other jax use;
  it is a no-op unless multi-process execution is requested via env:
    KPVID_COORDINATOR=host:port  KPVID_NUM_PROCESSES=N  KPVID_PROCESS_ID=i
      explicit wiring (also how the 2-process CPU test runs), or
    KPVID_MULTIHOST=auto
      bare ``jax.distributed.initialize()`` — auto-detects TPU pod slices /
      GKE / Slurm from the standard environment.
- after initialization, ``jax.devices()`` is GLOBAL; meshes built from it
  (parallel/mesh.py) span all hosts.
- each host's data pipeline produces LOCAL batches of
  ``global_batch // jax.process_count()`` examples from its index shard
  (HostDataPipeline shard_id/num_shards); :func:`put_batch` assembles them
  into global jax.Arrays with ``jax.make_array_from_process_local_data``
  (a process can only address its own devices, so a plain device_put
  against a global sharding is impossible — this is the supported path).

DP semantics note: index shards are strided over the per-epoch permutation,
so the assembled global batch is a fixed permutation of the single-process
batch along the batch axis. Batch-mean losses, their gradients, and BN
batch statistics are permutation-invariant; per-step rng draws that pair
with samples positionally (stage-2's VAE noise) see an exchangeable —
distributionally identical — pairing. tests/test_multiprocess.py verifies
exact step-wise equivalence end-to-end in the order-preserving
configuration (local batch 1), plus the shard-partition math generally.
"""

from __future__ import annotations

import os


def _num_processes() -> int:
    """Process count from the distributed runtime state WITHOUT touching
    device backends (jax.process_count() would initialize them — before
    platform overrides are applied, that silently freezes the wrong
    backend for the whole process)."""
    from jax._src import distributed as _dist

    return _dist.global_state.num_processes or 1


def maybe_initialize() -> bool:
    """Initialize jax.distributed from the environment if requested.

    Returns True when running multi-process (whether initialized by this
    call or already initialized). Safe to call more than once. Applies
    the KPVID_PLATFORM/KPVID_HOST_DEVICE_COUNT overrides first and never
    initializes device backends itself, so callers may still adjust jax
    config afterwards.
    """
    from ..utils.cache import apply_platform_overrides

    apply_platform_overrides()
    import jax

    if jax.distributed.is_initialized():
        return _num_processes() > 1

    # all shards must exit within this window of each other or the
    # coordination service's shutdown barrier kills the laggards; work
    # skew is held by explicit barriers (e.g. the labeler's end barrier),
    # but teardown skew on oversubscribed hosts still needs headroom
    shutdown_s = int(os.environ.get("KPVID_SHUTDOWN_TIMEOUT", "900"))
    coord = os.environ.get("KPVID_COORDINATOR")
    if coord:
        num = int(os.environ["KPVID_NUM_PROCESSES"])
        pid = int(os.environ["KPVID_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=num, process_id=pid,
            shutdown_timeout_seconds=shutdown_s,
        )
        return num > 1
    if os.environ.get("KPVID_MULTIHOST", "").lower() in ("1", "auto", "true"):
        # auto-detect (TPU pod / GKE / Slurm)
        jax.distributed.initialize(shutdown_timeout_seconds=shutdown_s)
        return _num_processes() > 1
    return False


def local_batch_size(global_batch_size: int) -> int:
    """This process's share of a global batch (= global size when
    single-process). Raises if the global batch doesn't split evenly."""
    import jax

    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch_size {global_batch_size} must be divisible by "
            f"the process count ({n})"
        )
    return global_batch_size // n


def put_batch(batch, sharding):
    """Lay a host-local numpy batch out on the (possibly multi-host) mesh.

    Single-process: a plain async device_put against the sharding.
    Multi-process: each process passes its LOCAL slice (leading dim =
    global/process_count for batch-sharded axes, or the full array for a
    replicated sharding) and the global array is assembled with
    ``jax.make_array_from_process_local_data``.
    """
    import jax

    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )


def is_primary() -> bool:
    """True on the process that should own logging/checkpoint writes."""
    import jax

    return jax.process_index() == 0


def barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Coordination-service barrier across all processes (NOT a device
    collective — safe regardless of gloo/ICI context state, and with a
    generous timeout, unlike the ~30s rendezvous inside the first
    collective execution). No-op when single-process."""
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def synced_compile(jitted, name: str):
    """Wrap a jitted step so multi-process compile skew can never trip the
    backend's first-collective rendezvous window.

    Executing a cross-process program rendezvouses the processes with a
    backend-fixed timeout (Gloo's key-value window is a hardcoded ~30s);
    XLA compiles can take minutes and finish at very different times
    across hosts (one warm cache, one cold), so executing straight after
    compiling can strand the fast host in the rendezvous. The wrapper
    AOT-compiles on first use of each argument shape, re-syncs every
    process through the coordination service (generous timeout), and only
    then executes — thereafter calls go straight to the compiled
    executable. Shapes are keyed so e.g. an eval sweep's ragged tail batch
    compiles (and syncs) independently; all processes must encounter new
    shapes at the same call sites in the same order (true for the
    deterministic train/eval streams). Single-process: returns `jitted`
    unchanged.
    """
    import jax

    if jax.process_count() == 1:
        return jitted

    compiled: dict = {}

    def call(*args):
        key = tuple(
            (tuple(leaf.shape), str(leaf.dtype)) for leaf in jax.tree.leaves(args)
        )
        if key not in compiled:
            executable = jitted.lower(*args).compile()
            barrier(f"synced_compile:{name}:{len(compiled)}")
            compiled[key] = executable
        return compiled[key](*args)

    return call
