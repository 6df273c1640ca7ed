"""Pytree checkpointing with name-filtered merge restore.

The reference saves every TF global variable each 20k steps with unlimited
retention (reference models/base_model.py:62-81) and restores by *name
intersection* between the live graph and the checkpoint
(base_model.py:83-92) — the semantic that lets evaluate.py stack the
stage-1 and stage-2 checkpoints into one graph (evaluate.py:76-77).

TPU-native equivalent: Orbax pytree checkpoints, and `merge_restore` which
grafts every leaf of a restored tree whose PATH exists in the target tree
(leaving the rest of the target untouched) — the same composition
behavior, path-based instead of TF-scope-name-based.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"ckpt-(\d+)$")

# module-level jits: traced once per pytree structure, reused across every
# checkpoint save (a fresh lambda per call would re-trace every time)
_pack_ravel = jax.jit(lambda ts: jnp.concatenate([t.ravel() for t in ts]))
_snapshot = jax.jit(lambda s: jax.tree.map(lambda l: l + 0, s))


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def _device_to_host_packed(state: Any) -> Any:
    """Pull a device pytree to host numpy with ONE transfer per dtype.

    Per-leaf device_get makes a round trip per tensor; through a remote-
    device tunnel that runs ~13x slower than one large transfer (measured:
    615 MB state, 272 s per-leaf vs ~20 s packed). Leaves are raveled and
    concatenated by dtype on device (one fused XLA program), transferred,
    then split/reshaped on host.

    Multi-process: leaves that are NOT fully addressable on this process
    (e.g. tensor-parallel shards spanning hosts) are first all-gathered
    with multihost_utils.process_allgather — a COLLECTIVE, so every
    process must reach this call, in the same order (see
    AsyncCheckpointManager.save).
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        leaves = [
            multihost_utils.process_allgather(l, tiled=True)
            if isinstance(l, jax.Array) and not l.is_fully_addressable
            else l
            for l in leaves
        ]
    by_dtype: dict = {}
    for i, leaf in enumerate(leaves):
        arr = jnp.asarray(leaf)
        by_dtype.setdefault(str(arr.dtype), []).append((i, arr))

    host_leaves: list = [None] * len(leaves)
    for _dtype, items in by_dtype.items():
        packed = _pack_ravel([arr for _, arr in items])
        flat = np.asarray(packed)  # single transfer
        offset = 0
        for i, arr in items:
            n = arr.size
            host_leaves[i] = flat[offset : offset + n].reshape(arr.shape)
            offset += n
    return jax.tree_util.tree_unflatten(treedef, host_leaves)


def save_checkpoint(
    log_dir: str | Path,
    name: str,
    step: int,
    state: Any,
    keep: int | None = None,
) -> Path:
    """Save `state` under {log_dir}/{name}/ckpt-{step} (mirrors the
    reference layout {log_dir}/{name}/model.ckpt-{step}). `keep=None`
    retains everything, like the reference's max_to_keep=None."""
    root = Path(log_dir).resolve() / name
    root.mkdir(parents=True, exist_ok=True)
    path = root / f"ckpt-{step}"
    # host-side numpy copy (packed transfer): donate-safe, device-agnostic
    host_state = _device_to_host_packed(state)
    _write_host_checkpoint(root, path, host_state, keep)
    return path


def _write_host_checkpoint(root: Path, path: Path, host_state: Any, keep: int | None):
    # Multi-process: EVERY process must call ck.save — Orbax coordinates
    # its own cross-process barrier inside (a device collective; skipping
    # it on non-primary processes deadlocks the primary). Host-numpy
    # leaves are treated as replicated, so only the primary writes data.
    ck = _checkpointer()
    ck.save(path, host_state, force=True)
    ck.wait_until_finished()
    if keep is not None and jax.process_index() == 0:
        steps = sorted(list_checkpoint_steps(root))
        for old in steps[:-keep]:
            import shutil

            shutil.rmtree(root / f"ckpt-{old}", ignore_errors=True)


class AsyncCheckpointManager:
    """Non-blocking checkpoint saves.

    save() snapshots the state with an on-device copy (fast, donation-safe)
    and hands the device->host transfer + Orbax write to a background
    thread, so the train loop resumes immediately (the stage-1 state is
    615 MB — a blocking save costs ~135 s through this image's tunnel).
    One save in flight at a time: a second save() waits for the first.
    Call wait() before reading the checkpoint or exiting.
    """

    def __init__(self, log_dir: str | Path, name: str, keep: int | None = None):
        import threading

        self.log_dir = log_dir
        self.name = name
        self.keep = keep
        self._thread: "threading.Thread | None" = None
        self._error: Exception | None = None

    def save(self, step: int, state: Any) -> None:
        import threading

        self.wait()
        if jax.process_count() > 1:
            # Multi-process saves are SYNCHRONOUS on the main thread: both
            # the device->host pull (possible all-gathers of TP shards) and
            # Orbax's internal cross-process barrier are device collectives
            # that every process must issue in the same order — running
            # them from a background thread would race the train-step
            # launches and deadlock. Blocking is acceptable at the 20k-step
            # checkpoint cadence.
            save_checkpoint(self.log_dir, self.name, step, state, keep=self.keep)
            return
        snapshot = _snapshot(state)
        jax.block_until_ready(snapshot)

        def _run():
            try:
                save_checkpoint(self.log_dir, self.name, step, snapshot, keep=self.keep)
            except Exception as e:  # surfaced on the next wait()/save()
                self._error = e

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def list_checkpoint_steps(ckpt_dir: str | Path) -> list[int]:
    root = Path(ckpt_dir)
    if not root.exists():
        return []
    steps = []
    for p in root.iterdir():
        m = _STEP_RE.search(p.name)
        if m and p.is_dir():
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    steps = list_checkpoint_steps(ckpt_dir)
    if not steps:
        return None
    return Path(ckpt_dir) / f"ckpt-{steps[-1]}"


def restore_checkpoint(path: str | Path) -> Any:
    """Restore the raw saved pytree (numpy leaves)."""
    ck = _checkpointer()
    return ck.restore(Path(path).resolve())


def _key_name(k) -> str:
    """Normalize path entries so dataclass attrs, dict keys, and sequence
    indices compare equal across tree types (a restored checkpoint is plain
    dicts/lists; the live state may be flax.struct dataclasses)."""
    if hasattr(k, "name"):  # GetAttrKey
        return str(k.name)
    if hasattr(k, "key"):  # DictKey
        return str(k.key)
    if hasattr(k, "idx"):  # SequenceKey
        return str(k.idx)
    return str(k)


def _flatten_with_paths(tree: Any) -> dict[tuple, Any]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {tuple(_key_name(k) for k in path): leaf for path, leaf in flat}


def merge_restore(target: Any, restored: Any, strict_shapes: bool = True) -> tuple[Any, int]:
    """Graft every restored leaf whose path exists in `target` (the
    name-intersection partial-restore semantic). Returns (merged, n_merged).
    """
    restored_flat = _flatten_with_paths(restored)
    target_flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    merged_leaves = []
    n_merged = 0
    for path, leaf in target_flat:
        key = tuple(_key_name(k) for k in path)
        if key in restored_flat:
            new = restored_flat[key]
            if strict_shapes and hasattr(leaf, "shape") and tuple(new.shape) != tuple(
                leaf.shape
            ):
                raise ValueError(
                    f"shape mismatch at {'/'.join(key)}: "
                    f"checkpoint {new.shape} vs target {leaf.shape}"
                )
            merged_leaves.append(
                jax.numpy.asarray(new, dtype=leaf.dtype if hasattr(leaf, "dtype") else None)
            )
            n_merged += 1
        else:
            merged_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, merged_leaves), n_merged
