"""Sharding rules: how batches, params, and train state lay out on a mesh.

Recipe (scaling-book style): annotate the INPUTS with NamedShardings and
let XLA insert the collectives —
- batches: leading axis over 'data' -> per-device microbatches; the grads
  of replicated params come back via an ICI all-reduce XLA inserts,
- params: replicated by default; kernels whose LAST dim is wide and
  divisible by the 'model' axis shard over 'model' (tensor parallelism for
  the stage-2 LSTM gate matmuls [D+H, 4H] and wide conv channels); XLA
  all-gathers activations where needed,
- optimizer state mirrors its param's sharding (same tree structure).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Lay a host batch out with the leading axis sharded over 'data'.

    Multi-process: `batch` is this host's LOCAL slice (leading dim =
    global/process_count) and the global array is assembled via
    jax.make_array_from_process_local_data (see parallel/distributed.py)."""
    from .distributed import put_batch

    return put_batch(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Lay a pytree out fully replicated over the mesh (used for ragged
    eval tail batches whose leading dim doesn't divide the 'data' axis —
    exact math, every device computes the full batch). Multi-process:
    every host must pass the same full array."""
    from .distributed import put_batch

    return put_batch(tree, NamedSharding(mesh, P()))


def _leaf_spec(leaf, model_size: int, min_shard_dim: int) -> P:
    shape = getattr(leaf, "shape", ())
    if (
        model_size > 1
        and len(shape) >= 1
        and shape[-1] >= min_shard_dim
        and shape[-1] % model_size == 0
    ):
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def param_sharding_rules(
    mesh: Mesh, params: Any, min_shard_dim: int = 1024
) -> Any:
    """PartitionSpec tree: wide output dims shard over 'model', everything
    else replicated. min_shard_dim keeps small tensors replicated (a 40-ch
    conv gains nothing from TP)."""
    model_size = mesh.shape["model"]
    return jax.tree.map(lambda l: _leaf_spec(l, model_size, min_shard_dim), params)


def shard_state(mesh: Mesh, state: Any, min_shard_dim: int = 1024) -> Any:
    """Lay a GANTrainState (or any pytree) out with the param sharding
    rules applied leaf-wise; scalars/stats replicate.

    Multi-process: every process passes its (identical, deterministic-init)
    local copy; leaves become global replicated arrays first, then a jitted
    identity reshards to the rule-derived shardings (a plain device_put
    cannot address other hosts' devices)."""
    specs = param_sharding_rules(mesh, state, min_shard_dim)
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
            state,
            specs,
        )
    from .distributed import put_batch

    replicated = put_batch(state, NamedSharding(mesh, P()))
    out_sh = jax.tree.map(lambda spec: NamedSharding(mesh, spec), specs)
    return jax.jit(lambda s: s, out_shardings=out_sh)(replicated)
