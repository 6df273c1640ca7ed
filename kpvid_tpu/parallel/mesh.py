"""Device mesh construction.

The reference is strictly single-device (one tf.Session, one GPU;
reference train.py:25-29) — it has NO distribution story (SURVEY §2.5).
Here scaling is native: a 2-D ('data', 'model') `jax.sharding.Mesh`;
batches shard over 'data' (gradients all-reduce over ICI via XLA psum),
and the widest kernels (stage-2 LSTM/FC, translator convs) may shard over
'model' (tensor parallelism). Multi-host: parallel/distributed.py wires
jax.distributed.initialize + per-host local-batch assembly; the mesh here
then spans all hosts' devices (jax.devices() is global after init).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all visible devices on
    the data axis (pure DP)."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        if n_total % n_model:
            raise ValueError(f"{n_total} devices not divisible by n_model={n_model}")
        n_data = n_total // n_model
    if n_data * n_model != n_total:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {n_total} available devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))
