"""Shard-aligned batch pairing.

Several graphs run TWO equal-size batches through one shared-weight network
in a single forward (pose encoder on [frame_t, frame_t+k], discriminators on
[real, fake], VGG on [gt, pred] — reference models/detector_translator_model.py
and models/motion_generator_model.py do the same via tf.concat(axis=0)).

A plain `jnp.concatenate([a, b], axis=0)` is poison under a batch-sharded
mesh: the concatenated global row order ([a_0..a_B, b_0..b_B]) no longer
aligns with the per-device shard boundaries, so GSPMD materializes it with a
full cross-device reshard — measured on the stage-1 train step at 8-way DP:
230 all-to-all + 360 collective-permute ops in the compiled module, purely
from the four concat sites.

`interleave_pair` produces the row order [a_0, b_0, a_1, b_1, ...] instead:
stack on a fresh axis 1, then merge it into the sharded batch axis. GSPMD
splits/merges a sharded dim with a local reshape when the per-device extent
divides evenly — zero communication. Every op these pairs feed is
row-independent (convs, LSTMs, dense heads), so per-row outputs are
bit-identical to the concat form; the only order-sensitive op anywhere
downstream is BatchNorm's batch reduction, which sees the same SET of rows
(same stats up to float summation order, <= 1 ulp).

After the fix the same step compiles to all-reduces only (gradient psums) —
the correct pure-DP collective set on TPU ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interleave_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """[B, ...] x2 -> [2B, ...] in interleaved row order [a0, b0, a1, b1...].

    Shard-aligned replacement for jnp.concatenate([a, b], axis=0) when axis 0
    is (possibly) sharded over a mesh; pair with `deinterleave_pair`.
    """
    assert a.shape == b.shape, (a.shape, b.shape)
    return jnp.stack([a, b], axis=1).reshape((2 * a.shape[0],) + a.shape[1:])


def deinterleave_pair(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of `interleave_pair` along axis 0 (works on any per-row
    transform of it: batch dim preserved, trailing dims free to change)."""
    y = x.reshape((x.shape[0] // 2, 2) + x.shape[1:])
    return y[:, 0], y[:, 1]
