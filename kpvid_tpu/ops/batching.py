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


def concat_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """[B, ...] x2 -> [2B, ...] in block row order [a_0..a_B, b_0..b_B] —
    the reference's tf.concat(axis=0) shape. FASTER than interleave_pair on
    a single chip (no strided row shuffle: measured +6% on the production
    stage-1 step, docs/PERF.md "pair batching"), but collective-poison
    under a batch-sharded mesh (see module docstring)."""
    assert a.shape == b.shape, (a.shape, b.shape)
    return jnp.concatenate([a, b], axis=0)


def split_pair(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of `concat_pair` along axis 0."""
    h = x.shape[0] // 2
    return x[:h], x[h:]


def pair_fns(mode: str):
    """(pair, unpair) for a pair-batching mode.

    Both modes run the identical per-row math (every consumer is
    row-independent), so they are graph-level alternatives selected by
    deployment shape: 'concat' on a single device, 'interleave' under a
    batch-sharded mesh. Equivalence is tested in test_train.py."""
    if mode == "interleave":
        return interleave_pair, deinterleave_pair
    if mode == "concat":
        return concat_pair, split_pair
    raise ValueError(f"unknown pair_batching mode {mode!r}")


def resolve_pair_mode(mode: str) -> str:
    """Resolve training.pair_batching. 'auto' picks 'concat' when exactly
    one device is visible (the single-chip production shape — 6% faster
    stage-1 step) and 'interleave' otherwise (mesh-safe: zero-collective
    pure-DP graphs). Explicit modes pass through."""
    if mode != "auto":
        pair_fns(mode)  # validate
        return mode
    return "concat" if len(jax.devices()) == 1 else "interleave"
